package graft

import graft.operators.{Dedup, Reports}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): dedup idempotence, merge
  * convergence, melt sum-invariance — over ScalaCheck-generated inputs.
  * (Plain ScalaCheck Gens sampled with fixed seeds — the scalatest
  * bridge artifact isn't in the offline cache.) */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val entryGen: Gen[List[(String, Int, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(1, 8)
      dateInt <- Gen.choose(100, 104)
      ts <- Gen.choose(1L, 3L)
      cal <- Gen.choose(0.0, 1000.0)
    } yield (id.toString, dateInt, ts, cal))

  test("property: dedup is idempotent, never grows, one survivor per key") {
    samples(entryGen, 5).foreach { rows =>
      import spark.implicits._
      val df = rows.toDF("food_entry_id", "date_int", "timestamp", "calories")
      val key = Seq("food_entry_id", "date_int", "timestamp")
      val once = Dedup.deduplicate(df, key, Seq(col("calories")))
      val onceRows = once.collect().toSet
      val twice = Dedup.deduplicate(once, key, Seq(col("calories")))
      assert(twice.collect().toSet === onceRows)
      assert(onceRows.size <= rows.size)
      assert(onceRows.size === rows.map(r => (r._1, r._2, r._3)).distinct.size)
    }
  }

  test("property: merge converges (reapplying a batch is a no-op) and covers all keys") {
    val kvGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(1, 10); v <- Gen.choose(0.0, 100.0)
    } yield (k.toString, v))
    val cases = samples(kvGen.flatMap(a => kvGen.map(b => (a, b))), 5)
    cases.foreach { case (existingRows, batchRows) =>
      import spark.implicits._
      // one row per key on each side (merge expects keyed tables)
      val existing = existingRows.toMap.toSeq.toDF("key", "v")
      val batch = batchRows.toMap.toSeq.toDF("key", "v")
      val once = Dedup.merge(existing, batch, Seq("key"))
      val twice = Dedup.merge(once, batch, Seq("key"))
      val onceSet = once.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val twiceSet = twice.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(onceSet === twiceSet)
      // batch rows win; existing-only keys preserved
      assert(onceSet === (existingRows.toMap ++ batchRows.toMap).toSet)
    }
  }

  test("property: melt preserves the macro sum (R1 invariance)") {
    val dayGen = Gen.nonEmptyListOf(for {
      d <- Gen.choose(1, 28); c <- Gen.choose(0.0, 500.0)
      f <- Gen.choose(0.0, 500.0); p <- Gen.choose(0.0, 500.0)
    } yield (f"2026-01-$d%02d", 0.0, c, f, p))
    samples(dayGen, 5).foreach { rows =>
      import spark.implicits._
      val wide = rows.toDF("date_s", "total_calories", "total_carbohydrate", "total_fat", "total_protein")
        .withColumn("date", col("date_s").cast("date")).drop("date_s")
      val long = Reports.meltMacros(wide, "date")
      val wideSum = rows.map(r => r._3 + r._4 + r._5).sum
      val longSum = long.agg(sum("amount_g")).collect().head.getDouble(0)
      assert(math.abs(wideSum - longSum) < 1e-6)
    }
  }

  test("property: boilerplate strip accounts for every line, keeps only " +
    "singleton-doc lines, and preserves within-doc order") {
    val docGen: Gen[List[(Long, String)]] = Gen.nonEmptyListOf(for {
      id <- Gen.choose(1, 12)
      nLines <- Gen.choose(1, 6)
      lines <- Gen.listOfN(nLines, Gen.oneOf(
        "cookie banner", "nav", "footer", "body one", "body two",
        "body three", "rare line"))
    } yield (id.toLong, lines.mkString("\n"))).map(_.distinctBy(_._1))
    samples(docGen, 5).filter(_.nonEmpty).foreach { rows =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-boiler").toString
      rows.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.functions.CurationOps.q70BoilerplateLines(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      // reference model computed in plain Scala
      val docLines = rows.toMap.view.mapValues(_.split("\n", -1).toSeq).toMap
      val docFreq = docLines.toSeq.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      assert(out.keySet == docLines.keySet) // every doc survives
      docLines.foreach { case (id, ls) =>
        val kept = ls.filter(l => docFreq(l) == 1)
        val (nKept, nDropped, clean) = out(id)
        assert(nKept == kept.size && nDropped == ls.size - kept.size, s"doc $id")
        assert(clean == kept.mkString("\n"), s"doc $id order/content")
      }
    }
  }

  test("property: q82 quantization error never exceeds scale/2 (+1 ulp of rounding)") {
    val rows = graft.functions.VectorOps.q82Int8Quant(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, err) = (r.getDouble(1), r.getDouble(2))
      // round-to-nearest puts every dim within half a quantization step;
      // both values are independently rounded to 6 dp, so allow 1e-6 slack
      assert(err <= scale / 2 + 1e-6, s"vec ${r.getLong(0)}: err $err > scale/2 ${scale / 2}")
    }
  }

  test("property: q84 quartile doc counts per language sum to the corpus count, " +
    "and quartile length ranges are ordered and non-overlapping per language") {
    import spark.implicits._
    val out = graft.functions.CurationOps.q84Curriculum(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    val total = out.map(_._3).sum
    val docs = graft.Tables(spark, sf0001, "documents").count()
    assert(total == docs, s"quartile counts sum $total != corpus $docs")
    out.groupBy(_._1).foreach { case (lang, qs) =>
      val sorted = qs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"$lang quartiles")
      // min/max ranges must be monotone across quartiles (boundary ties may touch)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._5 <= b._4 || a._5 == b._5, s"$lang: q${a._2} max ${a._5} vs q${b._2} min ${b._4}")
      }
    }
  }

  test("property: q98 bloom bitset never yields a false negative, sizes to " +
    "a power of two >= 16 bits/key, and probes stay in-bounds") {
    import graft.functions.CurationOps
    val hashGen = Gen.listOfN(500, Gen.long)
    samples(hashGen, 8).foreach { hs =>
      val hashes = hs.toArray
      val (words, nBits) = CurationOps.bloomBitset(hashes)
      assert(java.lang.Long.bitCount(nBits) == 1)
      assert(nBits >= math.max(64L, hashes.length.toLong * 16L))
      assert(words.length.toLong * 64 == nBits)
      // driver-side replica of the probe arithmetic: every inserted hash
      // must find all its bits set (the no-false-negative contract the
      // exact-rescore correctness of q98 rests on)
      hs.foreach { h =>
        val h1 = h >>> 32; val h2 = h & 0xFFFFFFFFL
        (0 until CurationOps.BloomProbes).foreach { i =>
          val p = ((h1 + i.toLong * h2) % nBits).toInt
          assert((words(p >> 6) & (1L << (p & 63))) != 0L)
        }
      }
    }
  }

  test("property: span-family invariants on real data — q148/q150 spans are " +
    "disjoint and in-bounds per doc, and q150's scrubbed coverage is " +
    "CONTAINED in q148's duplicated coverage (an eval-shared window is by " +
    "definition corpus-duplicated)") {
    import graft.functions.TextOps
    def covers(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
      df.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap
    val q148 = covers(TextOps.q148ExactSubstrSpans(spark, sf0001))
    val q150 = covers(TextOps.q150EvalSpanScrub(spark, sf0001))
    assert(q148.nonEmpty, "fixture has no duplicated spans — property vacuous")
    // disjointness + ordering + min window length within every doc
    (q148 ++ q150).foreach { case (doc, spans) =>
      spans.foreach { case (a, b) =>
        assert(a >= 1 && b >= a + 7, s"doc $doc span ($a,$b) under one window")
      }
      spans.sliding(2).foreach {
        case Seq((_, b1), (a2, _)) =>
          assert(a2 > b1 + 1, s"doc $doc: spans not merged/disjoint ($b1, $a2)")
        case _ =>
      }
    }
    // containment: every q150 span sits inside some q148 span of its doc
    q150.foreach { case (doc, spans) =>
      val dup = q148.getOrElse(doc, Nil)
      spans.foreach { case (a, b) =>
        assert(dup.exists { case (x, y) => x <= a && b <= y },
          s"doc $doc: scrubbed span ($a,$b) not inside q148 coverage $dup")
      }
    }
  }

  test("property: q85 efficiency is in (0, 1] and padded tokens >= real tokens") {
    val rows = graft.functions.CurationOps.q85PackEfficiency(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eff = r.getDouble(4)
      assert(eff > 0.0 && eff <= 1.0, s"bucket ${r.getLong(0)}: efficiency $eff")
    }
  }

  test("property: incremental CDC view maintenance equals full recompute over " +
    "arbitrary merge sequences (bootstrap at v1, refresh to head)") {
    import graft.sources.{IncrementalView, ManifestTable}
    import spark.implicits._
    val batchGen: Gen[List[(Long, String, Long)]] =
      Gen.nonEmptyListOf(for {
        id <- Gen.choose(1L, 10L)
        day <- Gen.oneOf("d1", "d2", "d3")
        x <- Gen.choose(-50L, 50L)
      } yield (id, day, x)).map(_.distinctBy(r => (r._1, r._2)))
    val seqGen = for {
      n <- Gen.choose(2, 4)
      bs <- Gen.listOfN(n, batchGen)
    } yield bs
    samples(seqGen, 4).zipWithIndex.foreach { case (batches, i) =>
      val root = s"${java.nio.file.Files.createTempDirectory(s"graft-mv-prop$i")}/t"
      val key = Seq("id", "day")
      batches.foreach { b =>
        ManifestTable.mergePartitioned(b.toDF("id", "day", "x"), root, key, "day"): Unit
      }
      val head = ManifestTable.currentVersion(root)
      val boot = IncrementalView.compute(
        ManifestTable.readVersion(spark, root, 1), Seq("day"), "x").localCheckpoint()
      val incr = IncrementalView.refresh(boot, root, 1, head, key, Seq("day"), "x")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val full = IncrementalView.compute(
        ManifestTable.read(spark, root), Seq("day"), "x")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(incr == full, s"sample $i: incremental $incr != recompute $full " +
        s"over ${batches.map(_.size)} batch sizes")
      // the batched catch-up (one maintain pass over the range's
      // snapshot diff) must reach the same state as the per-version fold
      val batched = IncrementalView
        .refreshBatched(boot, root, 1, head, key, Seq("day"), "x")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(batched == full, s"sample $i: batched $batched != recompute $full")
    }
  }

  test("property: media header writers and parsers invert for arbitrary dims, " +
    "rates and payloads (incl. empty and FF-heavy payloads for the JPEG walk)") {
    import graft.multimodal.MediaHeaders
    val dimGen = Gen.choose(1, 1 << 20)
    val payloadGen = Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.listOf(Gen.oneOf(0xff.toByte, 0xd8.toByte, 0xda.toByte)).map(_.toArray),
      Gen.const(Array.emptyByteArray))
    val caseGen = for { w <- dimGen; h <- dimGen; p <- payloadGen } yield (w, h, p)
    samples(caseGen, 40).foreach { case (w, h, p) =>
      assert(MediaHeaders.pngDims(MediaHeaders.pngBytes(w, h, p)) ===
        Some((w.toLong, h.toLong)))
      assert(MediaHeaders.pngBytes(w, h, p).length === 57 + p.length)
      // JPEG dims are 16-bit fields — clamp the gen range accordingly.
      // The payload stands in for the entropy stream, which the parser
      // never walks (SOF0 precedes it), so FF-heavy bytes must not
      // confuse the marker scan.
      val (jw, jh) = (1 + w % 65535, 1 + h % 65535)
      assert(MediaHeaders.jpegDims(MediaHeaders.jpegBytes(jw, jh, p)) ===
        Some((jw.toLong, jh.toLong)))
      val rate = 8000 + w % 40000
      val wav = MediaHeaders.wavBytes(rate, 1, 16, p)
      assert(MediaHeaders.wavFormat(wav) ===
        Some((rate.toLong, p.length.toLong * 1000L / (rate * 2L))))
      // parsers never throw on arbitrary byte soup (the corrupt-blob
      // contract of decodeMetadata): truncations of valid files parse
      // to None or the correct dims, never an exception
      Seq(8, 16, 20).foreach { cut =>
        MediaHeaders.pngDims(MediaHeaders.pngBytes(w, h, p).take(cut))
        MediaHeaders.jpegDims(MediaHeaders.jpegBytes(jw, jh, p).take(cut))
        MediaHeaders.wavFormat(wav.take(cut))
      }
      MediaHeaders.pngDims(p); MediaHeaders.jpegDims(p); MediaHeaders.wavFormat(p)
    }
  }
}
