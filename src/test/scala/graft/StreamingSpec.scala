package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming semantics (SURVEY §2.10): windowed agg with
  * watermark, streaming dedup, foreachBatch merge convergence. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transformWithState matches mapGroupsWithState on the same stream (two state APIs, one answer)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val stats = EventStream.runningUserStatsTws(
        mem.toDF().toDF("user_id", "ts", "value"))
      val q = stats.toDF().writeStream.format("memory")
        .queryName("tws_stats").outputMode("update").start()
      mem.addData((1L, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      mem.addData(
        (1L, ts("2024-01-01 11:00:00"), 7.0),
        (2L, ts("2024-01-01 11:30:00"), 1.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws_stats")
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"total_value", $"last_seen_epoch")).as("s"))
        .select($"user_id", $"s.n_events", $"s.total_value", $"s.last_seen_epoch")
        .as[(Long, Long, Double, Long)].collect()
        .map { case (k, n, v, t) => k -> ((n, v, t)) }.toMap
      // identical to what the mapGroupsWithState twin produces
      // (ExtendedSpec pins that one on the same inputs)
      assert(last(1L) == ((2L, 12.0, ts("2024-01-01 11:00:00").getTime)))
      assert(last(2L) == ((1L, 1.0, ts("2024-01-01 11:30:00").getTime)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("sessionTimeouts: a quiet user's session is closed BY TIMER expiry " +
    "(output from absence of data), state cleared, active users untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val closed = EventStream.sessionTimeouts(
        mem.toDF().toDF("user_id", "ts", "value"), gapMs = 1500)
      // paced trigger: in ProcessingTime time-mode the engine runs
      // batches to evaluate timers even with no data — pace them instead
      // of the default back-to-back loop, and poll the sink rather than
      // processAllAvailable (which never settles while timers pend)
      val q = closed.toDF().writeStream.format("memory")
        .queryName("closed_sessions")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .outputMode("append").start()
      def closedNow(): Seq[(Long, Long, Double)] = {
        import spark.implicits._
        spark.table("closed_sessions")
          .as[(Long, Long, Double, Long)].collect().toSeq.map(r => (r._1, r._2, r._3))
      }
      def awaitClosed(n: Int, maxMs: Long = 30000): Seq[(Long, Long, Double)] = {
        val deadline = System.currentTimeMillis() + maxMs
        var cur = closedNow()
        while (cur.size < n && System.currentTimeMillis() < deadline) {
          Thread.sleep(100); cur = closedNow()
        }
        cur
      }
      // user 1 gets a 2-event session; its close must come from TIMER
      // expiry (no further data for user 1 ever arrives in this phase)
      mem.addData((1L, ts("2024-01-01 10:00:00"), 5.0),
                  (1L, ts("2024-01-01 10:01:00"), 7.0))
      val first = awaitClosed(1)
      assert(first.toSet == Set((1L, 2L, 12.0)),
        s"user 1 closed by inactivity: $first")
      // user 1 returns: state was cleared on close, so the next session
      // counts ONLY its own events
      mem.addData((1L, ts("2024-01-01 10:20:00"), 100.0))
      val all = awaitClosed(2)
      q.stop()
      assert(all.toSet == Set((1L, 2L, 12.0), (1L, 1L, 100.0)),
        s"fresh session after close: $all")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Run `body` with the RocksDB state store provider (required by
    * transformWithState), restoring the previous provider after. */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // one fixture for both q104/q109 streaming-twin parity tests; split
  // MID-TIMELINE into two micro-batches so cross-batch state is exercised
  private lazy val twinBatch1 = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
    (1L, ts("2024-01-01 10:10:00"), 2L, "view"),
    (2L, ts("2024-01-01 09:00:00"), 6L, "purchase"))
  private lazy val twinBatch2 = Seq(
    (1L, ts("2024-01-01 10:30:00"), 3L, "purchase"), // 20 min after view → credited
    (1L, ts("2024-01-01 12:00:00"), 4L, "click"),
    (1L, ts("2024-01-01 13:30:00"), 5L, "purchase"), // 90 min after click → direct
    (2L, ts("2024-01-01 09:30:00"), 7L, "view"),
    (2L, ts("2024-01-01 10:00:00"), 8L, "purchase")) // 30 min after view → credited

  test("trigramStream (transformWithState) emits exactly the batch q104 trigram " +
    "multiset, including the trigram that SPANS two micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(Long, Timestamp, Long, String)]
      val q = EventStream.trigramStream(
          mem.toDF().toDF("user_id", "ts", "event_id", "event_type"))
        .toDF().writeStream.format("memory")
        .queryName("trigram_out").outputMode("append").start()
      mem.addData(twinBatch1: _*)
      q.processAllAvailable()
      mem.addData(twinBatch2: _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("trigram_out")
        .groupBy($"t1", $"t2", $"t3").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
        .toMap
      val batch = graft.operators.TimeSeries.behaviorTrigrams(
          (twinBatch1 ++ twinBatch2).toDF("user_id", "ts", "event_id", "event_type"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
        .toMap
      assert(streamed === batch, s"stream $streamed vs batch $batch")
      // the cross-batch pattern is present (click,view in batch 1, purchase in 2)
      assert(streamed(("click", "view", "purchase")) === 1L)
    }
  }

  test("attributionStream (transformWithState) credits every purchase exactly as " +
    "batch q109 does — including the window-expired 'direct' and the touch " +
    "carried across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(Long, Timestamp, Long, String)]
      val q = EventStream.attributionStream(
          mem.toDF().toDF("user_id", "ts", "event_id", "event_type"))
        .toDF().writeStream.format("memory")
        .queryName("attr_out").outputMode("append").start()
      mem.addData(twinBatch1: _*)
      q.processAllAvailable()
      mem.addData(twinBatch2: _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("attr_out")
        .groupBy($"touch_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.operators.TimeSeries.attribution(
          (twinBatch1 ++ twinBatch2).toDF("user_id", "ts", "event_id", "event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch, s"stream $streamed vs batch $batch")
      assert(streamed === Map("view" -> 2L, "direct" -> 2L))
    }
  }

  test("spanOverlapStream (transformWithState) flags exactly the docs batch " +
    "q118 flags — same-batch sharers, cross-batch repeats, and never a " +
    "7-token overlap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val run = (1 to 11).map(i => s"r$i").mkString(" ")
      val doc1 = s"$run ${(1 to 9).map(i => s"a$i").mkString(" ")}"
      val doc2 = s"p1 p2 p3 $run ${(1 to 6).map(i => s"b$i").mkString(" ")}"
      // doc 5 shares the run too and lands in the SAME batch as doc 1
      val doc5 = s"x1 $run ${(1 to 7).map(i => s"e$i").mkString(" ")}"
      val doc3 = s"${(1 to 7).map(i => s"r$i").mkString(" ")} " +
        (1 to 10).map(i => s"c$i").mkString(" ")
      val mem = MemoryStream[(Long, String)]
      val q = EventStream.spanOverlapStream(mem.toDF().toDF("doc_id", "text"))
        .toDF().writeStream.format("memory")
        .queryName("span_out").outputMode("append").start()
      mem.addData(1L -> doc1, 5L -> doc5, 3L -> doc3)
      q.processAllAvailable()
      mem.addData(2L -> doc2) // cross-batch repeat
      q.processAllAvailable()
      q.stop()
      val hits = spark.table("span_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("first_doc")))
      // same-batch: doc 5 hits against first-seen doc 1; cross-batch: doc 2
      assert(hits.exists(h => h._1 == 5L && h._2 == 1L), hits.toSeq.toString)
      assert(hits.exists(h => h._1 == 2L && h._2 == 1L), hits.toSeq.toString)
      assert(!hits.exists(h => h._1 == 3L || h._2 == 3L), hits.toSeq.toString)
      // parity: the docs the STREAM flags (plus the first carrier) are
      // exactly the docs the BATCH query reports as sharing spans
      val dir = java.nio.file.Files.createTempDirectory("graft-spanstream").toString
      Seq(1L -> doc1, 5L -> doc5, 3L -> doc3, 2L -> doc2).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val batchShared = graft.functions.TextOps.q118RepeatedSpans(spark, dir)
        .where($"n_shared_spans" > 0).collect().map(_.getAs[Long]("doc_id")).toSet
      val streamShared = hits.map(_._1).toSet ++ hits.map(_._2).toSet
      assert(streamShared == batchShared, s"stream $streamShared vs batch $batchShared")
    }
  }

  test("evalSpanScrubStream is STATELESS and matches batch q150 row-for-row " +
    "on real sf0.001 data with train docs spread across micro-batches; the " +
    "eval-window cap trips loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchAnswer = graft.functions.TextOps.q150EvalSpanScrub(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batchAnswer.nonEmpty, "fixture has no contamination — parity vacuous")
    val all = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val (evalDocs, trainDocs) = all.partition(_._1 % 19 == 0)
    val mem = MemoryStream[(Long, String)]
    val cuts = EventStream.evalSpanScrubStream(
      mem.toDF().toDF("doc_id", "text"),
      evalDocs.toSeq.toDF("doc_id", "text"))
    val q = cuts.toDF().writeStream.format("memory")
      .queryName("scrub_out").outputMode("append").start()
    val (half1, half2) = trainDocs.splitAt(trainDocs.length / 2)
    mem.addData(half1.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(half2.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scrub_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batchAnswer,
      s"stream-only: ${streamed -- batchAnswer}; batch-only: ${batchAnswer -- streamed}")
    // the misconfigured-eval guard is loud, not silent truncation
    val e = intercept[IllegalArgumentException] {
      EventStream.evalSpanScrubStream(
        mem.toDF().toDF("doc_id", "text"),
        evalDocs.toSeq.toDF("doc_id", "text"), maxEvalWindows = 1L)
    }
    assert(e.getMessage.contains("corpus-scale"), e.getMessage)
  }

  test("semanticDeconStream is STATELESS and matches batch q153 row-for-row " +
    "on real sf0.001 embeddings across micro-batches; the eval-matrix cap " +
    "trips loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchAnswer = graft.functions.VectorOps.q153SemanticDecon(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(batchAnswer.exists(_._4) && batchAnswer.exists(!_._4),
      "fixture flag split degenerate — parity would be vacuous")
    val all = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val (evalVecs, trainVecs) = all.partition(_._1 % 19 == 0)
    val mem = MemoryStream[(Long, Array[Double])]
    val audits = EventStream.semanticDeconStream(
      mem.toDF().toDF("vec_id", "embedding"),
      evalVecs.toSeq.toDF("vec_id", "embedding"))
    val q = audits.toDF().writeStream.format("memory")
      .queryName("semdecon_out").outputMode("append").start()
    val (half1, half2) = trainVecs.splitAt(trainVecs.length / 2)
    mem.addData(half1.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(half2.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("semdecon_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(streamed == batchAnswer,
      s"stream-only: ${(streamed -- batchAnswer).take(3)}; " +
        s"batch-only: ${(batchAnswer -- streamed).take(3)}")
    val e = intercept[IllegalArgumentException] {
      EventStream.semanticDeconStream(
        mem.toDF().toDF("vec_id", "embedding"),
        evalVecs.toSeq.toDF("vec_id", "embedding"), maxEvalVectors = 1L)
    }
    assert(e.getMessage.contains("corpus-scale"), e.getMessage)
  }

  test("erResolveStream is STATELESS and resolves streamed part records " +
    "against a batch-built entity table exactly like a driver-side reference " +
    "(exact hit, blocked fuzzy match with deterministic tie-break, or new " +
    "entity), across micro-batches; the broadcast cap trips loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def levd(a: String, b: String): Int = {
      var dp = (0 to b.length).toArray
      for (i <- 1 to a.length) {
        val nd = new Array[Int](b.length + 1); nd(0) = i
        for (j <- 1 to b.length)
          nd(j) = math.min(math.min(dp(j) + 1, nd(j - 1) + 1),
            dp(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp = nd
      }
      dp(b.length)
    }
    // entity table: the full-corpus labels restricted to even-nid names
    // (the committed catalog); the stream replays EVERY record, so the
    // odd-nid names must resolve by fuzzy block probe or found new
    // entities
    val labels = graft.functions.EntityOps.entityLabels(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val table = labels.filter(_._2 % 2 == 0).map { case (n, _, e) => (n, e) }
    val records = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey".cast("long"), $"p_name")
      .as[(Long, String)].collect()
    val tmap = table.toMap
    val expected = records.map { case (key, nm) =>
      tmap.get(nm) match {
        case Some(e) => (key, nm, e, "exact", 0L)
        case None =>
          val toks = nm.split(" ")
          val cands = table.filter { case (tn, _) =>
            val tt = tn.split(" ")
            tt.head == toks.head || tt.last == toks.last
          }
          val best = cands.map { case (tn, te) => (levd(nm, tn), te, tn) }
            .filter(_._1 <= graft.functions.EntityOps.MatchMaxDist)
            .sorted.headOption
          best match {
            case Some((d, te, _)) => (key, nm, te, "fuzzy", d.toLong)
            case None => (key, nm, -1L, "new", -1L)
          }
      }
    }.toSet
    assert(Set("exact", "fuzzy", "new").subsetOf(expected.map(_._4)),
      "fixture split degenerate — a resolution class never occurs")
    val mem = MemoryStream[(Long, String)]
    val out = EventStream.erResolveStream(
      mem.toDF().toDF("record_key", "name"),
      table.toSeq.toDF("name", "entity_id"))
    val q = out.toDF().writeStream.format("memory")
      .queryName("er_resolve_out").outputMode("append").start()
    val (h1, h2) = records.splitAt(records.length / 2)
    mem.addData(h1.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(h2.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("er_resolve_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSet
    assert(streamed == expected,
      s"stream-only: ${(streamed -- expected).take(3)}; " +
        s"reference-only: ${(expected -- streamed).take(3)}")
    val e = intercept[IllegalArgumentException] {
      EventStream.erResolveStream(mem.toDF().toDF("record_key", "name"),
        table.toSeq.toDF("name", "entity_id"), maxNames = 1L)
    }
    assert(e.getMessage.contains("catalog-scale"), e.getMessage)
  }

  test("nearDupProbeStream (transformWithState): the band-bucket state probe " +
    "answers exactly like the q126 batch query on the same corpus/batch split, " +
    "with the corpus spread across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tA = "alpha beta gamma delta epsilon zeta"
    val tB = "one two three four five six seven"
    val tC = "red orange yellow green blue indigo"
    val tNew = "totally novel unique words nobody committed"
    // q126's stand-in split: corpus = doc_id % 10 != 9, batch = == 9.
    // Identical texts guarantee band collisions (9→1, 9→12, 19→2).
    val corpusDocs = Seq(1L -> tA, 2L -> tB, 3L -> tC, 12L -> tA)
    val probeDocs = Seq(9L -> tA, 19L -> tB, 29L -> tNew)
    val dir = java.nio.file.Files.createTempDirectory("graft-neardupstream").toString
    (corpusDocs ++ probeDocs).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val batchAnswer = graft.functions.TextOps.q126IncrementalNeardup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRocksDb {
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = EventStream.nearDupProbeStream(
          mem.toDF().toDF("doc_id", "text", "is_probe"))
        .toDF().writeStream.format("memory")
        .queryName("neardup_probe_out").outputMode("append").start()
      // corpus commits land across two micro-batches (cross-batch state);
      // the arriving batch probes in a third
      mem.addData((1L, tA, false), (2L, tB, false))
      q.processAllAvailable()
      mem.addData((3L, tC, false), (12L, tA, false))
      q.processAllAvailable()
      mem.addData(probeDocs.map { case (id, t) => (id, t, true) }: _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("neardup_probe_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchAnswer, s"stream $streamed vs batch $batchAnswer")
      assert(streamed((9L, 1L)) && streamed((9L, 12L)) && streamed((19L, 2L)),
        streamed.toString)
      assert(!streamed.exists(_._1 == 29L), streamed.toString) // novel doc: no hits
    }
  }

  test("nearDupProbeStream hot-bucket cap: past maxBucketMembers a bucket " +
    "stops growing and probes hitting it emit the LOUD overflow marker; " +
    "uncapped buckets answer exactly (VERDICT r10 #3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hot = "alpha beta gamma delta epsilon zeta"   // 4 hot band buckets
    val cold = "one two three four five six seven"
    withRocksDb {
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = EventStream.nearDupProbeStream(
          mem.toDF().toDF("doc_id", "text", "is_probe"), maxBucketMembers = 2)
        .toDF().writeStream.format("memory")
        .queryName("neardup_cap_out").outputMode("append").start()
      // 4 identical docs flood every one of hot's band buckets (cap 2);
      // one doc sits alone in cold's buckets
      mem.addData((1L, hot, false), (2L, hot, false), (3L, hot, false),
        (4L, hot, false), (5L, cold, false))
      q.processAllAvailable()
      mem.addData((9L, hot, true), (19L, cold, true))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("neardup_cap_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      import EventStream.NearDupProbeProcessor.Overflow
      // hot probe: only the capped members match, plus the overflow marker
      assert(streamed == Set((9L, 1L), (9L, 2L), (9L, Overflow), (19L, 5L)),
        streamed.toString)
    }
  }

  test("nearDupProbeStream at-least-once redelivery: a committed doc " +
    "re-delivered in a later micro-batch neither duplicates state nor " +
    "latches a PHANTOM overflow marker") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hot = "alpha beta gamma delta epsilon zeta"
    withRocksDb {
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = EventStream.nearDupProbeStream(
          mem.toDF().toDF("doc_id", "text", "is_probe"), maxBucketMembers = 2)
        .toDF().writeStream.format("memory")
        .queryName("neardup_redeliver_out").outputMode("append").start()
      // 2 members fill the bucket to EXACTLY the cap...
      mem.addData((1L, hot, false), (2L, hot, false))
      q.processAllAvailable()
      // ...then the upstream re-delivers BOTH (at-least-once) — with a
      // naive cumulative count this would push nSeen to 4 > 2 and every
      // probe would report a bogus overflow
      mem.addData((1L, hot, false), (2L, hot, false))
      q.processAllAvailable()
      mem.addData((9L, hot, true))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("neardup_redeliver_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      import EventStream.NearDupProbeProcessor.Overflow
      assert(streamed == Set((9L, 1L), (9L, 2L)),
        s"redelivery must not duplicate hits or mark overflow: $streamed")
      assert(!streamed.exists(_._2 == Overflow), streamed.toString)
    }
  }

  test("imageDupProbeStream (transformWithState): visual near-dup hits equal the " +
    "brute-force Hamming<=3 probe-vs-corpus set, across micro-batches, probes " +
    "never matching each other, corrupt payloads dropped — and the dispatch is " +
    "container-agnostic: a JPEG-committed image matches a PNG probe") {
    import spark.implicits._
    import graft.multimodal.{JpegCodec, MediaHeaders, Multimodal}
    implicit val sqlCtx = spark.sqlContext
    // 16×16 grayscale fixtures with controlled aHash geometry:
    //   split  — left half 255 / right half 0 (bits 0x0F0F0F0F|0x0F0F0F0F)
    //   dent   — split with the top-left 2×2 block darkened → Hamming 1
    //   inv    — inverted split → Hamming 64 from split (no hit)
    val split = Array.tabulate(256)(i => if (i % 16 < 8) 255 else 0)
    val dent = split.clone()
    for (y <- 0 until 2; x <- 0 until 2) dent(y * 16 + x) = 0
    val inv = split.map(255 - _)
    def png(px: Array[Int]) = MediaHeaders.pngPixelBytes(16, 16, px)
    // split/inv are 8x8-block-constant, so baseline JPEG decodes them
    // EXACTLY — committing image 1 as JPEG must not change any hit
    def jpeg(px: Array[Int]) = JpegCodec.encode(16, 16, px)
    val corpus = Seq(1L -> split, 2L -> inv)
    val probes = Seq(9L -> split, 19L -> dent, 29L -> inv)
    // expected: brute-force Hamming over the same ahash64 chain
    def hash(px: Array[Int]) = Multimodal.ahash64(16, 16, px)
    val expected = (for {
      (pid, ppx) <- probes; (cid, cpx) <- corpus
      (phi, plo, _) = hash(ppx); (chi, clo, _) = hash(cpx)
      d = java.lang.Long.bitCount(phi ^ chi) + java.lang.Long.bitCount(plo ^ clo)
      if d <= 3
    } yield (pid, cid, d)).toSet
    assert(expected === Set((9L, 1L, 0), (19L, 1L, 1), (29L, 2L, 0)), expected.toString)
    withRocksDb {
      val mem = MemoryStream[(Long, Array[Byte], Boolean)]
      val q = EventStream.imageDupProbeStream(
          mem.toDF().toDF("media_id", "data", "is_probe"))
        .toDF().writeStream.format("memory")
        .queryName("imagedup_out").outputMode("append").start()
      // corpus commits across two micro-batches; one corrupt payload;
      // image 1 arrives as JPEG — its PNG probes (9, dent 19) still hit
      mem.addData((1L, jpeg(split), false), (50L, "JUNK".getBytes, false))
      q.processAllAvailable()
      mem.addData((2L, png(inv), false))
      q.processAllAvailable()
      mem.addData(probes.map { case (id, px) => (id, png(px), true) }: _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("imagedup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed === expected, s"stream $streamed vs expected $expected")
    }
  }

  test("imageDupProbeStream sees VIDEO: a committed MJPEG registers its " +
    "stride-2 SAMPLED frames, a probe video hits on any sampled frame, and " +
    "a frame the thinning dropped is invisible — the q165 composition live") {
    import spark.implicits._
    import graft.multimodal.{JpegCodec, MediaHeaders}
    implicit val sqlCtx = spark.sqlContext
    val split = Array.tabulate(256)(i => if (i % 16 < 8) 255 else 0)
    val inv = split.map(255 - _)
    def jpeg(px: Array[Int]) = JpegCodec.encode(16, 16, px)
    def mjpeg(fs: Array[Int]*) = MediaHeaders.mjpegBytes(fs.map(jpeg))
    withRocksDb {
      val mem = MemoryStream[(Long, Array[Byte], Boolean)]
      val q = EventStream.imageDupProbeStream(
          mem.toDF().toDF("media_id", "data", "is_probe"))
        .toDF().writeStream.format("memory")
        .queryName("videodup_out").outputMode("append").start()
      // corpus: image 1 = split; video 3 = [inv, split, inv] — stride-2
      // keeps frames 0 and 2, so ONLY inv registers under id 3 (the
      // middle split frame is thinned away)
      mem.addData((1L, jpeg(split), false), (3L, mjpeg(inv, split, inv), false))
      q.processAllAvailable()
      // probe video 19 = [split, inv, inv]: sampled frames split + inv —
      // split finds image 1, inv finds video 3; split must NOT find
      // video 3 (its split frame was never registered). Image probe 9
      // behaves exactly as before alongside video members.
      mem.addData(
        (19L, mjpeg(split, inv, inv), true),
        (9L, MediaHeaders.pngPixelBytes(16, 16, split), true))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("videodup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed === Set((19L, 1L, 0), (19L, 3L, 0), (9L, 1L, 0)),
        streamed.toString)
    }
  }

  test("imageDupProbeStream keyframe mode registers the ONE-FRAME scene that " +
    "stride-2 misses (q177's rule live): the same A-A-A-B video yields no " +
    "probe hit under stride-2 thinning and a Hamming-0 hit under " +
    "scene-change keyframes") {
    import spark.implicits._
    import graft.multimodal.{JpegCodec, MediaHeaders}
    implicit val sqlCtx = spark.sqlContext
    val split = Array.tabulate(256)(i => if (i % 16 < 8) 255 else 0)
    val inv = split.map(255 - _)
    def jpeg(px: Array[Int]) = JpegCodec.encode(16, 16, px)
    // scene B (split) is held for ONE frame at odd index 3: stride-2
    // keeps frames 0 and 2 (both inv), so B never registers
    val video = MediaHeaders.mjpegBytes(
      Seq(jpeg(inv), jpeg(inv), jpeg(inv), jpeg(split)))
    for (useKeyframes <- Seq(false, true)) withRocksDb {
      val mem = MemoryStream[(Long, Array[Byte], Boolean)]
      val name = s"kfdup_out_$useKeyframes"
      val q = EventStream.imageDupProbeStream(
          mem.toDF().toDF("media_id", "data", "is_probe"),
          keyframes = useKeyframes)
        .toDF().writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      mem.addData((3L, video, false))
      q.processAllAvailable()
      mem.addData((9L, jpeg(split), true))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      if (useKeyframes)
        assert(streamed === Set((9L, 3L, 0)),
          s"keyframe mode must surface the one-frame scene: $streamed")
      else
        assert(streamed === Set.empty[(Long, Long, Int)],
          s"stride-2 registered the B frame — fixture broke: $streamed")
    }
  }

  test("windowedAgg over a memory stream matches the batch tumbling window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "click", 4.0))
    val streamed = EventStream.windowedAgg(
      mem.toDF().toDF("ts", "event_type", "value"))
    val q = streamed.writeStream.format("memory")
      .queryName("agg_out").outputMode("append").start()
    mem.addData((ts("2024-01-01 14:00:00"), "click", 8.0)) // advances watermark past 11:00
    q.processAllAvailable()
    q.stop()
    val out = spark.table("agg_out")
      .select($"window_start".cast("string"), $"n_events", $"total_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // windows 10:00 and 11:00 are closed by the 14:00 watermark
    assert(out === Set(
      ("2024-01-01 10:00:00", 2L, 3.0),
      ("2024-01-01 11:00:00", 1L, 4.0)))
  }

  test("sessionAgg merges a session across micro-batches and splits on the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    // batch 1: two events 10 min apart — one open session for user 7
    mem.addData(
      (ts("2024-01-01 10:00:00"), 7L, 1.0),
      (ts("2024-01-01 10:10:00"), 7L, 2.0))
    val streamed = EventStream.sessionAgg(
      mem.toDF().toDF("ts", "user_id", "value"))
    val q = streamed.writeStream.format("memory")
      .queryName("session_out").outputMode("append").start()
    q.processAllAvailable()
    // batch 2: 10:25 is within the 30-min gap of 10:10 -> same session;
    // 12:00 starts a new one
    mem.addData(
      (ts("2024-01-01 10:25:00"), 7L, 4.0),
      (ts("2024-01-01 12:00:00"), 7L, 8.0))
    q.processAllAvailable()
    // batch 3: advance the watermark far enough to close both sessions
    mem.addData((ts("2024-01-01 16:00:00"), 9L, 0.5))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("session_out")
      .select($"user_id", $"session_start".cast("string"), $"n_events", $"session_value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // the cross-batch events merged into ONE session despite arriving separately
    assert(out === Set(
      (7L, "2024-01-01 10:00:00", 3L, 7.0),
      (7L, "2024-01-01 12:00:00", 1L, 8.0)))
  }

  test("dedupStream drops re-delivered events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:00:01"), 1.0), // duplicate event_id
      (2L, ts("2024-01-01 10:00:02"), 2.0))
    val q = EventStream.dedupStream(mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("streaming near-dup dedup: cross-batch duplicate suppression within the " +
    "watermark, state evicted beyond it, transactional sink") {
    import graft.sources.ManifestTable
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup-stream").toString
    val root = s"$dir/t"
    val ckpt = s"$dir/ckpt"
    val mem = MemoryStream[(Long, Timestamp, String)]
    def run(): Unit = {
      val q = EventStream.dedupDocSink(mem.toDF().toDF("doc_id", "ts", "text"), root)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    def sinkRows: Set[(Long, String)] =
      ManifestTable.read(spark, root).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fingerprint"))).toSet

    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 10:05:00"), "lorem ipsum dolor"))
    run()
    assert(sinkRows.map(_._1) == Set(1L, 2L))

    // a LATER micro-batch re-delivers doc 1's content (different doc_id,
    // different whitespace — the q29 normalization catches it) inside the
    // watermark: suppressed; a genuinely new doc passes
    mem.addData(
      (10L, ts("2024-01-01 10:10:00"), "  the   quick brown fox "),
      (3L, ts("2024-01-01 10:15:00"), "fresh document three"))
    run()
    assert(sinkRows.map(_._1) == Set(1L, 2L, 3L), s"got $sinkRows")

    // advance the watermark far past the first docs: their dedup state is
    // dropped, so the SAME content re-arriving with a fresh timestamp is
    // admitted again — which proves the state is watermark-bounded, not
    // corpus-sized (it merges over the old row: same fingerprint key)
    mem.addData((4L, ts("2024-01-01 20:00:00"), "much later document"))
    run()
    mem.addData((11L, ts("2024-01-01 20:05:00"), "the quick brown fox"))
    run()
    val rows = sinkRows
    assert(rows.map(_._1) == Set(11L, 2L, 3L, 4L), s"got $rows")
    assert(rows.size == 4) // one row per fingerprint: merge keyed on it
  }

  test("foreachBatch merge sink: batches upsert and re-delivery converges (D2 streaming)") {
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("sink").toString + "/table"
    val b1 = Seq(("k1", 1.0), ("k2", 2.0)).toDF("key", "v")
    val b2 = Seq(("k2", 20.0), ("k3", 3.0)).toDF("key", "v")
    EventStream.mergeIntoParquet(b1, sink, Seq("key"))
    EventStream.mergeIntoParquet(b2, sink, Seq("key"))
    EventStream.mergeIntoParquet(b2, sink, Seq("key")) // re-delivery
    val out = spark.read.parquet(sink).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out === Set(("k1", 1.0), ("k2", 20.0), ("k3", 3.0)))
  }

  test("mergePartitioned touches only the batch's partitions") {
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("psink").toString + "/t"
    val day1 = Seq(("k1", "2026-01-01", 1.0), ("k2", "2026-01-01", 2.0))
    val day2 = Seq(("k3", "2026-01-02", 3.0))
    EventStream.mergePartitioned(
      (day1 ++ day2).toDF("key", "day", "v"), sink, Seq("key"), "day")
    val d2FileBefore = new java.io.File(s"$sink/day=2026-01-02").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified()).max
    Thread.sleep(1100)
    // batch touching only day1
    EventStream.mergePartitioned(
      Seq(("k1", "2026-01-01", 10.0)).toDF("key", "day", "v"), sink, Seq("key"), "day")
    val d2FileAfter = new java.io.File(s"$sink/day=2026-01-02").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified()).max
    assert(d2FileAfter === d2FileBefore, "untouched partition was rewritten")
    val out = spark.read.parquet(sink).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Double]("v"))).toSet
    assert(out === Set(("k1", 10.0), ("k2", 2.0), ("k3", 3.0)))
  }

  test("UserProfile is a first-class typed Dataset (S4)") {
    import spark.implicits._
    val p = graft.schema.UserProfile(70.0, 180.0, "cm", 72.5, "kg", Some(20545), None)
    val ds = Seq(p).toDS()
    assert(ds.filter(_.goal_weight_kg == 70.0).count() === 1)
    assert(ds.collect().head === p)
  }

  test("stream-stream join: purchases join clicks within a time bound, state watermark-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)] // user, ts, click_id
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val c = clicks.toDF().toDF("user_id", "c_ts", "click_id")
      .withWatermark("c_ts", "1 hour")
    val p = purchases.toDF().toDF("p_user", "p_ts", "purchase_id")
      .withWatermark("p_ts", "1 hour")
    val joined = p.join(c,
      expr("""p_user = user_id AND
              c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 30 MINUTES"""))
    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L))
    purchases.addData(
      (1L, ts("2024-01-01 10:10:00"), 200L), // within 30 min of click 100
      (1L, ts("2024-01-01 11:10:00"), 201L)) // outside the bound
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ss_join")
      .select($"purchase_id", $"click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((200L, 100L)))
  }

  test("intervalJoinStream: inner join matches the q121 batch twin on the same rows; " +
    "left-outer emits the unconverted view AFTER the watermark proves no match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // view 10 converts (purchase 20 at +30 min); purchase 21 at +2h is
    // outside the hour; view 11 never converts
    val viewRows = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 11L, ts("2024-01-01 10:05:00")))
    val purchRows = Seq(
      (1L, 20L, ts("2024-01-01 10:30:00"), 9.5),
      (1L, 21L, ts("2024-01-01 12:00:00"), 1.0))

    // inner: stream answer ≡ batch answer from the identical predicate
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = EventStream.intervalJoinStream(
      vMem.toDF().toDF("user_id", "view_id", "view_ts"),
      pMem.toDF().toDF("p_user", "purchase_id", "purchase_ts", "amount"))
    val q = joined.writeStream.format("memory")
      .queryName("ivj_inner").outputMode("append").start()
    vMem.addData(viewRows: _*)
    pMem.addData(purchRows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ivj_inner")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = viewRows.toDF("user_id", "view_id", "view_ts").join(
        purchRows.toDF("p_user", "purchase_id", "purchase_ts", "amount"),
        expr("user_id = p_user AND purchase_ts >= view_ts AND " +
          "purchase_ts < view_ts + INTERVAL 1 HOUR"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("view_id"), r.getAs[Long]("purchase_id"))).toSet
    assert(streamed === batch)
    assert(streamed === Set((1L, 10L, 20L)))

    // left outer: view 11's null-padded row appears only once BOTH
    // watermarks pass view_ts + 1h (outer emission is delayed, not lost)
    val vMem2 = MemoryStream[(Long, Long, Timestamp)]
    val pMem2 = MemoryStream[(Long, Long, Timestamp, Double)]
    val outer = EventStream.intervalJoinStream(
      vMem2.toDF().toDF("user_id", "view_id", "view_ts"),
      pMem2.toDF().toDF("p_user", "purchase_id", "purchase_ts", "amount"),
      joinType = "leftOuter", watermark = "10 minutes")
    val q2 = outer.writeStream.format("memory")
      .queryName("ivj_outer").outputMode("append").start()
    vMem2.addData(viewRows: _*)
    pMem2.addData(purchRows.head) // only the 10:30 purchase for now
    q2.processAllAvailable()
    val early = spark.table("ivj_outer").where($"purchase_id".isNull).count()
    assert(early === 0, "outer null row must not emit before the watermark allows it")
    // push both watermarks past 11:05 + 10 min: view 11 is now provably
    // unmatched (its hour ended 12:05 > watermark? use far-future rows)
    vMem2.addData((9L, 99L, ts("2024-01-02 00:00:00")))
    pMem2.addData((9L, 98L, ts("2024-01-02 00:00:00"), 0.0))
    q2.processAllAvailable()
    // outer rows are evicted-then-emitted by a FOLLOWING batch; nudge one
    vMem2.addData((9L, 97L, ts("2024-01-02 01:00:00")))
    pMem2.addData((9L, 96L, ts("2024-01-02 01:00:00"), 0.0))
    q2.processAllAvailable()
    q2.stop()
    val unconverted = spark.table("ivj_outer")
      .where($"purchase_id".isNull && $"user_id" === 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unconverted === Set((2L, 11L)))
    // and the matched pair came through exactly once (user 9's
    // watermark-advancing rows match each other — ignore them here)
    val matched = spark.table("ivj_outer")
      .where($"purchase_id".isNotNull && $"user_id" === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(matched === Set((1L, 10L, 20L)))
  }

  test("file stream end-to-end: json events → windowed agg → memory sink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evts").toString
    val lines = Seq(
      """{"event_id":1,"ts":"2024-01-01T10:05:00.000Z","user_id":1,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T10:20:00.000Z","user_id":2,"event_type":"click","value":2.5,"props":"{}"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part1.json"),
      lines.mkString("\n").getBytes)
    val q = EventStream.windowedAgg(EventStream.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("file_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("file_out").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("total_value") === 4.0)
  }

  test("crossModalProbeStream (transformWithState): tagged per-modality hits " +
    "equal the brute-force cross-split recompute ON REAL CORPUS TEXT — image " +
    "hits at aHash Hamming<=3 over the content-keyed images (DataFrame-chain " +
    "ground truth, so the stream's JVM signature mirror is cross-checked), " +
    "caption hits at q30 bucket equality — across micro-batches; q195's " +
    "classification is a grouping of the tags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").where($"doc_id" < 240)
    val corpus = all.where($"doc_id" % 10 =!= 9)
    val probes = all.where($"doc_id" % 10 === 9)

    // ground truth via the BATCH DataFrame chains (not the stream's own
    // JVM helpers): image hashes through CrossModalIndex.bandFacts,
    // caption buckets through TextOps.bandRowsOf
    def hashes(df: org.apache.spark.sql.DataFrame) =
      graft.sources.CrossModalIndex.bandFacts(df)
        .select($"media_id", $"hi", $"lo").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def capRows(df: org.apache.spark.sql.DataFrame) =
      graft.functions.TextOps.bandRowsOf(df).where($"doc_id" % 3 === 0)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Int]("band"), r.getAs[String]("bucket")))
    val (ch, ph) = (hashes(corpus), hashes(probes))
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
    val expImage = (for { p <- ph; c <- ch if ham(p, c) <= 3 }
      yield ("image", p._1, c._1)).toSet
    val (cr, pr) = (capRows(corpus), capRows(probes))
    val expCaption = (for {
      p <- pr; c <- cr if p._2 == c._2 && p._3 == c._3
    } yield ("caption", p._1, c._1)).toSet
    val expected = expImage ++ expCaption
    assert(expImage.nonEmpty && expCaption.nonEmpty,
      "the sample should exercise both arms")

    withRocksDb {
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = EventStream.crossModalProbeStream(
          mem.toDF().toDF("doc_id", "text", "is_probe"))
        .toDF().writeStream.format("memory")
        .queryName("xmodal_out").outputMode("append").start()
      // corpus commits across two micro-batches, then the probes
      val crows = corpus.collect().map(r => (r.getLong(0), r.getString(1), false))
      mem.addData(crows.filter(_._1 % 2 == 0).toSeq: _*)
      q.processAllAvailable()
      mem.addData(crows.filter(_._1 % 2 == 1).toSeq: _*)
      q.processAllAvailable()
      mem.addData(probes.collect()
        .map(r => (r.getLong(0), r.getString(1), true)).toSeq: _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("xmodal_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === expected, s"stream ${streamed.size} hits vs " +
        s"expected ${expected.size}: extra=${streamed -- expected} " +
        s"missing=${expected -- streamed}")
    }
  }

  test("crossModalProbeStream hot-key gate (ADVICE r17): an image band key " +
    "whose committed membership crosses the cap stops matching — the batch " +
    "q198's corpus-side ModalityBandCap semantics — while caption keys stay " +
    "uncapped like q198's caption arm; hits emitted while the key was under " +
    "the cap are not retracted (append-stream contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // identical captions -> identical h0 -> identical content-keyed image
    // -> every committed doc lands in the SAME four image band keys AND
    // the same caption buckets; ids are image-carrying (hasImage)
    val caption = "alpha beta gamma delta"
    withRocksDb {
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = EventStream.crossModalProbeStream(
          mem.toDF().toDF("doc_id", "text", "is_probe"), bandCap = 3)
        .toDF().writeStream.format("memory")
        .queryName("xmodal_capped").outputMode("append").start()
      // commit 2 members (under the cap of 3), probe: BOTH arms hit
      mem.addData((0L, caption, false), (3L, caption, false))
      mem.addData((9L, caption, true))
      q.processAllAvailable()
      val first = spark.table("xmodal_capped").collect()
        .map(r => (r.getString(0), r.getLong(2))).toSet
      assert(first === Set(("image", 0L), ("image", 3L),
        ("caption", 0L), ("caption", 3L)), first.toString)
      // three more members cross the cap (5 > 3); a second probe gets NO
      // image hits — the hot key contributes no candidates, exactly the
      // batch gate — but every caption hit (uncapped arm)
      mem.addData((6L, caption, false), (12L, caption, false),
        (18L, caption, false))
      mem.addData((21L, caption, true))
      q.processAllAvailable()
      q.stop()
      val after = spark.table("xmodal_capped").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val secondProbe = after.filter(_._2 == 21L)
      assert(!secondProbe.exists(_._1 == "image"),
        s"hot image key must stop matching: $secondProbe")
      assert(secondProbe.map(_._3) === Set(0L, 3L, 6L, 12L, 18L),
        s"caption arm stays uncapped: $secondProbe")
      // the first probe's pre-crossing image hits still stand
      assert(after.filter(_._2 == 9L) === first.map(t => (t._1, 9L, t._2)),
        "append-stream: earlier hits are never retracted")
    }
  }

  test("crossModalProbeStream hot-key gate counts DISTINCT members " +
    "(ADVICE r18): a cross-batch re-commit of an already-stored doc must " +
    "not inflate the counter past the cap — the batch gate counts each " +
    "stored band row once, and a falsely-tripped key would diverge " +
    "irreversibly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val caption = "alpha beta gamma delta"
    withRocksDb {
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = EventStream.crossModalProbeStream(
          mem.toDF().toDF("doc_id", "text", "is_probe"), bandCap = 3)
        .toDF().writeStream.format("memory")
        .queryName("xmodal_recommit").outputMode("append").start()
      // three distinct members: AT the cap (3), key still live
      mem.addData((0L, caption, false), (3L, caption, false),
        (6L, caption, false))
      q.processAllAvailable()
      // a LATER batch re-commits doc 0 — same doc, same deterministic
      // fingerprint. Raw arrival counting would read 4 > cap and kill
      // the key forever; distinct counting recognizes the duplicate.
      mem.addData((0L, caption, false))
      q.processAllAvailable()
      mem.addData((9L, caption, true))
      q.processAllAvailable()
      q.stop()
      val hits = spark.table("xmodal_recommit").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(hits.filter(_._1 == "image").map(_._3) === Set(0L, 3L, 6L),
        s"re-commit falsely tripped the cap: $hits")
    }
  }
}
