package graft

import graft.sources.{GainWindowIndex, ManifestTable, ReencodeIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lifecycle of the two maintained ROBUST media indexes — the banded
  * keyframe-aHash table ([[graft.sources.ReencodeIndex]]) and the
  * sign-of-delta window table ([[graft.sources.GainWindowIndex]]) —
  * under the shared CDC protocol: arrivals decode and add live rows,
  * retractions tombstone the preimage's rows, an update that leaves
  * the media unchanged nets to zero and commits nothing, replay is
  * rejected, the turnkey streams survive a checkpoint restart, and
  * the four read faces (q191–q194) equal from-scratch brute
  * recomputes. Maintained ≡ recomputed is the gate everywhere. */
class RobustIndexSpec extends SparkSpec {

  // n_chars = length(text) drives the generators. Re-encode videos
  // live on doc_id % 3 == 2 with gid = doc_id/4 ≡ 2 (mod 3): members
  // 4g and 4g+3 are the normal/re-encoded pair; frame COUNT is
  // n_chars % 4 + 4 (pixels key off gid alone). Gain audio lives on
  // doc_id % 3 == 1: PCM keys off gid and the member's gain
  // (doc_id % 4 == 3 → ×2); n_chars only moves the WAV rate header,
  // which the sample extractor ignores.
  private def docsDf(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, n) => (id, "x" * n) }.toDF("doc_id", "text")
  }

  private def nCharsOf(corpus: String): DataFrame =
    ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))

  // ------------------------------------------------ re-encode bands

  private def reencSet(idx: String): Set[(Long, Long, Long, String, Long, Long)] =
    ReencodeIndex.readReencodeIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSet

  private def assertReencSnapshot(corpus: String, idx: String,
      clue: String): Unit = {
    val expected = ReencodeIndex.computeReencodeIndex(nCharsOf(corpus))
      .select(col("bk"), col("media_id"), col("sc"), col("fp"),
        col("hi"), col("lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSet
    assert(reencSet(idx) == expected, s"reencode index drifted: $clue")
  }

  test("reencode index: maintained ≡ recomputed across insert / update / " +
    "delete; an update that keeps n_chars % 4 leaves the clip unchanged " +
    "and commits NOTHING; replay is rejected") {
    val work = Files.createTempDirectory("graft-reencidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/reenc")

    // gid=2 pair (docs 8, 11) + gid=5 pair (20, 23); doc 9 carries none
    val v1 = ManifestTable.merge(
      docsDf(8L -> 10, 11L -> 10, 20L -> 13, 23L -> 13, 9L -> 7),
      corpus, Seq("doc_id"))
    ReencodeIndex.refresh(spark, corpus, idx, 0, v1)
    assertReencSnapshot(corpus, idx, "after v1")
    val rows1 = reencSet(idx)
    assert(rows1.map(_._2) == Set(8L, 11L, 20L, 23L), "media ids in index")

    // v2: update doc 8's frame count (10 → 11 flips n_chars % 4: new
    // keyframe set) + nothing else
    val v2 = ManifestTable.merge(docsDf(8L -> 11), corpus, Seq("doc_id"))
    ReencodeIndex.refresh(spark, corpus, idx, v1, v2)
    assertReencSnapshot(corpus, idx, "after v2 update")

    // v3: doc 11's text grows by 4 (n_chars % 4 unchanged → identical
    // clip) — the delta nets to zero and the index MUST NOT commit
    val vIdxBefore = ManifestTable.currentVersion(idx)
    val v3 = ManifestTable.merge(docsDf(11L -> 14), corpus, Seq("doc_id"))
    ReencodeIndex.refresh(spark, corpus, idx, v2, v3)
    assert(ManifestTable.currentVersion(idx) == vIdxBefore,
      "an unchanged-clip update wrote the index")
    assertReencSnapshot(corpus, idx, "after v3 no-op update")

    // v4: delete doc 20 → its band rows tombstone
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 20L)
        .localCheckpoint(), corpus)
    ReencodeIndex.refresh(spark, corpus, idx, v3, v4)
    assertReencSnapshot(corpus, idx, "after v4 delete")
    assert(!reencSet(idx).map(_._2).contains(20L), "deleted media still live")

    // replay / overlap: no double-apply, no new version
    val vI = ManifestTable.currentVersion(idx)
    val before = reencSet(idx)
    ReencodeIndex.refresh(spark, corpus, idx, 0, v4)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(reencSet(idx) == before, "rows changed on replay")
  }

  // ------------------------------------------------ gain windows

  private def gwinSet(idx: String): Set[(Long, Long, Long, String)] =
    GainWindowIndex.readGainWindowIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet

  private def assertGwinSnapshot(corpus: String, idx: String,
      clue: String): Unit = {
    val expected = GainWindowIndex.computeGainWindowIndex(nCharsOf(corpus))
      .select(col("sfp"), col("media_id"), col("w"), col("efp")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(gwinSet(idx) == expected, s"gain-window index drifted: $clue")
  }

  test("gain-window index: maintained ≡ recomputed across insert / update / " +
    "delete; a text-length update never changes the PCM (rate header only) " +
    "and commits NOTHING; replay is rejected") {
    val work = Files.createTempDirectory("graft-gwinidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/gwin")

    // gid=1 pair (docs 4 gain×1, 7 gain×2 — the planted gain dup),
    // gid=4 singleton (doc 16), doc 6 carries no audio
    val v1 = ManifestTable.merge(
      docsDf(4L -> 10, 7L -> 12, 16L -> 9, 6L -> 8), corpus, Seq("doc_id"))
    GainWindowIndex.refresh(spark, corpus, idx, 0, v1)
    assertGwinSnapshot(corpus, idx, "after v1")
    val rows1 = gwinSet(idx)
    assert(rows1.map(_._2) == Set(4L, 7L, 16L), "media ids in index")
    // the planted pair: 4 and 7 share every sign fingerprint but NO
    // exact md5 (the in-row blindness witness the reads report)
    val byId = rows1.groupBy(_._2)
    assert(byId(4L).map(t => (t._1, t._3)) == byId(7L).map(t => (t._1, t._3)),
      "gain siblings must share all (sfp, w)")
    assert(byId(4L).map(_._4).intersect(byId(7L).map(_._4)).isEmpty,
      "gain siblings must share NO exact window md5")

    // v2: new audio doc 19 (gid=4 sibling of 16, gain ×2)
    val v2 = ManifestTable.merge(docsDf(19L -> 11), corpus, Seq("doc_id"))
    GainWindowIndex.refresh(spark, corpus, idx, v1, v2)
    assertGwinSnapshot(corpus, idx, "after v2 insert")

    // v3: doc 4's text changes length — PCM identical (only the WAV
    // rate header moves, and windows read samples) → no index commit
    val vIdxBefore = ManifestTable.currentVersion(idx)
    val v3 = ManifestTable.merge(docsDf(4L -> 23), corpus, Seq("doc_id"))
    GainWindowIndex.refresh(spark, corpus, idx, v2, v3)
    assert(ManifestTable.currentVersion(idx) == vIdxBefore,
      "an unchanged-PCM update wrote the index")
    assertGwinSnapshot(corpus, idx, "after v3 no-op update")

    // v4: delete doc 7 → its window rows tombstone
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 7L)
        .localCheckpoint(), corpus)
    GainWindowIndex.refresh(spark, corpus, idx, v3, v4)
    assertGwinSnapshot(corpus, idx, "after v4 delete")
    assert(!gwinSet(idx).map(_._2).contains(7L), "deleted media still live")

    // replay
    val vI = ManifestTable.currentVersion(idx)
    val before = gwinSet(idx)
    GainWindowIndex.refresh(spark, corpus, idx, 0, v4)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(gwinSet(idx) == before, "rows changed on replay")
  }

  // ------------------------------------------------ turnkey streams

  test("turnkey startMaintenance keeps both robust tables equal to the " +
    "corpus across commits and a checkpoint restart") {
    val work = Files.createTempDirectory("graft-robust-turnkey").toString
    val (corpus, reenc, gwin) = (s"$work/corpus", s"$work/reenc", s"$work/gwin")
    ManifestTable.merge(docsDf(8L -> 10, 11L -> 10, 4L -> 10, 7L -> 12),
      corpus, Seq("doc_id"))
    val q1 = ReencodeIndex.startMaintenance(spark, corpus, reenc, s"$work/ck1")
    val q2 = GainWindowIndex.startMaintenance(spark, corpus, gwin, s"$work/ck2")
    q1.processAllAvailable(); q2.processAllAvailable()
    assertReencSnapshot(corpus, reenc, "turnkey bootstrap")
    assertGwinSnapshot(corpus, gwin, "turnkey bootstrap")
    ManifestTable.merge(docsDf(20L -> 13, 8L -> 11, 16L -> 9),
      corpus, Seq("doc_id"))
    q1.processAllAvailable(); q2.processAllAvailable()
    assertReencSnapshot(corpus, reenc, "turnkey incremental commit")
    assertGwinSnapshot(corpus, gwin, "turnkey incremental commit")
    q1.stop(); q2.stop()
    // offline commit + restart from the same checkpoints
    ManifestTable.merge(docsDf(23L -> 13, 19L -> 11), corpus, Seq("doc_id"))
    val q1b = ReencodeIndex.startMaintenance(spark, corpus, reenc, s"$work/ck1")
    val q2b = GainWindowIndex.startMaintenance(spark, corpus, gwin, s"$work/ck2")
    q1b.processAllAvailable(); q2b.processAllAvailable()
    q1b.stop(); q2b.stop()
    assertReencSnapshot(corpus, reenc, "turnkey restart")
    assertGwinSnapshot(corpus, gwin, "turnkey restart")
  }

  // ------------------------------------------------ read faces

  test("the four read faces equal brute-force recomputes over the " +
    "committed corpus (q191–q194 read stored rows, never re-decode)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-robust-reads").toString
    val (corpus, reenc, gwin) = (s"$work/corpus", s"$work/reenc", s"$work/gwin")
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    ReencodeIndex.refresh(spark, corpus, reenc, 0, v1)
    GainWindowIndex.refresh(spark, corpus, gwin, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    ReencodeIndex.refresh(spark, corpus, reenc, v1, v2)
    GainWindowIndex.refresh(spark, corpus, gwin, v1, v2)
    val snap = nCharsOf(corpus)
    val batch = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").where($"doc_id" % 10 === 9)

    // ---- re-encode: brute = all keyframe pairs at Hamming ≤ 3 (a pair
    // within 3 bits ALWAYS shares a band by pigeonhole, and sf0.001
    // stays under the hot-band cap, so banding loses nothing)
    def kf(docs: DataFrame) = ReencodeIndex.bandFacts(docs)
      .select($"media_id", $"fp", $"hi", $"lo").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def ham(a: (Long, String, Long, Long), b: (Long, String, Long, Long)): Int =
      java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)
    val cf = kf(snap)
    val expDupTuples = (for {
      a <- cf; b <- cf if a._1 < b._1 && ham(a, b) <= 3
    } yield (a._1, b._1, a._2, b._2, ham(a, b))).toSet
    val expDups = expDupTuples.groupBy(t => (t._1, t._2)).map { case (k, ts) =>
      (k._1, k._2, ts.map(_._3).size,
        ts.filter(t => t._3 == t._4).map(_._3).size, ts.map(_._5).max.toLong)
    }.toSet
    val gotDups = ReencodeIndex.maintainedReencodedDups(spark, reenc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt,
        r.getLong(3).toInt, r.getLong(4))).toSet
    assert(gotDups == expDups, "maintained re-encode report drifted")
    assert(gotDups.exists(t => t._4 == 0),
      "fixture must plant a pair the exact family is blind to")

    val pf = kf(batch)
    val expProbe = (for {
      p <- pf; c <- cf if ham(p, c) <= 3
    } yield (p._1, c._1, p._2, ham(p, c)))
      .groupBy(t => (t._1, t._2)).map { case (k, ts) =>
        (k._1, k._2, ts.map(_._3).toSet.size, ts.map(_._4).max.toLong)
      }.toSet
    val gotProbe = ReencodeIndex.probeReencodes(batch, spark, reenc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt, r.getLong(3)))
      .toSet
    assert(gotProbe == expProbe, "re-encode probe drifted")

    // ---- gain: brute = window rows joined on sfp, ≥ 4 gate
    def wins(docs: DataFrame) = GainWindowIndex.windows(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val cw = wins(snap)
    val expGain = (for {
      a <- cw; b <- cw if a._1 == b._1 && a._2 < b._2
    } yield (a._2, b._2, a._3 - b._3, if (a._4 == b._4) 1 else 0))
      .groupBy(t => (t._1, t._2)).collect {
        case (k, ts) if ts.size >= 4 =>
          (k._1, k._2, ts.size, ts.map(_._4).sum,
            ts.map(-_._3).min, ts.map(_._3).toSet.size)
      }.toSet
    val gotGain = GainWindowIndex.maintainedGainDups(spark, gwin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt,
        r.getLong(3).toInt, r.getLong(4), r.getLong(5).toInt)).toSet
    assert(gotGain == expGain, "maintained gain report drifted")
    assert(gotGain.nonEmpty && gotGain.forall(_._4 == 0),
      "every planted gain pair must be exact-family-blind")

    val pw = wins(batch)
    val expGProbe = (for {
      p <- pw; c <- cw if p._1 == c._1
    } yield (p._2, c._2, c._3 - p._3, if (p._4 == c._4) 1 else 0))
      .groupBy(t => (t._1, t._2)).collect {
        case (k, ts) if ts.size >= 4 =>
          (k._1, k._2, ts.size, ts.map(_._4).sum, ts.map(_._3).min)
      }.toSet
    val gotGProbe = GainWindowIndex.probeGains(batch, spark, gwin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt,
        r.getLong(3).toInt, r.getLong(4))).toSet
    assert(gotGProbe == expGProbe, "gain probe drifted")
  }
}
