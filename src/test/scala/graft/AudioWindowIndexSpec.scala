package graft

import graft.sources.{AudioWindowIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained audio window-fingerprint index lifecycle (VERDICT r16
  * #2 — protocol parity with [[graft.sources.ModalityIndex]]): exact
  * (fp → media_id, w) window rows kept current from corpus CDC —
  * arrivals re-window and add live rows, retractions tombstone the
  * preimage's rows, an update that leaves a clip's PCM unchanged nets
  * to zero and commits nothing — with maintained ≡ recomputed as the
  * gate everywhere, plus replay rejection, a turnkey stream with
  * checkpoint restart, and the two read faces (trimmed-dup report,
  * arriving-batch trim probe) checked against from-scratch brute
  * recomputes. */
class AudioWindowIndexSpec extends SparkSpec {

  // n_chars = length(text); trimmed-audio clips come from doc_id % 3
  // == 1 docs, PCM keyed by gid = doc_id / 4 and off = (doc_id % 4)·96
  // ALONE — n_chars reaches only the WAV header's sample rate, so a
  // text-length update never changes a clip's windows
  private def docsDf(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, n) => (id, "x" * n) }.toDF("doc_id", "text")
  }

  private def idxSet(idx: String): Set[(String, Long, Long)] =
    AudioWindowIndex.readAudioWindowIndex(spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def assertMatchesSnapshot(corpus: String, idx: String,
      clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val expected = AudioWindowIndex.computeAudioWindowIndex(snap)
      .select(col("fp"), col("media_id"), col("w")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(idxSet(idx) == expected, s"audio window index drifted: $clue")
  }

  test("maintained window rows equal recomputed across insert / update / " +
    "delete commits; an update that leaves the PCM unchanged commits " +
    "NOTHING (windows key off gid+off, not n_chars); replay is rejected") {
    val work = Files.createTempDirectory("graft-awinidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/awin")

    // audio docs 4 and 7 share gid=1 at offsets 0 and 288 (a planted
    // trim pair); 13 is an unrelated gid; 0 and 5 carry no audio
    val v1 = ManifestTable.merge(
      docsDf(0L -> 10, 4L -> 12, 5L -> 9, 7L -> 20, 13L -> 8),
      corpus, Seq("doc_id"))
    AudioWindowIndex.refresh(spark, corpus, idx, 0, v1)
    assertMatchesSnapshot(corpus, idx, "after v1")
    val rows1 = idxSet(idx)
    assert(rows1.map(_._2) == Set(4L, 7L, 13L), "media ids in index")
    assert(rows1.size == 3 * 23, "23 hop-32 windows per 768-sample clip")
    // the planted trim: 4 (off 0) and 7 (off 288 = 9 hops) share every
    // fully-overlapped window at a constant lag of 9
    val by4 = rows1.filter(_._2 == 4L).map(t => t._1 -> t._3).toMap
    // keep the (w7, lag) pair — a bare Set of lags would collapse to one
    val shared = rows1.filter(_._2 == 7L)
      .flatMap(t => by4.get(t._1).map(w4 => (t._3, w4 - t._3)))
    assert(shared.size == 23 - 9, "trim overlap window count")
    assert(shared.map(_._2) == Set(9L), "recovered lag must be the planted 9 hops")

    // v2: update doc 4's n_chars — sample RATE changes, samples do not
    // -> the delta nets to zero and the INDEX MUST NOT COMMIT
    val vIdxBefore = ManifestTable.currentVersion(idx)
    val v2 = ManifestTable.merge(docsDf(4L -> 15), corpus, Seq("doc_id"))
    AudioWindowIndex.refresh(spark, corpus, idx, v1, v2)
    assert(ManifestTable.currentVersion(idx) == vIdxBefore,
      "an unchanged-PCM update wrote the index")
    assertMatchesSnapshot(corpus, idx, "after v2 no-op update")

    // v3: a brand-new clip arrives (gid 4) + delete clip 13 -> its 23
    // window rows tombstone in the same roll-forward
    val v3a = ManifestTable.merge(docsDf(16L -> 7), corpus, Seq("doc_id"))
    val v3 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 13L)
        .localCheckpoint(), corpus)
    AudioWindowIndex.refresh(spark, corpus, idx, v2, v3)
    assertMatchesSnapshot(corpus, idx, "after v3 insert+delete")
    assert(!idxSet(idx).map(_._2).contains(13L), "deleted media still live")
    assert(idxSet(idx).map(_._2).contains(16L), "arrived media missing")
    assert(v3a == v3 - 1)

    // replay / overlap: no double-apply, no new version
    val vI = ManifestTable.currentVersion(idx)
    val before = idxSet(idx)
    AudioWindowIndex.refresh(spark, corpus, idx, 0, v3)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(idxSet(idx) == before, "rows changed on replay")
  }

  test("turnkey startMaintenance keeps the window table equal to the corpus " +
    "across commits and a checkpoint restart") {
    val work = Files.createTempDirectory("graft-awinidx-turnkey").toString
    val (corpus, idx, ckpt) = (s"$work/corpus", s"$work/awin", s"$work/ckpt")
    ManifestTable.merge(docsDf(4L -> 12, 7L -> 20), corpus, Seq("doc_id"))
    val q = AudioWindowIndex.startMaintenance(spark, corpus, idx, ckpt)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey bootstrap")
    ManifestTable.merge(docsDf(13L -> 8, 4L -> 26), corpus, Seq("doc_id"))
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey incremental commit")
    q.stop()
    // offline commit + restart from the same checkpoint
    ManifestTable.merge(docsDf(16L -> 7), corpus, Seq("doc_id"))
    val q2 = AudioWindowIndex.startMaintenance(spark, corpus, idx, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assertMatchesSnapshot(corpus, idx, "turnkey restart")
  }

  test("maintainedTrimmedDups and probeTrims equal brute-force recomputes " +
    "over the committed corpus (the q183/q184 answers read stored window " +
    "rows instead of re-decoding the audio corpus)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-awinidx2").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/awin")
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    AudioWindowIndex.refresh(spark, corpus, idx, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    AudioWindowIndex.refresh(spark, corpus, idx, v1, v2)

    // brute ground truth from a from-scratch re-window of the snapshot,
    // pair aggregation in driver memory (tiny at sf0.001)
    val snap = ManifestTable.read(spark, corpus)
      .select($"doc_id", length($"text").cast("long").as("n_chars"))
    val wins = AudioWindowIndex.windows(snap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def pairStats(a: Seq[(String, Long, Long)], b: Seq[(String, Long, Long)],
        strict: Boolean): Set[(Long, Long, Long, Long)] =
      (for {
        x <- a; y <- b
        if x._1 == y._1 && (if (strict) x._2 < y._2 else true)
      } yield ((x._2, y._2), y._3 - x._3))
        .groupBy(_._1).view
        .filter(_._2.size >= AudioWindowIndex.MinSharedWindows)
        .map { case ((ia, ib), offs) =>
          (ia, ib, offs.size.toLong, offs.map(_._2).min) }.toSet
    val expDups = pairStats(wins.toSeq, wins.toSeq, strict = true)
    val gotDups = AudioWindowIndex.maintainedTrimmedDups(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotDups == expDups, "maintained trim report drifted from brute force")
    assert(gotDups.nonEmpty, "fixture should plant at least one trim pair")

    // probe: held-out batch windows against the index vs brute cross-join
    val batch = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").where($"doc_id" % 10 === 9)
    val bwins = AudioWindowIndex.windows(batch).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expProbe = pairStats(bwins.toSeq, wins.toSeq, strict = false)
    val gotProbe = AudioWindowIndex.probeTrims(batch, spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotProbe == expProbe, "trim probe drifted from brute force")
  }
}
