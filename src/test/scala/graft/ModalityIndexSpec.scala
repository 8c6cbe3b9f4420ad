package graft

import graft.sources.{ManifestTable, ModalityIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained modality-fingerprint index lifecycle: banded
  * (bk → media_id, hi, lo) rows kept current from corpus CDC — arrivals
  * decode and add live rows, retractions tombstone the preimage's rows,
  * an update that leaves a doc's media unchanged nets to zero and
  * commits nothing — with maintained ≡ recomputed as the gate
  * everywhere, plus replay rejection and the two read faces (corpus
  * dedup report, arriving-batch probe) checked against from-scratch
  * brute recomputes. */
class ModalityIndexSpec extends SparkSpec {

  // n_chars = length(text) drives the media generators: doc_id % 3 == 0
  // docs carry images (dims from n_chars), % 3 == 1 docs carry audio
  // (PCM from gid = doc_id / 4 only), % 3 == 2 docs carry nothing
  private def docsDf(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, n) => (id, "x" * n) }.toDF("doc_id", "text")
  }

  private def idxSet(idx: String): Set[(Long, Long, Long, Long)] =
    ModalityIndex.readModalityIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def assertMatchesSnapshot(corpus: String, idx: String,
      clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val expected = ModalityIndex.computeModalityIndex(snap)
      .select(col("bk"), col("media_id"), col("hi"), col("lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(idxSet(idx) == expected, s"modality index drifted: $clue")
  }

  test("maintained band rows equal recomputed across insert / update / " +
    "delete commits; an update that leaves the media unchanged commits " +
    "NOTHING (audio PCM keys off gid, not n_chars); replay is rejected") {
    val work = Files.createTempDirectory("graft-modidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/media")

    // images 0 and 3; audio 4 and 7 (same quad gid=1 -> identical PCM,
    // a planted Hamming-0 dup); 5 carries no media at all
    val v1 = ManifestTable.merge(
      docsDf(0L -> 10, 3L -> 10, 4L -> 12, 5L -> 9, 7L -> 20),
      corpus, Seq("doc_id"))
    ModalityIndex.refresh(spark, corpus, idx, 0, v1)
    assertMatchesSnapshot(corpus, idx, "after v1")
    val rows1 = idxSet(idx)
    assert(rows1.map(_._2) == Set(0L, 3L, 4L, 7L), "media ids in index")
    assert(rows1.size == 16, "4 band rows per media")
    // the planted audio dup: docs 4 and 7 share every band row's (bk)
    val byId = rows1.groupBy(_._2)
    assert(byId(4L).map(t => (t._1, t._3, t._4)) ==
      byId(7L).map(t => (t._1, t._3, t._4)), "quad siblings must collide")

    // v2: update doc 3's n_chars (new dims -> new fingerprint: old band
    // rows retract, new ones arrive) + a brand-new image doc 6
    val v2 = ManifestTable.merge(docsDf(3L -> 11, 6L -> 25), corpus, Seq("doc_id"))
    ModalityIndex.refresh(spark, corpus, idx, v1, v2)
    assertMatchesSnapshot(corpus, idx, "after v2 update")

    // v3: doc 4's text changes length but its PCM does not (audio
    // content keys off gid alone) -> the delta nets to zero and the
    // INDEX MUST NOT COMMIT A VERSION
    val vIdxBefore = ManifestTable.currentVersion(idx)
    val v3 = ManifestTable.merge(docsDf(4L -> 15), corpus, Seq("doc_id"))
    ModalityIndex.refresh(spark, corpus, idx, v2, v3)
    assert(ManifestTable.currentVersion(idx) == vIdxBefore,
      "an unchanged-media update wrote the index")
    assertMatchesSnapshot(corpus, idx, "after v3 no-op update")

    // v4: delete image doc 0 -> its 4 band rows tombstone
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 0L)
        .localCheckpoint(), corpus)
    ModalityIndex.refresh(spark, corpus, idx, v3, v4)
    assertMatchesSnapshot(corpus, idx, "after v4 delete")
    assert(!idxSet(idx).map(_._2).contains(0L), "deleted media still live")

    // replay / overlap: no double-apply, no new version
    val vI = ManifestTable.currentVersion(idx)
    val before = idxSet(idx)
    ModalityIndex.refresh(spark, corpus, idx, 0, v4)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(idxSet(idx) == before, "rows changed on replay")
  }

  test("turnkey startMaintenance keeps the band table equal to the corpus " +
    "across commits and a checkpoint restart (the cross-index protocol " +
    "holds on the modality family too)") {
    val work = Files.createTempDirectory("graft-modidx-turnkey").toString
    val (corpus, idx, ckpt) = (s"$work/corpus", s"$work/media", s"$work/ckpt")
    ManifestTable.merge(docsDf(0L -> 10, 4L -> 12, 7L -> 20), corpus, Seq("doc_id"))
    val q = ModalityIndex.startMaintenance(spark, corpus, idx, ckpt)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey bootstrap")
    ManifestTable.merge(docsDf(3L -> 11, 0L -> 26), corpus, Seq("doc_id"))
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey incremental commit")
    q.stop()
    // offline commit + restart from the same checkpoint
    ManifestTable.merge(docsDf(6L -> 25), corpus, Seq("doc_id"))
    val q2 = ModalityIndex.startMaintenance(spark, corpus, idx, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assertMatchesSnapshot(corpus, idx, "turnkey restart")
  }

  test("maintainedModalityDups and probeModality equal brute-force " +
    "recomputes over the committed corpus (the q178/q179 answers read " +
    "stored band rows instead of re-decoding the media corpus)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-modidx2").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/media")
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    ModalityIndex.refresh(spark, corpus, idx, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    ModalityIndex.refresh(spark, corpus, idx, v1, v2)

    // brute ground truth: every fingerprint from a from-scratch decode
    // of the committed snapshot, all-pairs popcount in driver memory
    // (tiny at sf0.001) — no banding, no index
    val snap = ManifestTable.read(spark, corpus)
      .select($"doc_id", length($"text").cast("long").as("n_chars"))
    val fps = ModalityIndex.fingerprints(snap).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def ham(a: (Int, Long, Long, Long), b: (Int, Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)
    val expDups = (for {
      a <- fps; b <- fps
      if a._1 == b._1 && a._2 < b._2 && ham(a, b) <= 3
    } yield (if (a._1 == 1) "audio" else "image", a._2, b._2, ham(a, b))).toSet
    val gotDups = ModalityIndex.maintainedModalityDups(spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(gotDups == expDups, "maintained dup report drifted from brute force")
    assert(gotDups.nonEmpty, "fixture should plant at least one dup")

    // probe: the held-out batch against the index vs brute cross-pairs
    val batch = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").where($"doc_id" % 10 === 9)
    val bfps = ModalityIndex.fingerprints(batch).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expProbe = (for {
      p <- bfps; c <- fps
      if p._1 == c._1 && ham(p, c) <= 3
    } yield (if (p._1 == 1) "audio" else "image", p._2, c._2, ham(p, c))).toSet
    val gotProbe = ModalityIndex.probeModality(batch, spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(gotProbe == expProbe, "modality probe drifted from brute force")
  }
}
