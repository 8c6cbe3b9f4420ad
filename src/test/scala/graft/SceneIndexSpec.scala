package graft

import graft.sources.{ManifestTable, SceneIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained video scene-keyframe index lifecycle (VERDICT r16 #3):
  * exact (fp → media_id, sc) keyframe facts kept current from corpus
  * CDC — arrivals decode and keyframe-select only their own videos, a
  * lengthened clip ADDS its new scene's row while the kept scenes net
  * to zero, an update that leaves the frame schedule unchanged commits
  * nothing, deletions tombstone — with maintained ≡ recomputed as the
  * gate everywhere, plus replay rejection, a turnkey stream with
  * checkpoint restart, and the two read faces (scene-dup report,
  * footage probe) checked against from-scratch brute recomputes. */
class SceneIndexSpec extends SparkSpec {

  // n_chars = length(text); videos come from doc_id % 3 == 2 docs with
  // gid = doc_id / 4 keying the pixel content and k = n_chars % 4 + 4
  // the frame count: scenes {0, 1} always, scene 2 iff k >= 5 — so
  // n_chars changes that keep k keep the scene set, and k crossing 5
  // adds/drops exactly scene 2's row
  private def docsDf(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, n) => (id, "x" * n) }.toDF("doc_id", "text")
  }

  private def idxSet(idx: String): Set[(String, Long)] =
    SceneIndex.readSceneIndex(spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  private def assertMatchesSnapshot(corpus: String, idx: String,
      clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val expected = SceneIndex.computeSceneIndex(snap)
      .select(col("fp"), col("media_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(idxSet(idx) == expected, s"scene index drifted: $clue")
  }

  test("maintained scene rows equal recomputed across insert / update / " +
    "delete commits; a lengthened clip adds ONLY its new scene; an update " +
    "that keeps the schedule commits NOTHING; replay is rejected") {
    val work = Files.createTempDirectory("graft-sceneidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/scene")

    // videos: 2 (gid 0, k=6 -> scenes 0,1,2), 8 (gid 2, k=5 -> 0,1,2),
    // 11 (gid 2, k=4 -> 0,1) — 8 and 11 share gid 2, so their scene
    // fingerprints coincide on scenes 0 and 1; 0 and 1 carry no video
    val v1 = ManifestTable.merge(
      docsDf(0L -> 10, 1L -> 7, 2L -> 10, 8L -> 9, 11L -> 12),
      corpus, Seq("doc_id"))
    SceneIndex.refresh(spark, corpus, idx, 0, v1)
    assertMatchesSnapshot(corpus, idx, "after v1")
    val rows1 = idxSet(idx)
    assert(rows1.map(_._2) == Set(2L, 8L, 11L), "media ids in index")
    assert(rows1.count(_._2 == 2L) == 3 && rows1.count(_._2 == 8L) == 3 &&
      rows1.count(_._2 == 11L) == 2, "scene counts per clip")
    // the planted share: 11's two scenes are a subset of 8's three
    val fp8 = rows1.filter(_._2 == 8L).map(_._1)
    val fp11 = rows1.filter(_._2 == 11L).map(_._1)
    assert(fp11.subsetOf(fp8), "quad siblings must share scenes 0 and 1")

    // v2: lengthen 11 so k crosses 5 (12 -> 13 chars): scene 2 ARRIVES,
    // scenes 0/1 net to zero (kept, not rewritten)
    val v2 = ManifestTable.merge(docsDf(11L -> 13), corpus, Seq("doc_id"))
    SceneIndex.refresh(spark, corpus, idx, v1, v2)
    assertMatchesSnapshot(corpus, idx, "after v2 lengthen")
    assert(idxSet(idx).count(_._2 == 11L) == 3, "scene 2 must arrive")
    assert(idxSet(idx).filter(_._2 == 11L).map(_._1) ==
      idxSet(idx).filter(_._2 == 8L).map(_._1),
      "gid siblings at the same k share ALL scenes")

    // v3: n_chars change that keeps k (9 -> 13: both k=5) -> the delta
    // nets to zero and the INDEX MUST NOT COMMIT
    val vIdxBefore = ManifestTable.currentVersion(idx)
    val v3 = ManifestTable.merge(docsDf(8L -> 13), corpus, Seq("doc_id"))
    SceneIndex.refresh(spark, corpus, idx, v2, v3)
    assert(ManifestTable.currentVersion(idx) == vIdxBefore,
      "an unchanged-schedule update wrote the index")
    assertMatchesSnapshot(corpus, idx, "after v3 no-op update")

    // v4: delete video 2 -> its 3 scene rows tombstone
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 2L)
        .localCheckpoint(), corpus)
    SceneIndex.refresh(spark, corpus, idx, v3, v4)
    assertMatchesSnapshot(corpus, idx, "after v4 delete")
    assert(!idxSet(idx).map(_._2).contains(2L), "deleted media still live")

    // replay / overlap: no double-apply, no new version
    val vI = ManifestTable.currentVersion(idx)
    val before = idxSet(idx)
    SceneIndex.refresh(spark, corpus, idx, 0, v4)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(idxSet(idx) == before, "rows changed on replay")
  }

  test("turnkey startMaintenance keeps the scene table equal to the corpus " +
    "across commits and a checkpoint restart") {
    val work = Files.createTempDirectory("graft-sceneidx-turnkey").toString
    val (corpus, idx, ckpt) = (s"$work/corpus", s"$work/scene", s"$work/ckpt")
    ManifestTable.merge(docsDf(2L -> 10, 8L -> 9), corpus, Seq("doc_id"))
    val q = SceneIndex.startMaintenance(spark, corpus, idx, ckpt)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey bootstrap")
    ManifestTable.merge(docsDf(11L -> 12, 2L -> 27), corpus, Seq("doc_id"))
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey incremental commit")
    q.stop()
    // offline commit + restart from the same checkpoint
    ManifestTable.merge(docsDf(14L -> 7), corpus, Seq("doc_id"))
    val q2 = SceneIndex.startMaintenance(spark, corpus, idx, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assertMatchesSnapshot(corpus, idx, "turnkey restart")
  }

  test("maintainedSceneDups and probeScenes equal brute-force recomputes " +
    "over the committed corpus (the q187/q188 answers read stored scene " +
    "rows instead of re-decoding the video corpus)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-sceneidx2").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/scene")
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    SceneIndex.refresh(spark, corpus, idx, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    SceneIndex.refresh(spark, corpus, idx, v1, v2)

    // brute ground truth: from-scratch decode + keyframe-select of the
    // committed snapshot, pair aggregation in driver memory
    val snap = ManifestTable.read(spark, corpus)
      .select($"doc_id", length($"text").cast("long").as("n_chars"))
    val sc = SceneIndex.scenes(snap).collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    def pairCounts(a: Seq[(String, Long)], b: Seq[(String, Long)],
        strict: Boolean): Set[(Long, Long, Long)] =
      (for {
        x <- a; y <- b
        if x._1 == y._1 && (if (strict) x._2 < y._2 else true)
      } yield ((x._2, y._2), x._1))
        .groupBy(_._1).view
        .map { case ((ia, ib), fps) =>
          (ia, ib, fps.map(_._2).distinct.size.toLong) }.toSet
    val expDups = pairCounts(sc.toSeq, sc.toSeq, strict = true)
    val gotDups = SceneIndex.maintainedSceneDups(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotDups == expDups, "maintained scene report drifted from brute force")
    assert(gotDups.nonEmpty, "fixture should plant at least one scene pair")

    // probe: held-out batch scenes against the index vs brute cross-join
    val batch = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").where($"doc_id" % 10 === 9)
    val bsc = SceneIndex.scenes(batch).collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val expProbe = pairCounts(bsc.toSeq, sc.toSeq, strict = false)
    val gotProbe = SceneIndex.probeScenes(batch, spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotProbe == expProbe, "scene probe drifted from brute force")
  }
}
