package graft

import graft.sources.{AudioWindowIndex, GainWindowIndex, ManifestTable, ModalityIndex, ReencodeIndex, SceneIndex}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GC contract for the MEDIA maintained indexes (VERDICT r16 stretch #8):
  * ModalityIndex / AudioWindowIndex / SceneIndex — and the round-17
  * robust faces ReencodeIndex / GainWindowIndex — inherit
  * ManifestTable's compact + vacuum, but until now no test exercised
  * small-file maintenance on a MAINTAINED modality table — the index
  * count hit twelve with the GC path proven only on the generic
  * fixture. This spec rolls
  * each index through fragmenting CDC commits, compacts, vacuums with
  * keepVersions = 1, and then keeps MAINTAINING: the claim is not just
  * "reads survive GC" but "the exactly-once protocol and maintained ≡
  * recomputed survive GC". */
class IndexGcSpec extends SparkSpec {

  private def docsDf(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, n) => (id, "x" * n) }.toDF("doc_id", "text")
  }

  private def dataFiles(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(root, "data")
    if (!Files.exists(d)) Set.empty
    else {
      val s = Files.walk(d)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).map(_.toString).toSet
      finally s.close()
    }
  }

  test("compact + vacuum on the five media indexes preserve every read " +
    "face, drop superseded fragments, and do not break subsequent " +
    "exactly-once maintenance") {
    val work = Files.createTempDirectory("graft-idxgc").toString
    val corpus = s"$work/corpus"
    val (media, awin, scene) = (s"$work/media", s"$work/awin", s"$work/scene")
    val (reenc, gwin) = (s"$work/reenc", s"$work/gwin")

    // four commits: every commit touches all three modalities (image
    // 0 mod 3, audio 1 mod 3, video 2 mod 3 — docs 8/11/20/23 also
    // land in the re-encode family: gid ≡ 2 mod 3), fragmenting the
    // hot buckets with one small file set per commit
    val commits = Seq(
      docsDf(0L -> 10, 4L -> 12, 2L -> 10),
      docsDf(3L -> 11, 7L -> 20, 8L -> 9),
      docsDf(6L -> 25, 13L -> 8, 11L -> 12),
      docsDf(9L -> 14, 16L -> 7, 23L -> 7))
    commits.foreach(ManifestTable.merge(_, corpus, Seq("doc_id")))
    val vc = ManifestTable.currentVersion(corpus)
    ModalityIndex.refresh(spark, corpus, media, 0, vc)
    AudioWindowIndex.refresh(spark, corpus, awin, 0, vc)
    SceneIndex.refresh(spark, corpus, scene, 0, vc)
    ReencodeIndex.refresh(spark, corpus, reenc, 0, vc)
    GainWindowIndex.refresh(spark, corpus, gwin, 0, vc)

    def reads(): Seq[Set[org.apache.spark.sql.Row]] = Seq(
      ModalityIndex.readModalityIndex(spark, media).collect().toSet,
      AudioWindowIndex.readAudioWindowIndex(spark, awin).collect().toSet,
      SceneIndex.readSceneIndex(spark, scene).collect().toSet,
      ReencodeIndex.readReencodeIndex(spark, reenc).collect().toSet,
      GainWindowIndex.readGainWindowIndex(spark, gwin).collect().toSet)
    val before = reads()
    val filesBefore = Seq(media, awin, scene, reenc, gwin).map(dataFiles)
    assert(filesBefore.forall(_.size >= 2),
      "fixture should fragment each index across commits")

    // compact every index on its bucket column, then age out the
    // superseded versions (grace 0: no concurrent writer in a test)
    Seq(media, awin, scene, reenc, gwin).foreach { r =>
      ManifestTable.compact(spark, r, "bucket")
      ManifestTable.vacuum(r, keepVersions = 1, orphanGraceMs = 0L)
    }
    assert(reads() == before, "a read face changed across compact+vacuum")
    val filesAfter = Seq(media, awin, scene, reenc, gwin).map(dataFiles)
    filesBefore.zip(filesAfter).foreach { case (b, a) =>
      assert(a.size < b.size,
        s"GC freed nothing (${b.size} -> ${a.size} files)")
    }

    // maintenance continues AFTER GC: a fifth commit (update + insert +
    // delete across modalities) must land exactly-once and keep
    // maintained == recomputed
    ManifestTable.merge(docsDf(3L -> 26, 12L -> 10, 17L -> 13), corpus, Seq("doc_id"))
    val v6 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 4L)
        .localCheckpoint(), corpus)
    ModalityIndex.refresh(spark, corpus, media, vc, v6)
    AudioWindowIndex.refresh(spark, corpus, awin, vc, v6)
    SceneIndex.refresh(spark, corpus, scene, vc, v6)
    ReencodeIndex.refresh(spark, corpus, reenc, vc, v6)
    GainWindowIndex.refresh(spark, corpus, gwin, vc, v6)
    val snap = ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val expMedia = ModalityIndex.computeModalityIndex(snap)
      .select(col("bk"), col("media_id"), col("hi"), col("lo")).collect().toSet
    val gotMedia = ManifestTable.read(spark, media).where(col("alive"))
      .select(col("bk"), col("media_id"), col("hi"), col("lo")).collect().toSet
    assert(gotMedia == expMedia, "modality index drifted after GC")
    val expAwin = AudioWindowIndex.computeAudioWindowIndex(snap)
      .select(col("fp"), col("media_id"), col("w")).collect().toSet
    val gotAwin = ManifestTable.read(spark, awin).where(col("alive"))
      .select(col("fp"), col("media_id"), col("w")).collect().toSet
    assert(gotAwin == expAwin, "audio window index drifted after GC")
    val expScene = SceneIndex.computeSceneIndex(snap)
      .select(col("fp"), col("media_id"), col("sc")).collect().toSet
    val gotScene = ManifestTable.read(spark, scene).where(col("alive"))
      .select(col("fp"), col("media_id"), col("sc")).collect().toSet
    assert(gotScene == expScene, "scene index drifted after GC")
    val expReenc = ReencodeIndex.computeReencodeIndex(snap)
      .select(col("bk"), col("media_id"), col("sc"), col("fp"),
        col("hi"), col("lo")).collect().toSet
    val gotReenc = ManifestTable.read(spark, reenc).where(col("alive"))
      .select(col("bk"), col("media_id"), col("sc"), col("fp"),
        col("hi"), col("lo")).collect().toSet
    assert(gotReenc == expReenc, "re-encode index drifted after GC")
    val expGwin = GainWindowIndex.computeGainWindowIndex(snap)
      .select(col("sfp"), col("media_id"), col("w"), col("efp")).collect().toSet
    val gotGwin = ManifestTable.read(spark, gwin).where(col("alive"))
      .select(col("sfp"), col("media_id"), col("w"), col("efp")).collect().toSet
    assert(gotGwin == expGwin, "gain-window index drifted after GC")
  }

}
