package graft

import graft.sources.{AudioWindowIndex, CrossModalIndex, DedupIndex,
  GainWindowIndex, ManifestTable, ModalityIndex, ReencodeIndex, SceneIndex,
  SpanIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composition shape nothing else drives (VERDICT r18 #4):
  * production runs EIGHT turnkey maintenance streams against ONE corpus
  * SIMULTANEOUSLY — not the demo's sequential `refresh()` round-robin —
  * so checkpoint scopes and txn-tag spaces must isolate under REAL
  * interleaving: eight independent CDC readers of the same manifest,
  * eight foreachBatch appliers committing into nine index tables on one
  * shared scheduler, half of them mid-batch while the others poll. This
  * spec runs all eight streams concurrently through two live corpus
  * commits, then stops every stream MID-HISTORY, commits offline
  * (delete + insert + update), restarts all eight from their original
  * checkpoints, and re-asserts every maintained table ≡ the same read
  * recomputed from the final snapshot — the demo §12 skew check, held
  * across a restart under concurrency.
  *
  * What specifically can break only here: a scope digest shared between
  * two streams (one stream's batch tag would silence another's apply),
  * a bucket-declaration race on first write, and a CDC source whose
  * per-reader offsets alias. All eight families ride: text exact fp +
  * LSH bands (one stream, two tables), spans, whole-clip modality
  * bands, exact audio windows, gain-robust windows, exact scenes,
  * re-encode bands, and the cross-modal image table. */
class ConcurrentMaintenanceSpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  /** Deterministic text per (doc, salt): 4–12 vocab words, so shingles
    * (≥3 tokens), span windows (≥8 tokens on the longer ones) and every
    * media generator's n_chars arithmetic all get real inputs, and a
    * salt bump rewrites the doc wholesale (an update that changes every
    * family's facts). */
  private def text(id: Long, salt: Int): String =
    (0 until (4 + ((id + salt) % 9)).toInt)
      .map(i => vocab(((id + i * 7 + salt) % 10).toInt)).mkString(" ")

  private def docs(ids: Seq[Long], salt: Int): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, text(id, salt))).toDF("doc_id", "text")
  }

  test("eight turnkey maintenance streams against one corpus: concurrent " +
    "commits, a stop, an offline commit and a restart from the original " +
    "checkpoints — every maintained table ≡ recomputed from the final " +
    "snapshot at each step") {
    val work = Files.createTempDirectory("graft-conc-maint").toString
    val corpus = s"$work/corpus"
    def t(n: String): String = s"$work/$n"

    def snapshot(): DataFrame = ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        col("text"))

    def assertTable(clue: String, name: String, got: DataFrame,
        want: DataFrame): Unit = {
      val g = got.collect().map(_.toString).sorted
      val w = want.collect().map(_.toString).sorted
      assert(g.sameElements(w),
        s"$name drifted under concurrent maintenance: $clue " +
          s"(got ${g.length} rows, want ${w.length})")
    }

    def assertAll(clue: String): Unit = {
      val snap = snapshot().localCheckpoint()
      assertTable(clue, "fp",
        DedupIndex.readFpIndex(spark, t("fp")).select(col("fp"), col("n_docs")),
        DedupIndex.computeFpIndex(snap.select(col("doc_id"), col("text")))
          .select(col("fp"), col("n_docs")))
      assertTable(clue, "band", DedupIndex.readBandIndex(spark, t("band")),
        DedupIndex.computeBandIndex(snap.select(col("doc_id"), col("text")))
          .where(col("live")).select(col("doc_id"), col("band"), col("bucket")))
      assertTable(clue, "span", SpanIndex.readSpanIndex(spark, t("span")),
        SpanIndex.computeSpanIndex(snap.select(col("doc_id"), col("text")))
          .select(col("h"), col("doc_id"), col("p")))
      assertTable(clue, "mod", ModalityIndex.readModalityIndex(spark, t("mod")),
        ModalityIndex.computeModalityIndex(snap.select(col("doc_id"), col("n_chars")))
          .select(col("bk"), col("media_id"), col("hi"), col("lo")))
      assertTable(clue, "awin", AudioWindowIndex.readAudioWindowIndex(spark, t("awin")),
        AudioWindowIndex.computeAudioWindowIndex(snap.select(col("doc_id"), col("n_chars")))
          .select(col("fp"), col("media_id"), col("w")))
      assertTable(clue, "gwin", GainWindowIndex.readGainWindowIndex(spark, t("gwin")),
        GainWindowIndex.computeGainWindowIndex(snap.select(col("doc_id"), col("n_chars")))
          .select(col("sfp"), col("media_id"), col("w"), col("efp")))
      assertTable(clue, "scene", SceneIndex.readSceneIndex(spark, t("scene")),
        SceneIndex.computeSceneIndex(snap.select(col("doc_id"), col("n_chars")))
          .select(col("fp"), col("media_id")).distinct())
      assertTable(clue, "reenc", ReencodeIndex.readReencodeIndex(spark, t("reenc")),
        ReencodeIndex.computeReencodeIndex(snap.select(col("doc_id"), col("n_chars")))
          .select(col("bk"), col("media_id"), col("sc"), col("fp"),
            col("hi"), col("lo")))
      assertTable(clue, "xmod", CrossModalIndex.readCrossModalIndex(spark, t("xmod")),
        CrossModalIndex.computeCrossModalIndex(snap.select(col("doc_id"), col("text")))
          .select(col("bk"), col("media_id"), col("hi"), col("lo")))
    }

    def startAll(): Seq[org.apache.spark.sql.streaming.StreamingQuery] = Seq(
      DedupIndex.startIndexMaintenance(spark, corpus, t("fp"), t("band"),
        s"$work/ck_dedup"),
      SpanIndex.startMaintenance(spark, corpus, t("span"), s"$work/ck_span"),
      ModalityIndex.startMaintenance(spark, corpus, t("mod"), s"$work/ck_mod"),
      AudioWindowIndex.startMaintenance(spark, corpus, t("awin"), s"$work/ck_awin"),
      GainWindowIndex.startMaintenance(spark, corpus, t("gwin"), s"$work/ck_gwin"),
      SceneIndex.startMaintenance(spark, corpus, t("scene"), s"$work/ck_scene"),
      ReencodeIndex.startMaintenance(spark, corpus, t("reenc"), s"$work/ck_reenc"),
      CrossModalIndex.startMaintenance(spark, corpus, t("xmod"), s"$work/ck_xmod"))

    // ids 0..23 span all three modality arms; 8/11 and 20/23 are the two
    // re-encode video quads (gid 2 and 5), the %4==3 members of audio
    // quads carry the planted gain siblings
    val all = (0L until 24L)

    // v1: the even half, committed BEFORE the streams start (the first
    // CDC batch re-emits it as the bootstrap batch to all eight readers)
    ManifestTable.merge(docs(all.filter(_ % 2 == 0), salt = 0),
      corpus, Seq("doc_id"))
    val streams = startAll()
    try {
      streams.foreach(_.processAllAvailable())
      assertAll("after concurrent bootstrap batch")

      // v2 lands while all eight streams are LIVE: the odd half arrives,
      // and three even docs rewrite wholesale (update pre/post pairs in
      // every reader's delta; kept facts must net to zero concurrently)
      ManifestTable.merge(
        docs(all.filter(_ % 2 == 1), salt = 0)
          .union(docs(Seq(0L, 8L, 4L), salt = 7)), corpus, Seq("doc_id"))
      streams.foreach(_.processAllAvailable())
      assertAll("after live concurrent commit")
    } finally streams.foreach(_.stop())

    // offline commits while every stream is DOWN: a delete (one video
    // quad member, one audio doc), an insert, and another rewrite — then
    // all eight restart from their original checkpoints and must apply
    // exactly the missed versions, each under its own scope
    ManifestTable.commit(
      ManifestTable.read(spark, corpus)
        .where(!col("doc_id").isin(11L, 7L)).localCheckpoint(), corpus)
    ManifestTable.merge(
      docs(Seq(24L, 25L, 26L), salt = 0).union(docs(Seq(3L), salt = 13)),
      corpus, Seq("doc_id"))
    val restarted = startAll()
    try {
      restarted.foreach(_.processAllAvailable())
      assertAll("after restart across the offline gap")
    } finally restarted.foreach(_.stop())
  }
}
