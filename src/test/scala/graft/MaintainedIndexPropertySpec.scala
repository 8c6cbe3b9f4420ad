package graft

import graft.sources.{AudioWindowIndex, CrossModalIndex, GainWindowIndex,
  ManifestTable, ModalityIndex, ReencodeIndex, SceneIndex, SpanIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized CDC-lifecycle property of the SHARED maintained-index
  * protocol (the round-18 extraction): for ANY sequence of
  * insert/update/delete commits, every front's maintained read equals
  * the same read over the live snapshot, recomputed from scratch. The
  * per-index specs pin hand-written scenarios (kept-fact netting,
  * replay, restarts); this spec drives seeded-random sequences through
  * the four fronts that span the protocol's parameter matrix —
  *
  *   change projection ×  collapse shape
  *   (doc_id, text)       exact-fact        → [[SpanIndex]]
  *   (doc_id, n_chars)    exact-fact        → [[SceneIndex]]
  *   (doc_id, n_chars)    live-row-wins     → [[ModalityIndex]]
  *   (doc_id, text)       live-row-wins     → [[CrossModalIndex]]
  *
  * — so a protocol-core regression that any parameterization can
  * expose fails here even if no hand-written scenario happens to hit
  * it. Sequences are SEEDED (deterministic across runs); updates
  * rewrite a doc's text wholesale, deletes drop live docs, and short
  * texts (< 3 tokens: no shingles; < 8: no span windows) are generated
  * on purpose — the empty-fact edge every generator must net cleanly.
  *
  * The remaining three fronts run the SAME seeded lifecycle (VERDICT
  * r18 #1): the matrix above covers the protocol core, but each
  * generator's own empty-fact and boundary edges net differently under
  * random churn, and these are the math-heaviest generators in the
  * repo —
  *
  *   [[AudioWindowIndex]]  exact-fact, PCM window md5s (a doc whose
  *                         n_chars leaves the clip under one 64-sample
  *                         window contributes zero facts)
  *   [[ReencodeIndex]]     live-row-wins, banded keyframe aHashes over
  *                         a doubly-gated doc population (hasVideo AND
  *                         gid % 3 = 2 — most updates touch docs that
  *                         generate NOTHING, the all-empty delta edge)
  *   [[GainWindowIndex]]   live-row-wins, sign-of-delta fingerprints
  *                         whose exact-md5 payload changes whenever the
  *                         samples do even if the sign pattern (the
  *                         merge key) survives — the payload-only-churn
  *                         edge the exact-fact fronts cannot reach */
class MaintainedIndexPropertySpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def randomText(rng: scala.util.Random): String =
    Seq.fill(rng.nextInt(16))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  /** One seeded lifecycle: 6 commits of mixed upserts + deletes over a
    * 30-id universe (ids cover all three modality arms), refreshing the
    * index after each and asserting maintained ≡ recomputed. */
  private def drive(seed: Int, name: String)(
      bootstrap: (DataFrame, String) => Int,
      refresh: (String, String, Int, Int) => Unit,
      maintainedRead: String => DataFrame,
      recompute: DataFrame => DataFrame): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val work = Files.createTempDirectory(s"graft-prop-$name").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/idx")
    def upserts(): DataFrame = {
      val n = 3 + rng.nextInt(6)
      // one row per key: a merge batch with two texts for one doc_id is
      // not a meaningful upsert (the corpus table's key contract)
      Seq.fill(n)((rng.nextInt(30).toLong, randomText(rng)))
        .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
        .toDF("doc_id", "text")
    }
    var v = ManifestTable.merge(upserts(), corpus, Seq("doc_id"))
    bootstrap(snapshot(corpus), idx)
    check(corpus, idx, s"$name seed=$seed after bootstrap",
      maintainedRead, recompute)
    (1 to 6).foreach { step =>
      val live = ManifestTable.read(spark, corpus)
        .select($"doc_id").as[Long].collect()
      val newV =
        if (rng.nextInt(4) == 0 && live.nonEmpty) {
          // a delete commit: drop 1-2 random live docs
          val drop = rng.shuffle(live.toSeq).take(1 + rng.nextInt(2)).toSet
          ManifestTable.commit(
            ManifestTable.read(spark, corpus)
              .where(!$"doc_id".isin(drop.toSeq: _*)).localCheckpoint(), corpus)
        } else ManifestTable.merge(upserts(), corpus, Seq("doc_id"))
      refresh(corpus, idx, v, newV)
      v = newV
      check(corpus, idx, s"$name seed=$seed after commit $step",
        maintainedRead, recompute)
    }
  }

  private def snapshot(corpus: String): DataFrame =
    ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        col("text"))

  private def check(corpus: String, idx: String, clue: String,
      maintainedRead: String => DataFrame,
      recompute: DataFrame => DataFrame): Unit = {
    val got = maintainedRead(idx).collect().map(_.toString).sorted
    val want = recompute(snapshot(corpus)).collect().map(_.toString).sorted
    assert(got.sameElements(want),
      s"maintained drifted from recompute: $clue " +
        s"(got ${got.length} rows, want ${want.length})")
  }

  test("exact-fact / text projection (SpanIndex): maintained ≡ recomputed " +
    "across seeded-random insert/update/delete sequences") {
    drive(41, "span")(
      (d, r) => SpanIndex.bootstrapSpanIndex(d.select(col("doc_id"), col("text")), r),
      (c, r, f, t) => SpanIndex.refresh(spark, c, r, f, t),
      r => SpanIndex.readSpanIndex(spark, r),
      d => SpanIndex.computeSpanIndex(d.select(col("doc_id"), col("text")))
        .select(col("h"), col("doc_id"), col("p")))
  }

  test("exact-fact / n_chars projection (SceneIndex): maintained ≡ " +
    "recomputed across seeded-random sequences") {
    drive(42, "scene")(
      (d, r) => SceneIndex.bootstrapSceneIndex(
        d.select(col("doc_id"), col("n_chars")), r),
      (c, r, f, t) => SceneIndex.refresh(spark, c, r, f, t),
      r => SceneIndex.readSceneIndex(spark, r),
      d => SceneIndex.computeSceneIndex(d.select(col("doc_id"), col("n_chars")))
        .select(col("fp"), col("media_id")).distinct())
  }

  test("live-row-wins / n_chars projection (ModalityIndex): maintained ≡ " +
    "recomputed across seeded-random sequences") {
    drive(43, "modality")(
      (d, r) => ModalityIndex.bootstrapModalityIndex(
        d.select(col("doc_id"), col("n_chars")), r),
      (c, r, f, t) => ModalityIndex.refresh(spark, c, r, f, t),
      r => ModalityIndex.readModalityIndex(spark, r),
      d => ModalityIndex.computeModalityIndex(
        d.select(col("doc_id"), col("n_chars")))
        .select(col("bk"), col("media_id"), col("hi"), col("lo")))
  }

  test("live-row-wins / text projection (CrossModalIndex): maintained ≡ " +
    "recomputed across seeded-random sequences") {
    drive(44, "xmod")(
      (d, r) => CrossModalIndex.bootstrapCrossModalIndex(
        d.select(col("doc_id"), col("text")), r),
      (c, r, f, t) => CrossModalIndex.refresh(spark, c, r, f, t),
      r => CrossModalIndex.readCrossModalIndex(spark, r),
      d => CrossModalIndex.computeCrossModalIndex(
        d.select(col("doc_id"), col("text")))
        .select(col("bk"), col("media_id"), col("hi"), col("lo")))
  }

  test("exact-fact / PCM window md5s (AudioWindowIndex): maintained ≡ " +
    "recomputed across seeded-random sequences") {
    drive(45, "awin")(
      (d, r) => AudioWindowIndex.bootstrapAudioWindowIndex(
        d.select(col("doc_id"), col("n_chars")), r),
      (c, r, f, t) => AudioWindowIndex.refresh(spark, c, r, f, t),
      r => AudioWindowIndex.readAudioWindowIndex(spark, r),
      d => AudioWindowIndex.computeAudioWindowIndex(
        d.select(col("doc_id"), col("n_chars")))
        .select(col("fp"), col("media_id"), col("w")))
  }

  test("live-row-wins / banded keyframe aHashes (ReencodeIndex): " +
    "maintained ≡ recomputed across seeded-random sequences") {
    drive(46, "reenc")(
      (d, r) => ReencodeIndex.bootstrapReencodeIndex(
        d.select(col("doc_id"), col("n_chars")), r),
      (c, r, f, t) => ReencodeIndex.refresh(spark, c, r, f, t),
      r => ReencodeIndex.readReencodeIndex(spark, r),
      d => ReencodeIndex.computeReencodeIndex(
        d.select(col("doc_id"), col("n_chars")))
        .select(col("bk"), col("media_id"), col("sc"), col("fp"),
          col("hi"), col("lo")))
  }

  test("live-row-wins / sign-of-delta windows (GainWindowIndex): " +
    "maintained ≡ recomputed across seeded-random sequences") {
    drive(47, "gwin")(
      (d, r) => GainWindowIndex.bootstrapGainWindowIndex(
        d.select(col("doc_id"), col("n_chars")), r),
      (c, r, f, t) => GainWindowIndex.refresh(spark, c, r, f, t),
      r => GainWindowIndex.readGainWindowIndex(spark, r),
      d => GainWindowIndex.computeGainWindowIndex(
        d.select(col("doc_id"), col("n_chars")))
        .select(col("sfp"), col("media_id"), col("w"), col("efp")))
  }
}
