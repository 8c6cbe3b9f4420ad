package graft

import graft.sources.{DedupIndex, ManifestTable, ModalityIndex, SpanIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[graft.sources.MaintainedIndex.refreshBatched]] (VERDICT r18
  * #6): over a 20-commit history, ONE snapshot-diff catch-up commit
  * must land the index on exactly the rows 20 per-version refreshes
  * produce — including the case the diff base makes or breaks: a doc
  * updated BOTH before and after the watermark (diffing from below it
  * would leave the watermark state's facts live forever). The
  * lifecycle includes a mid-catch-up stop (crash analog: the merge is
  * atomic, so a crash IS a stop before the commit), a restart that
  * must resume from the watermark rather than the caller's fromV, a
  * per-version/batched interleave in one scope, and a replay that must
  * commit nothing. Driven through both protocol collapse shapes —
  * exact-fact ([[SpanIndex]]) and live-row-wins ([[ModalityIndex]]). */
class BatchedRefreshSpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def randomText(rng: scala.util.Random): String =
    Seq.fill(rng.nextInt(16))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  /** A 20-commit seeded history over a 30-id universe: mixed upserts
    * and deletes, with doc 0 REWRITTEN in every upsert commit so the
    * updated-across-the-watermark case is guaranteed, not left to the
    * seed. Returns the final version. */
  private def buildHistory(corpus: String, seed: Int): Int = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    var v = 0
    (1 to 20).foreach { _ =>
      val live = if (v == 0) Array.empty[Long]
        else ManifestTable.read(spark, corpus)
          .select($"doc_id").as[Long].collect()
      v = if (rng.nextInt(4) == 0 && live.length > 1) {
        val drop = rng.shuffle(live.toSeq).take(1 + rng.nextInt(2))
          .filterNot(_ == 0L).toSet
        if (drop.isEmpty) mergeUpserts(corpus, rng)
        else ManifestTable.commit(
          ManifestTable.read(spark, corpus)
            .where(!$"doc_id".isin(drop.toSeq: _*)).localCheckpoint(), corpus)
      } else mergeUpserts(corpus, rng)
    }
    v
  }

  private def mergeUpserts(corpus: String, rng: scala.util.Random): Int = {
    import spark.implicits._
    val n = 3 + rng.nextInt(6)
    val rows = (Seq.fill(n)((rng.nextInt(30).toLong, randomText(rng))) :+
        (0L, randomText(rng)))
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
    ManifestTable.merge(rows.toDF("doc_id", "text"), corpus, Seq("doc_id"))
  }

  private def snapshot(corpus: String): DataFrame =
    ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        col("text"))

  private def assertSame(clue: String, got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().map(_.toString).sorted
    val w = want.collect().map(_.toString).sorted
    assert(g.sameElements(w),
      s"$clue (got ${g.length} rows, want ${w.length})")
  }

  test("exact-fact front (SpanIndex): batched catch-up ≡ per-version ≡ " +
    "recomputed over 20 commits, with a mid-catch-up stop, a " +
    "per-version interleave and a replay") {
    val work = Files.createTempDirectory("graft-batched-span").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 51)
    assert(v == 20)
    // A: the per-version path, one commit per corpus version
    SpanIndex.refresh(spark, corpus, s"$work/a", 0, v)
    // B: three per-version steps, then a batched catch-up to v10 (the
    // "crash" is simply stopping there — the merge is atomic), then a
    // second catch-up that must resume from the watermark, not fromV=0
    SpanIndex.refresh(spark, corpus, s"$work/b", 0, 3)
    SpanIndex.refreshBatched(spark, corpus, s"$work/b", 0, 10)
    SpanIndex.refreshBatched(spark, corpus, s"$work/b", 0, v)
    val read = (r: String) => SpanIndex.readSpanIndex(spark, s"$work/$r")
    assertSame("batched diverged from per-version", read("b"), read("a"))
    assertSame("batched diverged from recompute", read("b"),
      SpanIndex.computeSpanIndex(snapshot(corpus).select(col("doc_id"), col("text")))
        .select(col("h"), col("doc_id"), col("p")))
    // replay: the whole range re-requested commits NOTHING
    val vIdx = ManifestTable.currentVersion(s"$work/b")
    SpanIndex.refreshBatched(spark, corpus, s"$work/b", 0, v)
    assert(ManifestTable.currentVersion(s"$work/b") == vIdx,
      "a replayed batched catch-up committed")
  }

  test("ref-count protocol (DedupIndex fp + band): batched catch-up ≡ " +
    "per-version ≡ recomputed over 20 commits, including a SPLIT " +
    "watermark (fp one commit ahead of band — the crash-between-the-" +
    "two-commits shape, where each table must diff from ITS OWN " +
    "watermark)") {
    val work = Files.createTempDirectory("graft-batched-dedup").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 53)
    assert(v == 20)
    DedupIndex.refreshIndexes(spark, corpus, s"$work/afp", s"$work/aband", 0, v)
    // B: per-version to 5, then a simulated crash at version 6 — the fp
    // commit landed, the band commit did not
    DedupIndex.refreshIndexes(spark, corpus, s"$work/bfp", s"$work/bband", 0, 5)
    val ch6 = ManifestTable.readChanges(spark, corpus, 5, 6, Seq("doc_id"),
      preimages = true).localCheckpoint()
    DedupIndex.maintainFpIndex(spark, ch6, s"$work/bfp",
      Some(ManifestTable.batchTag(DedupIndex.PollScope, 6L)))
    // batched catch-up: fp must diff from 6, band from 5 — a shared
    // diff base would double-count version 6's fps
    DedupIndex.refreshIndexesBatched(spark, corpus, s"$work/bfp", s"$work/bband", 0, 10)
    DedupIndex.refreshIndexesBatched(spark, corpus, s"$work/bfp", s"$work/bband", 0, v)
    import org.apache.spark.sql.functions.col
    def fp(r: String) = DedupIndex.readFpIndex(spark, s"$work/$r")
      .select(col("fp"), col("n_docs"))
    def band(r: String) = DedupIndex.readBandIndex(spark, s"$work/$r")
    assertSame("fp: batched diverged from per-version", fp("bfp"), fp("afp"))
    assertSame("band: batched diverged from per-version", band("bband"), band("aband"))
    val snap = ManifestTable.read(spark, corpus)
    assertSame("fp: batched diverged from recompute", fp("bfp"),
      DedupIndex.computeFpIndex(snap).select(col("fp"), col("n_docs")))
    assertSame("band: batched diverged from recompute", band("bband"),
      DedupIndex.computeBandIndex(snap).where(col("live"))
        .select(col("doc_id"), col("band"), col("bucket")))
    // replay commits nothing to either table
    val (vF, vB) = (ManifestTable.currentVersion(s"$work/bfp"),
      ManifestTable.currentVersion(s"$work/bband"))
    DedupIndex.refreshIndexesBatched(spark, corpus, s"$work/bfp", s"$work/bband", 0, v)
    assert(ManifestTable.currentVersion(s"$work/bfp") == vF &&
      ManifestTable.currentVersion(s"$work/bband") == vB,
      "a replayed batched catch-up committed")
  }

  test("live-row-wins front (ModalityIndex): batched catch-up ≡ " +
    "per-version ≡ recomputed over 20 commits (payload churn across " +
    "the watermark nets to the final payload, never an intermediate)") {
    val work = Files.createTempDirectory("graft-batched-mod").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 52)
    assert(v == 20)
    ModalityIndex.refresh(spark, corpus, s"$work/a", 0, v)
    ModalityIndex.refreshBatched(spark, corpus, s"$work/b", 0, 10)
    ModalityIndex.refreshBatched(spark, corpus, s"$work/b", 0, v)
    val read = (r: String) => ModalityIndex.readModalityIndex(spark, s"$work/$r")
    assertSame("batched diverged from per-version", read("b"), read("a"))
    assertSame("batched diverged from recompute", read("b"),
      ModalityIndex.computeModalityIndex(
        snapshot(corpus).select(col("doc_id"), col("n_chars")))
        .select(col("bk"), col("media_id"), col("hi"), col("lo")))
  }
}
