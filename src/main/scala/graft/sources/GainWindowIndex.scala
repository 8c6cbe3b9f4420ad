package graft.sources

import graft.multimodal.{MediaHeaders, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained GAIN-ROBUST audio-window index — the
  * sign-of-delta sibling of [[AudioWindowIndex]], maintained from the
  * document table's CDC stream. The exact-window table answers "same
  * recording up to a trim" but md5-of-exact-samples dies on ANY
  * amplitude change; this table stores q190's 63-bit order-statistic
  * fingerprint per 64-sample window (strict comparisons survive exact
  * positive gain), so a volume-normalized re-post of committed audio
  * is found without re-decoding one committed payload. Each row also
  * carries the window's exact md5 `efp`, so the read reports
  * `n_exact_shared` — every maintained gain pair carries the
  * exact-family blindness witness in-row exactly as q190 does.
  *
  * Rows are keyed (sfp, media_id, w); the exact-md5 payload collapses
  * under the shared [[MaintainedIndex]] protocol's live-row-wins rule
  * when an update keeps a window's sign pattern but changes its
  * samples. Exactly-once rides the shared txn-tag protocol;
  * [[startMaintenance]] is the turnkey stream. RobustIndexSpec pins
  * maintained ≡ recomputed across insert/update/delete commits and
  * replay rejection; q192/q194 oracle-gate the reads against an
  * engine that never saw the index. */
object GainWindowIndex extends MaintainedIndex {

  /** q190's pair gate: a pair is a gain dup when ≥ 4 windows match. */
  val MinSharedWindows = 4

  private[graft] val PollScope = "gainwin-refresh-poll"

  protected def bucketKey: String = "sfp"
  protected def mergeKeyCols: Seq[String] = Seq("sfp", "media_id", "w")
  override protected def payloadCols: Seq[String] = Seq("efp")
  protected def facts(docs: DataFrame): DataFrame = windows(docs)

  /** Every hop-32 window of a (doc_id, n_chars) frame's clips as
    * (sfp, media_id, w, efp) — q190's own generator, window grid,
    * sign-of-delta packing and exact-md5 witness, so the maintained
    * index and the single-shot query cannot drift. */
  private[graft] def windows(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Multimodal
      .audioWithGainDupsFromDocs(docs.select(col("doc_id"), col("n_chars")))
      .flatMap { m =>
        val pcm = MediaHeaders.wavSamples(m.data)
        Multimodal.pcmWindows(pcm).map { case (w, csv) =>
          (m.media_id, w.toLong, Multimodal.signBits(pcm, w * 32), csv)
        }
      }.toDF("media_id", "w", "sfp", "csv")
      .select(col("sfp"), col("media_id"), col("w"), md5(col("csv")).as("efp"))
  }

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, sfp, media_id, w, efp, alive). */
  def computeGainWindowIndex(docs: DataFrame): DataFrame = computeIndexOf(docs)

  /** Bootstrap from a corpus snapshot. */
  def bootstrapGainWindowIndex(docs: DataFrame, idxRoot: String): Int =
    bootstrapIndex(docs, idxRoot)

  /** Apply ONE corpus version's CDC events (preimages required; the
    * clips derive from doc_id and n_chars = length(text), so a
    * preimage regenerates exactly the window rows its commit added). */
  def maintainGainWindowIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int =
    maintainIndex(changes, idxRoot, tag)

  // applyBatch / refresh / startMaintenance: [[MaintainedIndex]].

  // ------------------------------------------------------------- reads

  /** Live (sfp, media_id, w, efp) window rows — tombstones filtered. */
  def readGainWindowIndex(spark: SparkSession, idxRoot: String): DataFrame =
    readLiveRows(spark, idxRoot)

  /** q192's report: q190's gain-robust duplicate pairs from stored
    * window rows — clips pair when ≥ [[MinSharedWindows]] sign
    * fingerprints match, with the recovered offset, offset cardinality
    * and the exact-md5 blindness witness, no payload decoded. Hot sfp
    * keys dropped at [[Multimodal.ExactFpCap]] (digital silence packs
    * an all-zero sign pattern across a whole crawl), q190's own
    * gate. */
  def maintainedGainDups(spark: SparkSession, idxRoot: String): DataFrame = {
    val rows = Multimodal.dropHotKeys(
      readGainWindowIndex(spark, idxRoot), Seq("sfp"), Multimodal.ExactFpCap)
    rows.as("a").join(rows.as("b"),
        col("a.sfp") === col("b.sfp") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id"), col("b.media_id"))
      .agg(count(lit(1)).as("n_shared"),
        sum(when(col("a.efp") === col("b.efp"), 1L).otherwise(0L))
          .as("n_exact_shared"),
        min(col("b.w") - col("a.w")).as("offset_w"),
        countDistinct(col("b.w") - col("a.w")).as("n_offsets"))
      .where(col("n_shared") >= MinSharedWindows)
      .select(col("a.media_id").as("media_id_a"),
        col("b.media_id").as("media_id_b"),
        col("n_shared"), col("n_exact_shared"),
        col("offset_w"), col("n_offsets"))
  }

  /** q194's probe: which COMMITTED recordings does an ARRIVING doc
    * batch duplicate up to gain (and trim) — batch-sized decode, a
    * bucket-pruned index read on the batch windows' sign fingerprints,
    * the same ≥ [[MinSharedWindows]] gate, with the exact-md5 witness.
    * The corpus audio is never re-decoded and the index never
    * scanned. */
  def probeGains(batch: DataFrame, spark: SparkSession,
      idxRoot: String): DataFrame = {
    val probe = windows(batch).localCheckpoint(eager = false)
    val committed = Multimodal.dropHotKeys(
      ManifestTable
        .readKeyPruned(spark, idxRoot, "sfp", IndexBuckets, probe.select(col("sfp")))
        .where(col("alive")),
      Seq("sfp"), Multimodal.ExactFpCap)
      .select(col("sfp"), col("media_id").as("media_id_corpus"),
        col("w").as("w_c"), col("efp").as("efp_c"))
    probe.select(col("sfp"), col("media_id").as("media_id_probe"),
        col("w").as("w_p"), col("efp").as("efp_p"))
      .join(committed, Seq("sfp"))
      .groupBy(col("media_id_probe"), col("media_id_corpus"))
      .agg(count(lit(1)).as("n_shared"),
        sum(when(col("efp_p") === col("efp_c"), 1L).otherwise(0L))
          .as("n_exact_shared"),
        min(col("w_c") - col("w_p")).as("offset_w"))
      .where(col("n_shared") >= MinSharedWindows)
  }
}
