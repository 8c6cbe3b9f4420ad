package graft.sources

import graft.multimodal.{MediaHeaders, Multimodal}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * under [[ModalityIndex]]'s live-row-wins rule when an update keeps a
  * window's sign pattern but changes its samples. Exactly-once rides
  * the shared txn-tag protocol; [[startMaintenance]] is the turnkey
  * stream. RobustIndexSpec pins maintained ≡ recomputed across
  * insert/update/delete commits and replay rejection; q192/q194
  * oracle-gate the reads against an engine that never saw the
  * index. */
object GainWindowIndex {

  /** Same bucket count/role as [[DedupIndex.IndexBuckets]]. */
  val IndexBuckets = 16

  /** q190's pair gate: a pair is a gain dup when ≥ 4 windows match. */
  val MinSharedWindows = 4

  private[graft] val PollScope = "gainwin-refresh-poll"

  private def sign: Column = when(
    col("_change_type").isin("insert", "update_postimage"), 1L)
    .when(col("_change_type").isin("delete", "update_preimage"), -1L)

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

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", ManifestTable.bucketIdColumn(col("sfp"), IndexBuckets))

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, sfp, media_id, w, efp, alive). */
  def computeGainWindowIndex(docs: DataFrame): DataFrame =
    withBucket(windows(docs).withColumn("alive", lit(true)))
      .select(col("bucket"), col("sfp"), col("media_id"), col("w"),
        col("efp"), col("alive"))

  /** Bootstrap from a corpus snapshot. */
  def bootstrapGainWindowIndex(docs: DataFrame, idxRoot: String): Int = {
    ManifestTable.declareBuckets(idxRoot, "sfp", IndexBuckets)
    ManifestTable.mergePartitioned(computeGainWindowIndex(docs), idxRoot,
      Seq("bucket", "sfp", "media_id", "w"), "bucket")
  }

  /** Apply ONE corpus version's CDC events (preimages required; the
    * clips derive from doc_id and n_chars = length(text), so a
    * preimage regenerates exactly the window rows its commit added). */
  def maintainGainWindowIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int = {
    if (changes.isEmpty) return ManifestTable.currentVersion(idxRoot)
    val signed = changes.where(sign.isNotNull)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        sign.as("__sgn"))
    def rows(sgn: Long): DataFrame = windows(
      signed.where(col("__sgn") === sgn).select(col("doc_id"), col("n_chars")))
    val d = rows(1L).withColumn("net", lit(1L))
      .union(rows(-1L).withColumn("net", lit(-1L)))
      .groupBy(col("sfp"), col("media_id"), col("w"), col("efp"))
      .agg(sum(col("net")).as("net"))
      .where(col("net") =!= 0L)
      // live-row-wins collapse: an update that keeps a window's sign
      // pattern but changes its samples nets −1 on the old efp and +1
      // on the new — one row per merge key
      .groupBy(col("sfp"), col("media_id"), col("w"))
      .agg(max(struct((col("net") > 0L).as("alive"), col("efp"))).as("r"))
      .select(col("sfp"), col("media_id"), col("w"),
        col("r.efp").as("efp"), col("r.alive").as("alive"))
      .localCheckpoint()
    if (d.isEmpty) return ManifestTable.currentVersion(idxRoot)
    ManifestTable.declareBuckets(idxRoot, "sfp", IndexBuckets)
    ManifestTable.mergePartitioned(withBucket(d)
        .select(col("bucket"), col("sfp"), col("media_id"), col("w"),
          col("efp"), col("alive")),
      idxRoot, Seq("bucket", "sfp", "media_id", "w"), "bucket", tag = tag)
  }

  /** EXACTLY-ONCE step (the shared txn-tag protocol). */
  def applyBatch(changes: DataFrame, batchId: Long, idxRoot: String,
      scope: String = ""): Unit = {
    if (batchId <= ManifestTable.lastBatchTag(idxRoot, scope)) return
    maintainGainWindowIndex(changes.sparkSession, changes.localCheckpoint(),
      idxRoot, Some(ManifestTable.batchTag(scope, batchId)))
  }

  /** Roll forward across corpus versions `(fromV, toV]`. */
  def refresh(spark: SparkSession, corpusRoot: String, idxRoot: String,
      fromV: Int, toV: Int): Unit =
    (fromV until toV).foreach { v =>
      val ch = ManifestTable.readChanges(
        spark, corpusRoot, v, v + 1, Seq("doc_id"), preimages = true)
      applyBatch(ch, (v + 1).toLong, idxRoot, scope = PollScope)
    }

  /** Turnkey stream ([[ModalityIndex.startMaintenance]]'s shape). */
  def startMaintenance(spark: SparkSession, corpusRoot: String,
      idxRoot: String, checkpoint: String, startingVersion: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val scope = ManifestStreamSink.digest(
      ManifestStreamSink.canonicalCheckpoint(checkpoint))
    spark.readStream.format("graft-manifest-cdc")
      .option("path", corpusRoot).option("key", "doc_id")
      .option("startingVersion", startingVersion.toString)
      .option("preimages", "true").load()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, idxRoot, scope)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  // ------------------------------------------------------------- reads

  /** Live (sfp, media_id, w, efp) window rows — tombstones filtered. */
  def readGainWindowIndex(spark: SparkSession, idxRoot: String): DataFrame =
    ManifestTable.read(spark, idxRoot)
      .where(col("alive"))
      .select(col("sfp"), col("media_id"), col("w"), col("efp"))

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
    val probe = windows(batch).localCheckpoint()
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
