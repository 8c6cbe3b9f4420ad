package graft.sources

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained WINDOW-POSITION (span) index — the
  * ExactSubstr family's maintained face, the last index family that
  * still implied a full recompute under corpus CDC (VERDICT r14 #5):
  * one hash-bucketed ManifestTable of (h → doc_id, p) window-position
  * rows, updated from the document table's CDC stream. A corpus commit
  * re-hashes only its CHANGED docs' windows (arrivals add live rows,
  * retractions tombstone the preimage's rows), never the lake — so
  * q148's duplicated-span report and q150's contamination scrub read
  * stored positions instead of re-hashing every corpus window, and
  * probing an ARRIVING eval set (the q150 direction: a new benchmark
  * lands, which training docs leak it?) reads only the batch windows'
  * hash-bucket partitions. At 100 TB the alternative is a full corpus
  * re-tokenization + window re-hash per scrub run.
  *
  * Rows are exact facts keyed by (h, doc_id, p) — unlike the df
  * ref-counts there is nothing to net ACROSS docs, so maintenance is
  * per-changed-doc work: an update's unchanged windows net to zero and
  * are not rewritten; a dropped window nets −1 and tombstones
  * (`alive = false`, readers filter). Non-idempotent only at the
  * commit level, so every maintenance surface rides the txn-tag
  * protocol ([[DedupIndex.applyBatch]]'s contract): [[applyBatch]]
  * (stream), [[refresh]] (polling), [[startMaintenance]] (turnkey).
  * SpanIndexSpec pins maintained ≡ recomputed across
  * insert/update/delete commits and replay rejection; q171/q172
  * oracle-gate the reports end-to-end against an engine that never saw
  * the index. */
object SpanIndex {

  /** Same bucket count/role as [[DedupIndex.IndexBuckets]]. */
  val IndexBuckets = 16

  /** Min-match window width — q148's 8-token detector. */
  val Width = 8

  private[graft] val PollScope = "span-refresh-poll"

  private def sign: Column = when(
    col("_change_type").isin("insert", "update_postimage"), 1L)
    .when(col("_change_type").isin("delete", "update_preimage"), -1L)

  /** Every [[Width]]-token window of a (doc_id, text) frame as
    * (doc_id, p, h) — [[TextOps.windowPositions]], the exact rows
    * q148/q150 derive on the fly. */
  private def windows(docs: DataFrame): DataFrame =
    TextOps.windowPositions(docs, Width)

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", ManifestTable.bucketIdColumn(col("h"), IndexBuckets))

  /** The span index of a corpus snapshot — the bootstrap, and the
    * spec's ground truth: (bucket, h, doc_id, p, alive). */
  def computeSpanIndex(docs: DataFrame): DataFrame =
    withBucket(windows(docs).withColumn("alive", lit(true)))
      .select(col("bucket"), col("h"), col("doc_id"), col("p"), col("alive"))

  /** Bootstrap the index table from a corpus snapshot (pair with
    * [[startMaintenance]]'s `startingVersion`, or the re-emitted
    * snapshot batch double-applies — [[DedupIndex]]'s contract). */
  def bootstrapSpanIndex(docs: DataFrame, idxRoot: String): Int = {
    ManifestTable.declareBuckets(idxRoot, "h", IndexBuckets)
    ManifestTable.mergePartitioned(
      computeSpanIndex(docs), idxRoot, Seq("bucket", "h", "doc_id", "p"), "bucket")
  }

  /** Apply ONE corpus version's CDC events. `changes` must carry
    * preimages: an update's old windows must retract. Only changed
    * docs re-hash; the merge touches only the delta's hash buckets;
    * windows an update keeps net to zero and are not rewritten. */
  def maintainSpanIndex(spark: SparkSession, changes: DataFrame, idxRoot: String,
      tag: Option[String] = None): Int = {
    if (changes.isEmpty) return ManifestTable.currentVersion(idxRoot)
    val signed = changes.where(sign.isNotNull)
      .select(col("doc_id"), col("text"), sign.as("__sgn"))
    val arrived = windows(signed.where(col("__sgn") === 1L)
      .select(col("doc_id"), col("text"))).withColumn("net", lit(1L))
    val retracted = windows(signed.where(col("__sgn") === -1L)
      .select(col("doc_id"), col("text"))).withColumn("net", lit(-1L))
    val d = arrived.union(retracted)
      .groupBy(col("h"), col("doc_id"), col("p"))
      .agg(sum(col("net")).as("net"))
      .where(col("net") =!= 0L)
      .select(col("h"), col("doc_id"), col("p"), (col("net") > 0L).as("alive"))
      .localCheckpoint()
    if (d.isEmpty) return ManifestTable.currentVersion(idxRoot)
    ManifestTable.declareBuckets(idxRoot, "h", IndexBuckets)
    ManifestTable.mergePartitioned(withBucket(d)
        .select(col("bucket"), col("h"), col("doc_id"), col("p"), col("alive")),
      idxRoot, Seq("bucket", "h", "doc_id", "p"), "bucket", tag = tag)
  }

  /** EXACTLY-ONCE step ([[DedupIndex.applyBatch]]'s protocol). */
  def applyBatch(changes: DataFrame, batchId: Long, idxRoot: String,
      scope: String = ""): Unit = {
    if (batchId <= ManifestTable.lastBatchTag(idxRoot, scope)) return
    maintainSpanIndex(changes.sparkSession, changes.localCheckpoint(), idxRoot,
      Some(ManifestTable.batchTag(scope, batchId)))
  }

  /** Roll forward across corpus versions `(fromV, toV]`, exactly-once
    * under the shared [[PollScope]]. */
  def refresh(spark: SparkSession, corpusRoot: String, idxRoot: String,
      fromV: Int, toV: Int): Unit =
    (fromV until toV).foreach { v =>
      val ch = ManifestTable.readChanges(
        spark, corpusRoot, v, v + 1, Seq("doc_id"), preimages = true)
      applyBatch(ch, (v + 1).toLong, idxRoot, scope = PollScope)
    }

  /** Turnkey stream ([[DedupIndex.startIndexMaintenance]]'s shape). */
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

  /** Live (h, doc_id, p) window rows — tombstones filtered. */
  def readSpanIndex(spark: SparkSession, idxRoot: String): DataFrame =
    ManifestTable.read(spark, idxRoot)
      .where(col("alive"))
      .select(col("h"), col("doc_id"), col("p"))

  /** q171's report: q148's duplicated-span detection from the
    * MAINTAINED positions — group the stored rows by hash, keep
    * occ ≥ 2, merge each doc's duplicated covers into maximal
    * intervals. The corpus text is never read: the report costs one
    * aggregate + join over the stored index, not a corpus
    * re-tokenization. */
  def maintainedDupSpans(spark: SparkSession, idxRoot: String): DataFrame = {
    val pos = readSpanIndex(spark, idxRoot)
    val dup = pos.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2L)
    TextOps.mergeWindowCovers(
      pos.join(dup, "h").select(col("doc_id"), col("p")), Width)
  }

  /** q172's probe: which CORPUS spans does an ARRIVING eval set leak —
    * q150's question asked the production way round: the eval batch is
    * windowed (batch-sized work), the index contributes only the batch
    * hashes' bucket partitions ([[ManifestTable.readKeyPruned]]), and
    * the hits island-merge per corpus doc. The corpus is not read and
    * the index is not scanned. */
  def probeContamination(batch: DataFrame, spark: SparkSession,
      idxRoot: String): DataFrame = {
    val evalW = windows(batch).select(col("h")).distinct()
    val hits = ManifestTable
      .readKeyPruned(spark, idxRoot, "h", IndexBuckets, evalW)
      .where(col("alive"))
      .join(evalW, Seq("h"), "left_semi")
    TextOps.mergeWindowCovers(hits.select(col("doc_id"), col("p")), Width)
  }
}
