package graft.sources

import graft.multimodal.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained VIDEO SCENE-KEYFRAME index (VERDICT r16 #3
  * — the last maintained-index gap): one hash-bucketed ManifestTable of
  * (fp → media_id, sc) rows, where fp is q180's dim-qualified pixel md5
  * of a scene keyframe and sc its ordinal among the clip's keyframes,
  * updated from the document table's CDC stream. Closes the video arc
  * the way [[AudioWindowIndex]] closed audio: q180/q185 re-decode and
  * re-select keyframes for the WHOLE corpus on every run; with this
  * table a corpus commit decodes only its CHANGED docs' videos, and the
  * dedup/probe reads join stored fingerprint rows only. At 100 TB video
  * decode is the single most expensive per-byte stage in the pipeline —
  * recomputing it per dedup run is the cost this index deletes.
  *
  * PROTOCOL CHOICE: this is the exact-fact ([[SpanIndex]] /
  * [[AudioWindowIndex]]) shape, NOT [[ModalityIndex]]'s banded one,
  * deliberately. Scene matching is EXACT md5 equality, so LSH banding
  * buys no recall; and a video carries MANY scene fingerprints, which
  * the banded table's (bk, media_id) merge key cannot hold — two scenes
  * of one clip colliding on a 16-bit band slice would silently collapse
  * to one row, exactly the class of quiet drift a maintained index must
  * exclude by construction. Keying by (fp, media_id, sc) makes every
  * row a distinct fact, so [[SpanIndex]]'s netting applies verbatim
  * (kept scenes net to zero; dropped scenes tombstone). Exactly-once
  * rides the shared txn-tag protocol; [[startMaintenance]] is the
  * turnkey stream. SceneIndexSpec pins maintained ≡ recomputed across
  * insert/update/delete commits, replay rejection, and a checkpoint
  * restart; q187/q188 oracle-gate the reads against an engine that
  * never saw the index. */
object SceneIndex {

  /** Same bucket count/role as [[DedupIndex.IndexBuckets]]. */
  val IndexBuckets = 16

  private[graft] val PollScope = "scene-refresh-poll"

  private def sign: Column = when(
    col("_change_type").isin("insert", "update_postimage"), 1L)
    .when(col("_change_type").isin("delete", "update_preimage"), -1L)

  /** Every scene keyframe of a (doc_id, n_chars) frame's videos as
    * (fp, media_id, sc) — the exact fingerprints q180 derives on the
    * fly, through the same generator, keyframe rule and dim-qualified
    * hash, so the maintained index and the single-shot queries cannot
    * drift. */
  private[graft] def scenes(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Multimodal.videosFromDocs(docs.select(col("doc_id"), col("n_chars")))
      .flatMap { m =>
        Multimodal.sceneKeyframeFrames(m.data).zipWithIndex.map {
          case ((w, h, px), sc) =>
            (m.media_id, sc.toLong, s"${w}x$h:" + px.mkString(","))
        }
      }.toDF("media_id", "sc", "key")
      .select(md5(col("key")).as("fp"), col("media_id"), col("sc"))
  }

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", ManifestTable.bucketIdColumn(col("fp"), IndexBuckets))

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, fp, media_id, sc, alive). */
  def computeSceneIndex(docs: DataFrame): DataFrame =
    withBucket(scenes(docs).withColumn("alive", lit(true)))
      .select(col("bucket"), col("fp"), col("media_id"), col("sc"), col("alive"))

  /** Bootstrap from a corpus snapshot. */
  def bootstrapSceneIndex(docs: DataFrame, idxRoot: String): Int = {
    ManifestTable.declareBuckets(idxRoot, "fp", IndexBuckets)
    ManifestTable.mergePartitioned(computeSceneIndex(docs), idxRoot,
      Seq("bucket", "fp", "media_id", "sc"), "bucket")
  }

  /** Apply ONE corpus version's CDC events (preimages required; the
    * videos derive from doc_id and n_chars = length(text), so a
    * preimage regenerates exactly the scene rows its commit added). */
  def maintainSceneIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int = {
    if (changes.isEmpty) return ManifestTable.currentVersion(idxRoot)
    val signed = changes.where(sign.isNotNull)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        sign.as("__sgn"))
    def rows(sgn: Long): DataFrame = scenes(
      signed.where(col("__sgn") === sgn).select(col("doc_id"), col("n_chars")))
    val d = rows(1L).withColumn("net", lit(1L))
      .union(rows(-1L).withColumn("net", lit(-1L)))
      .groupBy(col("fp"), col("media_id"), col("sc"))
      .agg(sum(col("net")).as("net"))
      .where(col("net") =!= 0L)
      .select(col("fp"), col("media_id"), col("sc"), (col("net") > 0L).as("alive"))
      .localCheckpoint()
    if (d.isEmpty) return ManifestTable.currentVersion(idxRoot)
    ManifestTable.declareBuckets(idxRoot, "fp", IndexBuckets)
    ManifestTable.mergePartitioned(withBucket(d)
        .select(col("bucket"), col("fp"), col("media_id"), col("sc"), col("alive")),
      idxRoot, Seq("bucket", "fp", "media_id", "sc"), "bucket", tag = tag)
  }

  /** EXACTLY-ONCE step (the shared txn-tag protocol). */
  def applyBatch(changes: DataFrame, batchId: Long, idxRoot: String,
      scope: String = ""): Unit = {
    if (batchId <= ManifestTable.lastBatchTag(idxRoot, scope)) return
    maintainSceneIndex(changes.sparkSession, changes.localCheckpoint(),
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

  /** Live (fp, media_id) scene facts — tombstones filtered, the ordinal
    * dropped (it exists for the merge key; two identical scenes in one
    * clip still count ONCE downstream, q180's DISTINCT contract). */
  def readSceneIndex(spark: SparkSession, idxRoot: String): DataFrame =
    ManifestTable.read(spark, idxRoot)
      .where(col("alive"))
      .select(col("fp"), col("media_id"))
      .distinct()

  /** q187's report: q180's video near-dup pairs from STORED scene rows
    * — pairs of videos sharing ≥ 1 keyframe fingerprint with the
    * distinct shared-scene count, no payload decoded. Hot fps dropped
    * at [[Multimodal.ExactFpCap]] (black/slate frames concentrate),
    * the q180 gate. */
  def maintainedSceneDups(spark: SparkSession, idxRoot: String): DataFrame = {
    val rows = Multimodal.dropHotKeys(
      readSceneIndex(spark, idxRoot), Seq("fp"), Multimodal.ExactFpCap)
    rows.as("a").join(rows.as("b"),
        col("a.fp") === col("b.fp") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id"), col("b.media_id"))
      .agg(countDistinct(col("a.fp")).as("n_shared_scenes"))
      .select(col("a.media_id").as("media_id_a"),
        col("b.media_id").as("media_id_b"), col("n_shared_scenes"))
  }

  /** q188's probe: which COMMITTED videos share footage with an
    * ARRIVING doc batch — batch-sized decode, a bucket-pruned index
    * read on the batch scenes' fingerprints, corpus-side hot-fp cap.
    * The corpus video is never re-decoded and the index never
    * scanned. */
  def probeScenes(batch: DataFrame, spark: SparkSession,
      idxRoot: String): DataFrame = {
    val probe = scenes(batch)
      .select(col("fp"), col("media_id")).distinct().localCheckpoint()
    val committed = Multimodal.dropHotKeys(
      ManifestTable
        .readKeyPruned(spark, idxRoot, "fp", IndexBuckets, probe.select(col("fp")))
        .where(col("alive"))
        .select(col("fp"), col("media_id")).distinct(),
      Seq("fp"), Multimodal.ExactFpCap)
    probe.select(col("fp"), col("media_id").as("media_id_probe"))
      .join(committed.select(col("fp"), col("media_id").as("media_id_corpus")),
        Seq("fp"))
      .groupBy(col("media_id_probe"), col("media_id_corpus"))
      .agg(countDistinct(col("fp")).as("n_shared_scenes"))
  }
}
