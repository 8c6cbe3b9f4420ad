package graft.sources

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * [[AudioWindowIndex]]) shape of the shared [[MaintainedIndex]]
  * protocol, NOT [[ModalityIndex]]'s banded one, deliberately. Scene
  * matching is EXACT md5 equality, so LSH banding buys no recall; and
  * a video carries MANY scene fingerprints, which the banded table's
  * (bk, media_id) merge key cannot hold — two scenes of one clip
  * colliding on a 16-bit band slice would silently collapse to one
  * row, exactly the class of quiet drift a maintained index must
  * exclude by construction. Keying by (fp, media_id, sc) makes every
  * row a distinct fact, so the protocol's netting applies verbatim
  * (kept scenes net to zero; dropped scenes tombstone). Exactly-once
  * rides the shared txn-tag protocol; [[startMaintenance]] is the
  * turnkey stream. SceneIndexSpec pins maintained ≡ recomputed across
  * insert/update/delete commits, replay rejection, and a checkpoint
  * restart; q187/q188 oracle-gate the reads against an engine that
  * never saw the index. */
object SceneIndex extends MaintainedIndex {

  private[graft] val PollScope = "scene-refresh-poll"

  protected def bucketKey: String = "fp"
  protected def mergeKeyCols: Seq[String] = Seq("fp", "media_id", "sc")
  protected def facts(docs: DataFrame): DataFrame = scenes(docs)

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

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, fp, media_id, sc, alive). */
  def computeSceneIndex(docs: DataFrame): DataFrame = computeIndexOf(docs)

  /** Bootstrap from a corpus snapshot. */
  def bootstrapSceneIndex(docs: DataFrame, idxRoot: String): Int =
    bootstrapIndex(docs, idxRoot)

  /** Apply ONE corpus version's CDC events (preimages required; the
    * videos derive from doc_id and n_chars = length(text), so a
    * preimage regenerates exactly the scene rows its commit added). */
  def maintainSceneIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int =
    maintainIndex(changes, idxRoot, tag)

  // applyBatch / refresh / startMaintenance: [[MaintainedIndex]].

  // ------------------------------------------------------------- reads

  /** Live (fp, media_id) scene facts — tombstones filtered, the ordinal
    * dropped (it exists for the merge key; two identical scenes in one
    * clip still count ONCE downstream, q180's DISTINCT contract). */
  def readSceneIndex(spark: SparkSession, idxRoot: String): DataFrame =
    readLiveRows(spark, idxRoot)
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
      .select(col("fp"), col("media_id")).distinct().localCheckpoint(eager = false)
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
