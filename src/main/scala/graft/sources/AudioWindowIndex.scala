package graft.sources

import graft.multimodal.{MediaHeaders, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained AUDIO WINDOW-FINGERPRINT index — the
  * exact-fact shape of the shared [[MaintainedIndex]] protocol on PCM:
  * one hash-bucketed ManifestTable of (fp → media_id, w) rows, where
  * fp is the md5 of a 64-sample/hop-32 window (q175's local
  * fingerprint), updated from the document table's CDC stream. The
  * [[ModalityIndex]] answers "is this clip a near-duplicate"
  * (whole-clip banded Hamming); this index answers the question that
  * family is structurally blind to — "is this clip the SAME RECORDING
  * up to a trim" — without re-decoding a single committed payload: a
  * corpus commit re-windows only its CHANGED docs' clips, and probing
  * an arriving batch reads only the batch windows' fp-bucket
  * partitions. At 100 TB the alternative is a full audio-corpus
  * re-decode per trim-dedup run.
  *
  * Rows are exact facts keyed by (fp, media_id, w) — the protocol's
  * netting applies verbatim (an update's kept windows net to zero and
  * are not rewritten; dropped windows tombstone). Exactly-once rides
  * the shared txn-tag protocol; [[startMaintenance]] is the turnkey
  * stream. AudioWindowIndexSpec pins maintained ≡ recomputed across
  * insert/update/delete commits, replay rejection, and a checkpoint
  * restart of the stream; q183/q184 oracle-gate the reads against an
  * engine that never saw the index. */
object AudioWindowIndex extends MaintainedIndex {

  /** q176's pair gate: a pair is a trim when ≥ 4 windows match. */
  val MinSharedWindows = 4

  private[graft] val PollScope = "audiowin-refresh-poll"

  protected def bucketKey: String = "fp"
  protected def mergeKeyCols: Seq[String] = Seq("fp", "media_id", "w")
  protected def facts(docs: DataFrame): DataFrame = windows(docs)

  /** Every hop-32 window of a (doc_id, n_chars) frame's clips as
    * (fp, media_id, w) — the exact rows q175/q176 derive on the fly,
    * through the same generator and window grid. */
  private[graft] def windows(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Multimodal.trimmedAudioFromDocs(docs.select(col("doc_id"), col("n_chars")))
      .flatMap { m =>
        val pcm = MediaHeaders.wavSamples(m.data)
        Multimodal.pcmWindows(pcm).map { case (w, csv) => (m.media_id, w.toLong, csv) }
      }.toDF("media_id", "w", "csv")
      .select(md5(col("csv")).as("fp"), col("media_id"), col("w"))
  }

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, fp, media_id, w, alive). */
  def computeAudioWindowIndex(docs: DataFrame): DataFrame = computeIndexOf(docs)

  /** Bootstrap from a corpus snapshot. */
  def bootstrapAudioWindowIndex(docs: DataFrame, idxRoot: String): Int =
    bootstrapIndex(docs, idxRoot)

  /** Apply ONE corpus version's CDC events (preimages required; the
    * clips derive from doc_id and n_chars = length(text), so a
    * preimage regenerates exactly the window rows its commit added). */
  def maintainAudioWindowIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int =
    maintainIndex(changes, idxRoot, tag)

  // applyBatch / refresh / startMaintenance: [[MaintainedIndex]].

  // ------------------------------------------------------------- reads

  /** Live (fp, media_id, w) window rows — tombstones filtered. */
  def readAudioWindowIndex(spark: SparkSession, idxRoot: String): DataFrame =
    readLiveRows(spark, idxRoot)

  /** q183's report: the corpus's TRIMMED-duplicate pairs from stored
    * window rows — q176's question without the decode: clips pair when
    * ≥ [[MinSharedWindows]] window fingerprints match, with the
    * recovered trim offset (constant across a true trim — n_offsets
    * pins it). No payload is read; only fingerprint rows join. */
  def maintainedTrimmedDups(spark: SparkSession, idxRoot: String): DataFrame = {
    // digital silence shares one window md5 across a whole crawl — drop
    // fps above the cap before the self-join (VERDICT r16 #1), the same
    // gate the batch query (q176) applies
    val rows = Multimodal.dropHotKeys(
      readAudioWindowIndex(spark, idxRoot), Seq("fp"), Multimodal.ExactFpCap)
    rows.as("a").join(rows.as("b"),
        col("a.fp") === col("b.fp") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id"), col("b.media_id"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("b.w") - col("a.w")).as("offset_w"),
        countDistinct(col("b.w") - col("a.w")).as("n_offsets"))
      .where(col("n_shared") >= MinSharedWindows)
      .select(col("a.media_id").as("media_id_a"),
        col("b.media_id").as("media_id_b"),
        col("n_shared"), col("offset_w"), col("n_offsets"))
  }

  /** q184's probe: which COMMITTED recordings does an ARRIVING doc
    * batch duplicate up to a trim — batch-sized decode, a bucket-pruned
    * index read on the batch windows' fingerprints, and the same
    * ≥ [[MinSharedWindows]] gate. The corpus audio is never
    * re-decoded and the index is never scanned. */
  def probeTrims(batch: DataFrame, spark: SparkSession,
      idxRoot: String): DataFrame = {
    val probe = windows(batch).localCheckpoint(eager = false)
    // cap the CORPUS side's per-fp membership (silence concentration
    // lives there; the arriving batch is batch-sized by contract)
    val committed = Multimodal.dropHotKeys(
      ManifestTable
        .readKeyPruned(spark, idxRoot, "fp", IndexBuckets, probe.select(col("fp")))
        .where(col("alive")),
      Seq("fp"), Multimodal.ExactFpCap)
      .select(col("fp"), col("media_id").as("media_id_corpus"),
        col("w").as("w_c"))
    probe.select(col("fp"), col("media_id").as("media_id_probe"),
        col("w").as("w_p"))
      .join(committed, Seq("fp"))
      .groupBy(col("media_id_probe"), col("media_id_corpus"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("w_c") - col("w_p")).as("offset_w"))
      .where(col("n_shared") >= MinSharedWindows)
  }
}
