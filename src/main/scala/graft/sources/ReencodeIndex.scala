package graft.sources

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained RE-ENCODE-ROBUST scene index — the banded
  * keyframe-aHash table behind q189's question ("is this clip
  * re-encoded footage of a committed clip"), maintained from the
  * document table's CDC stream. [[SceneIndex]] stores EXACT keyframe
  * hashes, so it finds re-posted identical bytes but is structurally
  * blind to a re-encode (different quant rounding, every pixel ±1);
  * this table stores each keyframe's 64-bit aHash as four (band,
  * value) rows, so the match survives the re-encode while q189's
  * Hamming ≤ 3 rescore keeps precision. Without it every
  * re-encode-dedup run re-decodes the whole video corpus — at 100 TB
  * decode is the pipeline's most expensive per-byte stage, and a
  * corpus commit here decodes only its CHANGED docs' clips.
  *
  * KEY CHOICE: rows are keyed (bk, media_id, sc) — NOT
  * [[ModalityIndex]]'s (bk, media_id) — because a clip carries MANY
  * keyframes and two of them colliding on one 16-bit band slice must
  * stay two facts, not silently collapse ([[SceneIndex]]'s argument,
  * applied to the banded shape). Each row carries the full (hi, lo)
  * for verdict-time Hamming rescoring plus the exact dim-qualified
  * keyframe hash `fp` — the read reports `n_exact_shared` from it, so
  * every maintained pair carries the exact-family blindness witness
  * in-row exactly as q189 does. An update that keeps a band's key but
  * changes the keyframe engages the shared [[MaintainedIndex]]
  * protocol's live-row-wins collapse. Exactly-once rides the shared
  * txn-tag protocol; [[startMaintenance]] is the turnkey stream.
  * RobustIndexSpec pins maintained ≡ recomputed across
  * insert/update/delete commits and replay rejection; q191/q193
  * oracle-gate the reads against an engine that never saw the
  * index. */
object ReencodeIndex extends MaintainedIndex {

  private[graft] val PollScope = "reencode-refresh-poll"

  protected def bucketKey: String = "bk"
  protected def mergeKeyCols: Seq[String] = Seq("bk", "media_id", "sc")
  override protected def payloadCols: Seq[String] = Seq("fp", "hi", "lo")
  protected def facts(docs: DataFrame): DataFrame = bandFacts(docs)

  /** Every scene keyframe of a (doc_id, n_chars) frame's re-encode
    * videos as banded aHash rows (bk, media_id, sc, fp, hi, lo) —
    * derived through q189's own generator, keyframe rule, hash and
    * 4×16 banding, so the maintained index and the single-shot query
    * cannot drift. bk = band·2¹⁶ + 16-bit slice. */
  private[graft] def bandFacts(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val fr = Multimodal
      .videosWithReencodesFromDocs(docs.select(col("doc_id"), col("n_chars")))
      .flatMap { m =>
        Multimodal.sceneKeyframeFrames(m.data).zipWithIndex.map {
          case ((w, h, px), sc) =>
            val (hi, lo, _) = Multimodal.ahash64(w.toInt, h.toInt, px)
            (m.media_id, sc.toLong, s"${w}x$h:" + px.mkString(","), hi, lo)
        }
      }.toDF("media_id", "sc", "key", "hi", "lo")
      .select(col("media_id"), col("sc"), md5(col("key")).as("fp"),
        col("hi"), col("lo"))
    fr.select(col("media_id"), col("sc"), col("fp"), col("hi"), col("lo"),
        explode(array(
          struct(lit(0L).as("b"), col("lo").bitwiseAND(65535L).as("v")),
          struct(lit(1L).as("b"), shiftright(col("lo"), 16).bitwiseAND(65535L).as("v")),
          struct(lit(2L).as("b"), col("hi").bitwiseAND(65535L).as("v")),
          struct(lit(3L).as("b"), shiftright(col("hi"), 16).bitwiseAND(65535L).as("v"))))
          .as("band"))
      .select((col("band.b") * 65536L + col("band.v")).as("bk"),
        col("media_id"), col("sc"), col("fp"), col("hi"), col("lo"))
  }

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, bk, media_id, sc, fp, hi, lo, alive). */
  def computeReencodeIndex(docs: DataFrame): DataFrame = computeIndexOf(docs)

  /** Bootstrap from a corpus snapshot. */
  def bootstrapReencodeIndex(docs: DataFrame, idxRoot: String): Int =
    bootstrapIndex(docs, idxRoot)

  /** Apply ONE corpus version's CDC events (preimages required; the
    * clips derive from doc_id and n_chars = length(text), so a
    * preimage regenerates exactly the band rows its commit added). */
  def maintainReencodeIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int =
    maintainIndex(changes, idxRoot, tag)

  // applyBatch / refresh / startMaintenance: [[MaintainedIndex]].

  // ------------------------------------------------------------- reads

  /** Live band rows — tombstones filtered. */
  def readReencodeIndex(spark: SparkSession, idxRoot: String): DataFrame =
    readLiveRows(spark, idxRoot)

  /** q191's report: q189's re-encode pairs from STORED band rows — the
    * banded-Hamming keyframe match with the exact-hash blindness
    * witness, no payload decoded. Hot bk keys are dropped at
    * [[Multimodal.ModalityBandCap]] before the self-join (slates and
    * black frames concentrate one band on a real crawl), mirroring
    * q189's own cap. */
  def maintainedReencodedDups(spark: SparkSession, idxRoot: String): DataFrame = {
    val rows = Multimodal.dropHotKeys(
      readReencodeIndex(spark, idxRoot), Seq("bk"), Multimodal.ModalityBandCap)
    rows.as("x").join(rows.as("y"),
        col("x.bk") === col("y.bk") && col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_id_a"),
        col("y.media_id").as("media_id_b"),
        col("x.fp").as("fp_a"), col("y.fp").as("fp_b"),
        (bit_count(col("x.hi").bitwiseXOR(col("y.hi"))) +
          bit_count(col("x.lo").bitwiseXOR(col("y.lo")))).as("hamming"))
      .where(col("hamming") <= 3)
      .distinct()
      .groupBy(col("media_id_a"), col("media_id_b"))
      .agg(countDistinct(col("fp_a")).as("n_similar_scenes"),
        countDistinct(when(col("fp_a") === col("fp_b"), col("fp_a")))
          .as("n_exact_shared"),
        max(col("hamming")).cast("long").as("max_hamming"))
  }

  /** q193's probe: which COMMITTED videos is an ARRIVING doc batch
    * re-encoded footage of — batch-sized decode, a bucket-pruned index
    * read on the batch keyframes' band keys, Hamming rescore on stored
    * fingerprints. The corpus video is never re-decoded and the index
    * never scanned. */
  def probeReencodes(batch: DataFrame, spark: SparkSession,
      idxRoot: String): DataFrame = {
    val probe = bandFacts(batch).localCheckpoint(eager = false)
    // the CORPUS side is what concentrates (slates, black frames) —
    // cap its per-bk membership; the arriving batch is batch-sized
    val committed = Multimodal.dropHotKeys(
      ManifestTable
        .readKeyPruned(spark, idxRoot, "bk", IndexBuckets, probe.select(col("bk")))
        .where(col("alive")),
      Seq("bk"), Multimodal.ModalityBandCap)
    probe.select(col("bk"), col("media_id").as("media_id_probe"),
        col("fp").as("fp_p"), col("hi").as("hi_p"), col("lo").as("lo_p"))
      .join(committed.select(col("bk"), col("media_id").as("media_id_corpus"),
        col("fp").as("fp_c"), col("hi").as("hi_c"), col("lo").as("lo_c")),
        Seq("bk"))
      .select(col("media_id_probe"), col("media_id_corpus"),
        col("fp_p"), col("fp_c"),
        (bit_count(col("hi_p").bitwiseXOR(col("hi_c"))) +
          bit_count(col("lo_p").bitwiseXOR(col("lo_c")))).as("hamming"))
      .where(col("hamming") <= 3)
      .distinct()
      .groupBy(col("media_id_probe"), col("media_id_corpus"))
      .agg(countDistinct(col("fp_p")).as("n_similar_scenes"),
        max(col("hamming")).cast("long").as("max_hamming"))
  }
}
