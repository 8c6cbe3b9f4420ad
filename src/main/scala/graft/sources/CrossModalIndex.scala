package graft.sources

import graft.multimodal.{MediaHeaders, Multimodal}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained CROSS-MODAL image index — the aHash band
  * table for q195's content-keyed captioned images, maintained from
  * the document table's CDC stream. q195/q196 re-shingle the corpus
  * (for caption candidates AND image seeds) and re-derive every image
  * per run; with this table plus the text family's maintained band
  * index ([[DedupIndex]]), the cross-modal report (q197) and the
  * arriving-batch probe (q198) run entirely from STORED rows — at
  * 100 TB the caption re-shingle and the image decode+hash are both
  * corpus-sized recomputes this pair of tables deletes.
  *
  * Facts derive from the TEXT (the seed is the caption's own MinHash
  * slice h0), so maintenance re-reads only changed docs' text — an
  * edit that keeps the caption's minimum shingle hash keeps the image
  * and nets to zero. One image per doc, so [[ModalityIndex]]'s
  * (bk, media_id) merge key and the shared [[MaintainedIndex]]
  * protocol's live-row-wins collapse apply verbatim. Exactly-once
  * rides the shared txn-tag protocol; [[startMaintenance]] is the
  * turnkey stream. CrossModalIndexSpec pins maintained ≡ recomputed
  * across insert/update/delete commits and replay rejection;
  * q197/q198 oracle-gate the reads against an engine that never saw
  * either index. */
object CrossModalIndex extends MaintainedIndex {

  private[graft] val PollScope = "crossmodal-refresh-poll"

  protected def bucketKey: String = "bk"
  protected def mergeKeyCols: Seq[String] = Seq("bk", "media_id")
  override protected def payloadCols: Seq[String] = Seq("hi", "lo")
  // the image derives from the caption's own shingle hashes — the fact
  // generator needs the text itself, not just its length
  override protected def changeCols: Seq[Column] =
    Seq(col("doc_id"), col("text"))
  protected def facts(docs: DataFrame): DataFrame = bandFacts(docs)

  /** The banded aHash rows of a (doc_id, text) frame's captioned
    * images: (bk, media_id, hi, lo), bk = band·2¹⁶ + 16-bit slice —
    * derived through q195's own generator (seed = caption h0), PNG
    * round-trip and hash, so the maintained index and the single-shot
    * queries cannot drift. */
  private[graft] def bandFacts(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Multimodal.captionedImagesFromDocs(docs.select(col("doc_id"), col("text")))
      .flatMap { m =>
        MediaHeaders.pngPixels(m.data).map { case (w, h, px) =>
          val (hi, lo, _) = Multimodal.ahash64(w.toInt, h.toInt, px)
          (m.media_id, hi, lo)
        }
      }.toDF("media_id", "hi", "lo")
      .select(col("media_id"), col("hi"), col("lo"),
        explode(array(
          struct(lit(0L).as("b"), col("lo").bitwiseAND(65535L).as("v")),
          struct(lit(1L).as("b"), shiftright(col("lo"), 16).bitwiseAND(65535L).as("v")),
          struct(lit(2L).as("b"), col("hi").bitwiseAND(65535L).as("v")),
          struct(lit(3L).as("b"), shiftright(col("hi"), 16).bitwiseAND(65535L).as("v"))))
          .as("band"))
      .select((col("band.b") * 65536L + col("band.v")).as("bk"),
        col("media_id"), col("hi"), col("lo"))
  }

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, bk, media_id, hi, lo, alive). */
  def computeCrossModalIndex(docs: DataFrame): DataFrame = computeIndexOf(docs)

  /** Bootstrap from a corpus snapshot. */
  def bootstrapCrossModalIndex(docs: DataFrame, idxRoot: String): Int =
    bootstrapIndex(docs, idxRoot)

  /** Apply ONE corpus version's CDC events (preimages required; the
    * image derives from the TEXT's h0, so a preimage regenerates
    * exactly the band rows its commit added). */
  def maintainCrossModalIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int =
    maintainIndex(changes, idxRoot, tag)

  // applyBatch / refresh / startMaintenance: [[MaintainedIndex]].

  // ------------------------------------------------------------- reads

  /** Live band rows — tombstones filtered. */
  def readCrossModalIndex(spark: SparkSession, idxRoot: String): DataFrame =
    readLiveRows(spark, idxRoot)

  /** The classification shared by the report and the probe. */
  private def classify(img: DataFrame, cap: DataFrame,
      a: String, b: String): DataFrame =
    img.join(cap, Seq(a, b), "full_outer")
      .select(col(a), col(b),
        coalesce(col("image_dup"), lit(false)).as("image_dup"),
        coalesce(col("caption_dup"), lit(false)).as("caption_dup"))
      .withColumn("relation",
        when(col("image_dup") && col("caption_dup"), "dup_pair")
          .when(col("image_dup"), "recaptioned")
          .otherwise("reillustrated"))

  /** q197's report: q195's cross-modal classification from STORED rows
    * only — image pairs from this index's band rows (hot bk keys
    * dropped at [[Multimodal.ModalityBandCap]], Hamming ≤ 3 rescore on
    * stored fingerprints), caption pairs from the text family's
    * maintained band index self-joined on its stored (band, bucket)
    * keys and restricted to image-carrying docs. Nothing is
    * re-shingled and no image is re-derived. */
  def maintainedCrossModalPairs(spark: SparkSession, xmIdxRoot: String,
      bandIdxRoot: String): DataFrame = {
    val rows = Multimodal.dropHotKeys(
      readCrossModalIndex(spark, xmIdxRoot), Seq("bk"), Multimodal.ModalityBandCap)
    val img = rows.as("x").join(rows.as("y"),
        col("x.bk") === col("y.bk") && col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("doc_a"), col("y.media_id").as("doc_b"),
        (bit_count(col("x.hi").bitwiseXOR(col("y.hi"))) +
          bit_count(col("x.lo").bitwiseXOR(col("y.lo")))).as("hamming"))
      .where(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b")).distinct()
      .withColumn("image_dup", lit(true))
    val bands = DedupIndex.readBandIndex(spark, bandIdxRoot)
    val cap = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .where(Multimodal.hasImage(col("a.doc_id")) &&
        Multimodal.hasImage(col("b.doc_id")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .withColumn("caption_dup", lit(true))
    classify(img, cap, "doc_a", "doc_b")
  }

  /** q198's probe: classify an ARRIVING doc batch against the
    * committed corpus — which committed captioned images does the
    * batch duplicate, and in which modality. Batch-sized work on both
    * arms (the batch is shingled once for its band rows and its image
    * seeds; its band keys prune this index's read to their own
    * buckets; the caption side is [[DedupIndex.probeNearDup]]'s
    * unhinted equi-join shape against stored rows). The corpus is
    * never re-shingled and no committed image is re-derived. */
  def probeCrossModal(batch: DataFrame, spark: SparkSession,
      xmIdxRoot: String, bandIdxRoot: String): DataFrame = {
    val probe = bandFacts(batch).localCheckpoint(eager = false)
    val committed = Multimodal.dropHotKeys(
      ManifestTable
        .readKeyPruned(spark, xmIdxRoot, "bk", IndexBuckets, probe.select(col("bk")))
        .where(col("alive")),
      Seq("bk"), Multimodal.ModalityBandCap)
    val img = probe.select(col("bk"), col("media_id").as("doc_probe"),
        col("hi").as("hi_p"), col("lo").as("lo_p"))
      .join(committed.select(col("bk"), col("media_id").as("doc_corpus"),
        col("hi").as("hi_c"), col("lo").as("lo_c")), Seq("bk"))
      .select(col("doc_probe"), col("doc_corpus"),
        (bit_count(col("hi_p").bitwiseXOR(col("hi_c"))) +
          bit_count(col("lo_p").bitwiseXOR(col("lo_c")))).as("hamming"))
      .where(col("hamming") <= 3)
      .select(col("doc_probe"), col("doc_corpus")).distinct()
      .withColumn("image_dup", lit(true))
    val cap = graft.functions.TextOps.bandRowsOf(batch)
      .where(Multimodal.hasImage(col("doc_id"))).as("a")
      .join(DedupIndex.readBandIndex(spark, bandIdxRoot)
        .where(Multimodal.hasImage(col("doc_id"))).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("doc_probe"), col("b.doc_id").as("doc_corpus"))
      .distinct()
      .withColumn("caption_dup", lit(true))
    classify(img, cap, "doc_probe", "doc_corpus")
  }
}
