package graft.sources

import graft.multimodal.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * changes the keyframe nets the old payload out and the live row
  * wins the merge key ([[ModalityIndex]]'s collapse). Exactly-once
  * rides the shared txn-tag protocol; [[startMaintenance]] is the
  * turnkey stream. RobustIndexSpec pins maintained ≡ recomputed
  * across insert/update/delete commits and replay rejection;
  * q191/q193 oracle-gate the reads against an engine that never saw
  * the index. */
object ReencodeIndex {

  /** Same bucket count/role as [[DedupIndex.IndexBuckets]]. */
  val IndexBuckets = 16

  private[graft] val PollScope = "reencode-refresh-poll"

  private def sign: Column = when(
    col("_change_type").isin("insert", "update_postimage"), 1L)
    .when(col("_change_type").isin("delete", "update_preimage"), -1L)

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

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", ManifestTable.bucketIdColumn(col("bk"), IndexBuckets))

  /** The index of a corpus snapshot — bootstrap and spec ground truth:
    * (bucket, bk, media_id, sc, fp, hi, lo, alive). */
  def computeReencodeIndex(docs: DataFrame): DataFrame =
    withBucket(bandFacts(docs).withColumn("alive", lit(true)))
      .select(col("bucket"), col("bk"), col("media_id"), col("sc"),
        col("fp"), col("hi"), col("lo"), col("alive"))

  /** Bootstrap from a corpus snapshot. */
  def bootstrapReencodeIndex(docs: DataFrame, idxRoot: String): Int = {
    ManifestTable.declareBuckets(idxRoot, "bk", IndexBuckets)
    ManifestTable.mergePartitioned(computeReencodeIndex(docs), idxRoot,
      Seq("bucket", "bk", "media_id", "sc"), "bucket")
  }

  /** Apply ONE corpus version's CDC events (preimages required; the
    * clips derive from doc_id and n_chars = length(text), so a
    * preimage regenerates exactly the band rows its commit added). */
  def maintainReencodeIndex(spark: SparkSession, changes: DataFrame,
      idxRoot: String, tag: Option[String] = None): Int = {
    if (changes.isEmpty) return ManifestTable.currentVersion(idxRoot)
    val signed = changes.where(sign.isNotNull)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        sign.as("__sgn"))
    def rows(sgn: Long): DataFrame = bandFacts(
      signed.where(col("__sgn") === sgn).select(col("doc_id"), col("n_chars")))
    val d = rows(1L).withColumn("net", lit(1L))
      .union(rows(-1L).withColumn("net", lit(-1L)))
      .groupBy(col("bk"), col("media_id"), col("sc"),
        col("fp"), col("hi"), col("lo"))
      .agg(sum(col("net")).as("net"))
      .where(col("net") =!= 0L)
      // collapse to one row per merge key: an update that keeps a
      // band's (bk, sc) but changes the keyframe nets −1 on the old
      // payload and +1 on the new — the LIVE row must win the key
      .groupBy(col("bk"), col("media_id"), col("sc"))
      .agg(max(struct((col("net") > 0L).as("alive"),
        col("fp"), col("hi"), col("lo"))).as("r"))
      .select(col("bk"), col("media_id"), col("sc"), col("r.fp").as("fp"),
        col("r.hi").as("hi"), col("r.lo").as("lo"), col("r.alive").as("alive"))
      .localCheckpoint()
    if (d.isEmpty) return ManifestTable.currentVersion(idxRoot)
    ManifestTable.declareBuckets(idxRoot, "bk", IndexBuckets)
    ManifestTable.mergePartitioned(withBucket(d)
        .select(col("bucket"), col("bk"), col("media_id"), col("sc"),
          col("fp"), col("hi"), col("lo"), col("alive")),
      idxRoot, Seq("bucket", "bk", "media_id", "sc"), "bucket", tag = tag)
  }

  /** EXACTLY-ONCE step (the shared txn-tag protocol). */
  def applyBatch(changes: DataFrame, batchId: Long, idxRoot: String,
      scope: String = ""): Unit = {
    if (batchId <= ManifestTable.lastBatchTag(idxRoot, scope)) return
    maintainReencodeIndex(changes.sparkSession, changes.localCheckpoint(),
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

  /** Live band rows — tombstones filtered. */
  def readReencodeIndex(spark: SparkSession, idxRoot: String): DataFrame =
    ManifestTable.read(spark, idxRoot)
      .where(col("alive"))
      .select(col("bk"), col("media_id"), col("sc"), col("fp"),
        col("hi"), col("lo"))

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
    val probe = bandFacts(batch).localCheckpoint()
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
