package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + typed metadata. At 100 TB the `data`
  * column dominates storage; metadata columns are tiny and always readable
  * without touching the blobs (parquet column pruning). */
case class MediaRecord(
    media_id: Long,
    kind: String, // image | audio | video
    data: Array[Byte],
    width: Int,
    height: Int,
    duration_ms: Long)

/** Decoded features for a media record. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    payload_len: Long,
    content_hash: String,
    feature: Array[Double])

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * [[Codecs]] derives deterministic fake features from the payload bytes.
  * Everything around the stub — schema, Dataset encoders, per-partition
  * batching, partition sizing — is the real distributed plumbing: swap
  * `Codecs.decodeFeatures` for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** STUB codec layer — deterministic fakes standing in for real decoders. */
  object Codecs {
    /** Stand-in for image decode + feature extraction: 4 pseudo-features
      * from stable byte statistics. Deterministic, so specs and oracles
      * can pin outputs. */
    def decodeFeatures(data: Array[Byte]): Array[Double] = {
      if (data.isEmpty) Array.fill(4)(0.0)
      else {
        val n = data.length.toDouble
        val sum = data.foldLeft(0L)((a, b) => a + (b & 0xff))
        Array(n, sum / n, (data.head & 0xff).toDouble, (data.last & 0xff).toDouble)
      }
    }

    /** Stand-in for resize: truncate payload to `maxBytes`. */
    def resize(data: Array[Byte], maxBytes: Int): Array[Byte] = data.take(maxBytes)

    /** Stand-in for video frame sampling: every `stride`-th byte. */
    def frameSample(data: Array[Byte], stride: Int): Array[Byte] =
      data.indices.by(stride).map(data).toArray
  }

  /** Fabricate a media table from `documents` (payload = utf-8 bytes of
    * text) — the testdata has no binary column, so the plumbing is proven
    * on synthetic-but-real bytes. */
  def mediaFromDocuments(s: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables(s, sfDir, "documents")
      .select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("kind"),
        $"text".cast("binary").as("data"),
        ($"n_chars" % 1920).cast("int").as("width"),
        ($"n_chars" % 1080).cast("int").as("height"),
        ($"n_chars" * 40L).as("duration_ms"))
      .as[MediaRecord]
  }

  /** Decode + feature-extract via mapPartitions: the codec is invoked once
    * per row but initialized once per PARTITION (the expensive part for
    * real codecs) — the Spark-idiomatic batch shape for a native library.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: one digest instance (and, in production, one
      // codec context) per task, reset per row — not re-created per row
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val feats = Codecs.decodeFeatures(r.data)
        md.reset()
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          payload_len = r.data.length.toLong,
          content_hash = md.digest(r.data).map("%02x".format(_)).mkString,
          feature = feats)
      }
    }
  }

  /** The oracle-checkable face of the pipeline: payload length, content
    * hash, and byte-statistic features — expressed with built-in
    * expressions (the mapPartitions path above is spec-tested for
    * equivalence in MultimodalSpec). */
  def q37MediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaFromDocuments(s, d).toDF()
      .select($"media_id", $"kind",
        length($"data").cast("long").as("payload_len"),
        md5($"data").as("content_hash"),
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"duration_ms")
  }

  val q37Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(length(text) AS BIGINT) AS payload_len,
      |  md5(text) AS content_hash,
      |  CAST(n_chars % 1920 AS BIGINT) AS width,
      |  CAST(n_chars % 1080 AS BIGINT) AS height,
      |  n_chars * 40 AS duration_ms
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_media_features" -> (q37MediaFeatures _))

  val oracleSql: Map[String, String] = Map(
    "q37_media_features" -> q37Sql)
}
