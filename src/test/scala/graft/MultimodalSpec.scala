package graft

import graft.multimodal.{MediaRecord, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the typed mapPartitions pipeline agrees with the
  * SQL surface, and the stub codec stages behave. */
class MultimodalSpec extends SparkSpec {

  test("extractFeatures (mapPartitions) matches the SQL-surface query on hash+length") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val viaDs = Multimodal.extractFeatures(media)
      .select($"media_id", $"payload_len", $"content_hash")
    val viaSql = Multimodal.q37MediaFeatures(spark, sf0001)
      .select($"media_id", $"payload_len", $"content_hash")
    assert(viaDs.except(viaSql).count() === 0)
    assert(viaSql.except(viaDs).count() === 0)
  }

  test("decode stub: deterministic features from bytes") {
    val f = Multimodal.Codecs.decodeFeatures("abc".getBytes)
    assert(f.toSeq === Seq(3.0, (97 + 98 + 99) / 3.0, 97.0, 99.0))
    assert(Multimodal.Codecs.decodeFeatures(Array.emptyByteArray).toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("resize/frameSample stubs: batch shapes") {
    assert(Multimodal.Codecs.resize("abcdef".getBytes, 3).toSeq === "abc".getBytes.toSeq)
    assert(Multimodal.Codecs.frameSample("abcdef".getBytes, 2).toSeq === "ace".getBytes.toSeq)
  }

  test("binary payloads roundtrip through parquet and features survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media").toString + "/t"
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    media.write.partitionBy("kind").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaRecord]
    assert(back.count() === media.count())
    val origFeats = Multimodal.extractFeatures(media)
      .select($"media_id", $"content_hash")
    val backFeats = Multimodal.extractFeatures(back)
      .select($"media_id", $"content_hash")
    assert(origFeats.except(backFeats).count() === 0) // bytes identical after roundtrip
  }

  test("metadata-only reads never touch the payload column (column pruning)") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001).toDF()
    val plan = media.select("media_id", "kind").queryExecution.optimizedPlan.toString
    assert(!plan.contains("data#") || !plan.toLowerCase.contains("cast(text"),
      s"payload column should be pruned from metadata-only scan:\n$plan")
  }
}
