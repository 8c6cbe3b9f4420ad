package graft

import graft.streaming.EventStream
import java.io.File
import java.nio.file.Files

/** Failure-injected coverage for the merge sink's checked stage-then-swap
  * commit protocol: interrupted swaps are repaired, stale staging debris
  * is ignored, and re-delivery converges (idempotent upsert). */
class MergeSinkSpec extends SparkSpec {

  private def table(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def readSink(path: String): Set[(Long, String)] =
    spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSet

  test("merge sink recovers a swap that crashed between the two renames") {
    val dir = Files.createTempDirectory("graft-mergesink").toString
    val sink = s"$dir/silver"
    EventStream.mergeIntoParquet(table(Seq(1L -> "a", 2L -> "b")), sink, Seq("id"))
    // simulate the crash window: target was parked to .old, the staged
    // promotion never happened, and a half-written staging dir remains
    assert(new File(sink).renameTo(new File(sink + ".old")))
    Files.createDirectories(new File(sink + ".staging").toPath)
    Files.writeString(new File(sink + ".staging/part-garbage").toPath, "not parquet")

    EventStream.mergeIntoParquet(table(Seq(2L -> "B", 3L -> "c")), sink, Seq("id"))
    assert(readSink(sink) == Set(1L -> "a", 2L -> "B", 3L -> "c"))
    assert(!new File(sink + ".old").exists())
    assert(!new File(sink + ".staging").exists())
  }

  test("merge sink re-delivery of the same batch converges (idempotent)") {
    val dir = Files.createTempDirectory("graft-mergesink2").toString
    val sink = s"$dir/silver"
    val batch = table(Seq(1L -> "a", 2L -> "b"))
    EventStream.mergeIntoParquet(batch, sink, Seq("id"))
    val first = readSink(sink)
    EventStream.mergeIntoParquet(batch, sink, Seq("id"))
    assert(readSink(sink) == first)
  }
}
