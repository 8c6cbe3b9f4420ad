package graft

import graft.sources.ManifestTable
import java.io.File
import java.nio.file.{Files, Paths}

/** The manifest-committed table's transactional contract: atomic
  * visibility, crash tolerance, snapshot isolation, idempotent merge,
  * vacuum safety. */
class ManifestTableSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def readSet(root: String): Set[(Long, String)] =
    ManifestTable.read(spark, root).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSet

  test("merge commits new snapshots; old versions stay readable (time travel)") {
    val root = Files.createTempDirectory("graft-manifest").toString
    ManifestTable.merge(df(1L -> "a", 2L -> "b"), root, Seq("id"))
    ManifestTable.merge(df(2L -> "B", 3L -> "c"), root, Seq("id"))
    assert(ManifestTable.currentVersion(root) == 2)
    assert(readSet(root) == Set(1L -> "a", 2L -> "B", 3L -> "c"))
    val v1 = ManifestTable.readVersion(spark, root, 1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1 == Set(1L -> "a", 2L -> "b"))
  }

  test("a crashed writer leaves the table unbroken: readers still see the last commit") {
    val root = Files.createTempDirectory("graft-manifest2").toString
    ManifestTable.merge(df(1L -> "a"), root, Seq("id"))
    // simulate a writer that died AFTER writing data+manifest for v2 but
    // BEFORE the atomic pointer swap (plus a stale tmp pointer)
    Files.createDirectories(Paths.get(root, "data/v2"))
    Files.writeString(Paths.get(root, "data/v2/part-dead.parquet"), "half-written garbage")
    Files.writeString(Paths.get(root, "manifest-v2.json"), "data/v2/part-dead.parquet")
    Files.writeString(Paths.get(root, "_current.tmp-v2"), "2")

    assert(ManifestTable.currentVersion(root) == 1) // pointer never moved
    assert(readSet(root) == Set(1L -> "a"))
    // the next writer simply commits over the debris
    ManifestTable.merge(df(2L -> "b"), root, Seq("id"))
    assert(readSet(root) == Set(1L -> "a", 2L -> "b"))
  }

  test("merge is idempotent: re-delivering a batch yields an identical snapshot") {
    val root = Files.createTempDirectory("graft-manifest3").toString
    val batch = df(1L -> "a", 2L -> "b")
    ManifestTable.merge(batch, root, Seq("id"))
    val first = readSet(root)
    ManifestTable.merge(batch, root, Seq("id"))
    assert(ManifestTable.currentVersion(root) == 2)
    assert(readSet(root) == first)
  }

  test("streaming upsert commits one snapshot per micro-batch through the transactional sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-manifest-stream").toString
    val root = s"$dir/t"
    val ckpt = s"$dir/ckpt" // checkpoint = micro-batches carry only NEW data
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> "a", 2L -> "b")
    EventStream.upsertSinkTransactional(mem.toDF().toDF("id", "v"), root, Seq("id"))
      .option("checkpointLocation", ckpt)
      .start().processAllAvailable()
    assert(readSet(root) == Set(1L -> "a", 2L -> "b"))
    val v1 = ManifestTable.currentVersion(root)
    mem.addData(2L -> "B", 3L -> "c")
    EventStream.upsertSinkTransactional(mem.toDF().toDF("id", "v"), root, Seq("id"))
      .option("checkpointLocation", ckpt)
      .start().processAllAvailable()
    assert(ManifestTable.currentVersion(root) > v1)
    assert(readSet(root) == Set(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("vacuum keeps the newest snapshots readable and drops unreferenced files") {
    val root = Files.createTempDirectory("graft-manifest4").toString
    ManifestTable.merge(df(1L -> "a"), root, Seq("id"))
    ManifestTable.merge(df(2L -> "b"), root, Seq("id"))
    ManifestTable.merge(df(3L -> "c"), root, Seq("id"))
    ManifestTable.vacuum(root, keepVersions = 1)
    assert(readSet(root) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(!new File(s"$root/data/v1").exists() || new File(s"$root/data/v1").listFiles().isEmpty)
    assert(Files.notExists(Paths.get(root, "manifest-v1.json")))
    assert(Files.exists(Paths.get(root, "manifest-v3.json")))
  }
}
