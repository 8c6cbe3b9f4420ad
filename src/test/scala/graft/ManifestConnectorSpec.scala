package graft

import graft.sources.{ManifestFileIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The `format("graft-manifest")` connector: snapshot/time-travel
  * parity with the ManifestTable API, and — the point of the custom
  * FileIndex — file-level stats skipping driven by the PLAN'S OWN
  * pushed data filters, with exact answers regardless of pruning. */
class ManifestConnectorSpec extends SparkSpec {

  private def readFmt(root: String): DataFrame =
    spark.read.format("graft-manifest").load(root)

  /** numFiles actually scanned, from the executed plan's file-scan
    * metric (runs the query). */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("snapshot read parity with ManifestTable.read, and time travel via options") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn1").toString
    ManifestTable.merge(Seq(1L -> "a", 2L -> "b").toDF("id", "v"), root, Seq("id"))
    ManifestTable.merge(Seq(2L -> "B", 3L -> "c").toDF("id", "v"), root, Seq("id"))

    def s(df: DataFrame) = df.as[(Long, String)].collect().toSet
    assert(s(readFmt(root)) == Set(1L -> "a", 2L -> "B", 3L -> "c"))
    assert(s(readFmt(root)) == s(ManifestTable.read(spark, root)))
    assert(s(spark.read.format("graft-manifest").option("versionAsOf", "1").load(root))
      == Set(1L -> "a", 2L -> "b"))
    // timestampAsOf: the commit time of v1 resolves to v1
    val t1 = ManifestTable.history(root).find(_.version == 1).get.timestamp
    assert(s(spark.read.format("graft-manifest")
      .option("timestampAsOf", t1.toString).load(root)) == Set(1L -> "a", 2L -> "b"))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest").option("versionAsOf", "1")
        .option("timestampAsOf", t1.toString).load(root)
    }
  }

  test("a plain WHERE on a clustered table skips files from manifest stats") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn2").toString
    // 0..999 clustered into 8 range files: each file owns a ~125-wide slice
    val data = (0L until 1000L).map(i => (i, s"row$i")).toDF("x", "v")
    ManifestTable.commitClustered(data, root, "x", numFiles = 8)
    val total = readFmt(root).inputFiles.length
    assert(total >= 6, s"expected ~8 clustered files, got $total")

    val filtered = readFmt(root).where($"x" >= 250L && $"x" <= 260L)
    val n = scannedFiles(filtered)
    assert(n < total, s"expected stats pruning: scanned $n of $total files")
    assert(n <= 2, s"an 11-value range on a clustered layout should open ~1 file, got $n")
    // exactness: parity with both the bespoke API and a full-scan filter
    val expect = (250L to 260L).map(i => (i, s"row$i")).toSet
    assert(filtered.as[(Long, String)].collect().toSet == expect)
    assert(ManifestTable.readWhere(spark, root, 250L, 260L)
      .as[(Long, String)].collect().toSet == expect)
    // IN-list prunes via its [min, max] envelope on the same layout
    val in2 = readFmt(root).where($"x".isin(251L, 255L))
    assert(in2.count() == 2L)
    assert(scannedFiles(in2) <= 2)
  }

  test("strict bounds prune conservatively and stay exact row-level") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn3").toString
    ManifestTable.commitClustered(
      (0L until 400L).toDF("x").withColumn("v", col("x") * 2), root, "x", numFiles = 4)
    // x in (99, 200): strict lower bound — 100..199
    val df = readFmt(root).where($"x" > 99L && $"x" < 200L)
    assert(df.agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
      == ((100L, (100L until 200L).map(_ * 2).sum)))
    val n = scannedFiles(df)
    val total = readFmt(root).inputFiles.length
    assert(n < total, s"expected pruning on strict bounds: $n of $total")
  }

  test("tables without declared stats read everything but answer correctly") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn4").toString
    ManifestTable.merge((0L until 100L).map(i => (i, i % 7)).toDF("id", "m"),
      root, Seq("id"))
    val df = readFmt(root).where($"id" < 10L)
    assert(df.count() == 10L)
    // no stats declared: listFiles must keep every file (conservative)
    assert(scannedFiles(df) == readFmt(root).inputFiles.length.toLong)
  }

  test("filters still push down to the parquet scan beneath the manifest index") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn5").toString
    ManifestTable.commitClustered((0L until 500L).toDF("x"), root, "x", numFiles = 4)
    val df = readFmt(root).where($"x" >= 100L).select($"x")
    val scan = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }.head
    val meta = scan.metadata
    assert(meta.get("PushedFilters").exists(_.contains("GreaterThanOrEqual(x,100)")),
      s"parquet pushdown lost: ${meta.get("PushedFilters")}")
    assert(scan.requiredSchema.fieldNames.sameElements(Array("x")),
      "column pruning lost through the connector")
  }

  test("a 2-D box predicate on a Z-ordered table prunes on BOTH stats " +
    "columns through the plan's own filters (the readWhereBox face, free)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn8").toString
    // 64x64 grid Z-ordered into 16 tiles: a small (x,y) box intersects few
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y, x * 64 + y)
    ManifestTable.commitZOrdered(grid.toDF("x", "y", "payload"), root, "x", "y",
      numFiles = 16)
    val total = readFmt(root).inputFiles.length
    val boxed = readFmt(root)
      .where($"x" >= 10L && $"x" <= 13L && $"y" >= 20L && $"y" <= 23L)
    val n = scannedFiles(boxed)
    assert(n < total, s"expected 2-D stats pruning: $n of $total")
    val expect = (for { x <- 10L to 13L; y <- 20L to 23L } yield (x, y, x * 64 + y)).toSet
    assert(boxed.as[(Long, Long, Long)].collect().toSet == expect)
    // parity with the bespoke API on the same box
    assert(ManifestTable.readWhereBox(spark, root,
      Seq(("x", 10L, 13L), ("y", 20L, 23L))).as[(Long, Long, Long)]
      .collect().toSet == expect)
  }

  test("the connector is a first-class SQL table: CREATE TABLE ... USING graft-manifest") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn6").toString
    ManifestTable.commitClustered((0L until 300L).toDF("x"), root, "x", numFiles = 3)
    spark.sql(
      s"CREATE TABLE conn_sql_face USING `graft-manifest` OPTIONS (path '$root')")
    try {
      assert(spark.sql(
        "SELECT count(*) AS c FROM conn_sql_face WHERE x BETWEEN 10 AND 19")
        .as[Long].head() == 10L)
    } finally spark.sql("DROP TABLE conn_sql_face")
  }

  test("an add-column evolved snapshot reads through the connector with the " +
    "union schema (old files null-filled)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn7").toString
    ManifestTable.merge(Seq(1L -> "a", 2L -> "b").toDF("id", "v"), root, Seq("id"))
    ManifestTable.merge(Seq((3L, "c", 30L)).toDF("id", "v", "extra"), root, Seq("id"))
    val df = readFmt(root)
    assert(df.columns.toSet == Set("id", "v", "extra"))
    assert(df.where($"extra".isNull).count() == 2L)
    assert(df.where($"id" === 3L).select($"extra").as[Long].head() == 30L)
  }

  test("write face: Overwrite then Append commit through the format; append " +
    "references old files (no rewrite) and per-batch stats still skip") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn9").toString
    (0L until 100L).toDF("x").write.format("graft-manifest")
      .option("statsCols", "x").mode("overwrite").save(root)
    assert(ManifestTable.currentVersion(root) == 1)
    val v1Files = readFmt(root).inputFiles.toSet

    (100L until 200L).toDF("x").write.format("graft-manifest")
      .mode("append").save(root)
    assert(ManifestTable.currentVersion(root) == 2)
    val v2Files = readFmt(root).inputFiles.toSet
    assert(v1Files.subsetOf(v2Files),
      "append must reference the previous snapshot's files, not rewrite them")
    assert(readFmt(root).count() == 200L)

    // each append's files carry their own min/max (stats col is sticky),
    // so a narrow filter skips the other generation's files entirely
    val narrow = readFmt(root).where($"x" >= 150L)
    assert(narrow.count() == 50L)
    assert(scannedFiles(narrow) < v2Files.size.toLong,
      "expected cross-generation stats skipping on appended batches")

    intercept[IllegalStateException] {
      (0L until 5L).toDF("x").write.format("graft-manifest").save(root) // default EIE
    }
    (0L until 5L).toDF("x").write.format("graft-manifest")
      .mode("ignore").save(root)
    assert(ManifestTable.currentVersion(root) == 2, "Ignore must be a no-op")
    // time travel still sees the pre-append snapshot
    assert(spark.read.format("graft-manifest").option("versionAsOf", "1")
      .load(root).count() == 100L)
  }

  test("bloom sidecars: a point lookup on an UNCLUSTERED high-cardinality " +
    "column skips to ~1 file where range stats keep everything, and a " +
    "missing key reads ~0 files — answers exact either way") {
    import graft.sources.ManifestBloom
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloom1").toString
    // round-robin into 8 files: every file's [min,max] spans the whole
    // id domain, so min/max stats are useless by construction
    val data = (0L until 800L).map(i => (i, s"payload$i")).toDF("id", "v")
      .repartition(8)
    ManifestBloom.declare(root, "id")
    ManifestTable.commitSnapshot(data, root, Seq("id"))
    val total = readFmt(root).inputFiles.length
    assert(total >= 6)

    // range stats alone cannot prune this layout (sanity of the setup)
    val range = readFmt(root).where($"id" >= 100L && $"id" <= 110L)
    assert(scannedFiles(range) == total.toLong,
      "setup must be stats-unprunable so the bloom is what's being tested")

    val hit = readFmt(root).where($"id" === 123L)
    assert(hit.as[(Long, String)].collect().toSeq == Seq(123L -> "payload123"))
    val nHit = scannedFiles(hit)
    assert(nHit <= 2, s"bloom should keep ~1 of $total files, kept $nHit")

    val miss = readFmt(root).where($"id" === 999999L)
    assert(miss.count() == 0L)
    assert(scannedFiles(miss) <= 1, "a definite miss should read ~no files")

    // IN probes: any-of semantics, still pruned below the full set
    val in3 = readFmt(root).where($"id".isin(5L, 205L, 405L))
    assert(in3.count() == 3L)
    assert(scannedFiles(in3) < total.toLong)
  }

  test("bloom sidecars are sticky across APPEND generations and conservative " +
    "for pre-declaration files (no sidecar = always read, never wrong)") {
    import graft.sources.ManifestBloom
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloom2").toString
    // generation 0: committed BEFORE any bloom declaration — no sidecars
    ManifestTable.commitSnapshot(
      (0L until 100L).map(i => (i, "old")).toDF("id", "v").repartition(2), root, Nil)
    val gen0 = readFmt(root).inputFiles.length
    // declare, then append two more generations (writer-option path)
    (100L until 200L).map(i => (i, "g1")).toDF("id", "v").repartition(2)
      .write.format("graft-manifest").option("bloomCol", "id")
      .mode("append").save(root)
    (200L until 300L).map(i => (i, "g2")).toDF("id", "v").repartition(2)
      .write.format("graft-manifest").mode("append").save(root) // sticky
    val total = readFmt(root).inputFiles.length

    // a key from the LAST generation: its bloom keeps its file, the other
    // bloomed generation is pruned, the sidecar-less gen0 files are kept
    val hit = readFmt(root).where($"id" === 250L)
    assert(hit.as[(Long, String)].collect().toSeq == Seq(250L -> "g2"))
    val n = scannedFiles(hit)
    assert(n < total.toLong, s"expected bloomed generations pruned: $n of $total")
    assert(n >= gen0.toLong, "pre-declaration files must always be read")

    // a pre-declaration key still answers exactly (its files have no
    // sidecar and are kept unconditionally)
    assert(readFmt(root).where($"id" === 50L).as[(Long, String)]
      .collect().toSeq == Seq(50L -> "old"))
  }

  test("bloom probe hashing: string keys work through the same Catalyst " +
    "hash on both commit and probe sides") {
    import graft.sources.ManifestBloom
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloom3").toString
    val data = (0 until 400).map(i => (s"key-$i", i)).toDF("k", "n").repartition(4)
    ManifestBloom.declare(root, "k")
    ManifestTable.commitSnapshot(data, root, Nil)
    val total = readFmt(root).inputFiles.length
    val hit = readFmt(root).where($"k" === "key-37")
    assert(hit.as[(String, Int)].collect().toSeq == Seq("key-37" -> 37))
    assert(scannedFiles(hit) <= 2)
    assert(scannedFiles(readFmt(root).where($"k" === "no-such-key")) <= 1)
    assert(total >= 3)
  }

  test("vacuum keeps LIVE bloom sidecars (skipping still works after) and " +
    "deletes orphaned ones with their dead data files") {
    import graft.sources.ManifestBloom
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloom4").toString
    ManifestBloom.declare(root, "id")
    ManifestTable.commitSnapshot(
      (0L until 200L).map(i => (i, "v1")).toDF("id", "v").repartition(4), root, Nil)
    ManifestTable.commitSnapshot(
      (0L until 200L).map(i => (i, "v2")).toDF("id", "v").repartition(4), root, Nil)
    def sidecars(): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
      try s.iterator().asScala.filter(_.toString.endsWith(".bloom")).toSeq
      finally s.close()
    }
    assert(sidecars().size >= 8, "both generations should carry sidecars")
    ManifestTable.vacuum(root, keepVersions = 1, orphanGraceMs = 0)
    val left = sidecars()
    val liveFiles = readFmt(root).inputFiles.map(f =>
      f.stripPrefix("file:")).toSet
    assert(left.nonEmpty && left.forall(p =>
      liveFiles.contains(p.toString.stripSuffix(".id.bloom"))),
      s"every surviving sidecar must belong to a live file: $left")
    assert(left.size >= 4, "live generation's sidecars must survive vacuum")
    // and skipping still engages on the survivor snapshot
    val hit = readFmt(root).where($"id" === 42L)
    assert(hit.as[(Long, String)].collect().toSeq == Seq(42L -> "v2"))
    assert(scannedFiles(hit) <= 2)
  }

  test("snapshot isolation: a loaded frame keeps reading ITS version even " +
    "after later commits land (file list pinned at load)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-conn-iso").toString
    ManifestTable.merge(Seq(1L -> "a").toDF("id", "v"), root, Seq("id"))
    val pinned = readFmt(root)
    assert(pinned.count() == 1L)
    ManifestTable.merge(Seq(2L -> "b", 3L -> "c").toDF("id", "v"), root, Seq("id"))
    // the already-loaded frame is the v1 snapshot; a fresh load sees v2
    assert(pinned.count() == 1L, "pinned snapshot must not see the later commit")
    assert(readFmt(root).count() == 3L)
  }

  test("bloom invariant: NO inserted key is ever pruned (false-negative " +
    "freedom over 500 keys), and the measured false-positive rate on " +
    "absent keys stays near the sizing estimate") {
    import graft.sources.{ManifestBloom, ManifestTable => MT}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloom5").toString
    val rnd = new scala.util.Random(42)
    val keys = Seq.fill(500)(rnd.nextLong()).distinct
    ManifestBloom.declare(root, "id")
    MT.commitSnapshot(keys.toDF("id").coalesce(1), root, Nil)
    val full = MT.read(spark, root).inputFiles.head // "file:///…/data/vN-…/part-…"
    val rel = full.substring(full.indexOf("/data/") + 1)
    // every inserted key must probe present
    keys.foreach { k =>
      assert(ManifestBloom.mightContain(root, rel, "id", Literal(k)) == Some(true),
        s"false negative for inserted key $k")
    }
    // absent keys: fp rate ~ (1-e^(-kn/m))^k ≈ 1.5% at n=500, m=8192, k=4;
    // allow generous slack for hash clustering
    val absent = Seq.fill(2000)(rnd.nextLong()).filterNot(keys.contains)
    val fps = absent.count(k =>
      ManifestBloom.mightContain(root, rel, "id", Literal(k)) == Some(true))
    assert(fps.toDouble / absent.size < 0.08,
      s"false-positive rate ${fps.toDouble / absent.size} far above sizing estimate")
  }

  test("re-declaring the bloom column cannot mis-probe old sidecars: they " +
    "are column-tagged by FILE NAME, so files indexed under the previous " +
    "column are conservatively read, never falsely skipped (ADVICE r10)") {
    import graft.sources.ManifestBloom
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloom-redecl").toString
    ManifestBloom.declare(root, "id")
    ManifestTable.commitSnapshot(
      (0L until 100L).map(i => (i, s"key-$i")).toDF("id", "k").repartition(4),
      root, Nil)
    // re-declare to the OTHER column: existing sidecars encode id's
    // hashes under id-tagged names — a point query on k must read every
    // file (no k-sidecars yet) and stay exact
    ManifestBloom.declare(root, "k")
    val hit = readFmt(root).where($"k" === "key-37")
    assert(hit.as[(Long, String)].collect().toSeq == Seq(37L -> "key-37"))
    assert(scannedFiles(hit) == 4, "no k-sidecar exists yet: all files read")
    // the next commit writes k-tagged sidecars and skipping engages again
    ManifestTable.commitSnapshot(
      (0L until 100L).map(i => (i, s"key-$i")).toDF("id", "k").repartition(4),
      root, Nil)
    val hit2 = readFmt(root).where($"k" === "no-such-key")
    assert(hit2.count() == 0L)
    assert(scannedFiles(hit2) <= 1, "k-tagged sidecars must prune misses")
    // a dotted column name would break the sidecar naming — rejected
    intercept[IllegalArgumentException] { ManifestBloom.declare(root, "a.b") }
  }

  test("the sidecar writer's bounded driver materialization fails LOUDLY " +
    "past the per-commit file cap instead of silently holding gigabytes") {
    import graft.sources.ManifestBloom
    val fake = (0 to ManifestBloom.MaxSidecarFilesPerCommit).map(i =>
      ManifestTable.FileEntry("", s"data/v1-x/part-$i.parquet"))
    val e = intercept[IllegalArgumentException] {
      ManifestBloom.writeSidecars(spark, "/tmp/never-used", fake, "id")
    }
    assert(e.getMessage.contains("cap"), e.getMessage)
  }

  test("a lost append race fails LOUDLY with retry guidance, never silently " +
    "overwrites the winner's manifest") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-apprace").toString
    ManifestTable.commitSnapshot((0L until 10L).toDF("x"), root, Nil)
    // simulate the loser: another writer already claimed version 2
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "manifest-v2.json"),
      "#graft-manifest-v2\n\tdata/ghost/f.parquet")
    val e = intercept[java.util.ConcurrentModificationException] {
      ManifestTable.append((10L until 20L).toDF("x"), root)
    }
    assert(e.getMessage.contains("retry"))
  }

  test("extractBounds recognizes comparison shapes and ignores the rest") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    val x = AttributeReference("x", LongType)()
    val y = AttributeReference("y", LongType)()
    val b = ManifestFileIndex.extractBounds(
      Seq(GreaterThanOrEqual(x, Literal(5L)), LessThan(x, Literal(9L)),
        IsNotNull(x), EqualTo(y, Literal(3L)),
        GreaterThan(Literal(100L), x)), // reversed: x < 100
      Seq("x"))
    assert(b == Seq((0, Some(BigDecimal(5)), Some(BigDecimal(9)))))
    // IN-list → [min, max] envelope bound
    val bin = ManifestFileIndex.extractBounds(
      Seq(In(x, Seq(Literal(30L), Literal(7L), Literal(19L)))), Seq("x"))
    assert(bin == Seq((0, Some(BigDecimal(7)), Some(BigDecimal(30)))))
  }
}
