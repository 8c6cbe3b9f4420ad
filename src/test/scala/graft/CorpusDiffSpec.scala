package graft

import graft.sources.{CorpusDiff, DiffFixtures, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** q141's maintained-table diff vs a driver-side recompute from the raw
  * parquet, plus the NET-diff edge the oracle can't isolate: a doc
  * inserted in v2 and deleted in v3 must vanish from the v1→v3 report
  * entirely (net absent→absent), and an updated-then-deleted doc must
  * report as a DELETE carrying its ORIGINAL (v1) size. */
class CorpusDiffSpec extends SparkSpec {

  test("q141: net v1->v3 diff matches the residue-class recompute") {
    import spark.implicits._
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source", $"n_chars")
      .as[(Long, String, Long)].collect()
    def agg(rows: Seq[(Long, String, Long)], ct: String,
        delta: ((Long, Long)) => Long): Set[(String, String, Long, Long)] =
      rows.groupBy(_._2).map { case (src, rs) =>
        (src, ct, rs.size.toLong, rs.map(r => delta((r._1, r._3))).sum)
      }.toSet
    val ins = raw.filter(r => r._1 % 4 == 3 && r._1 % 3 == 0 && r._1 % 5 != 0)
    val del = raw.filter(r => r._1 % 4 != 3 && r._1 % 5 == 0)
    val upd = raw.filter(r => r._1 % 4 != 3 && r._1 % 3 == 0 && r._1 % 5 != 0)
    val expected = agg(ins.toSeq, "insert", _._2 + 3) ++
      agg(del.toSeq, "delete", -_._2) ++ agg(upd.toSeq, "update", _ => 3L)
    val out = DiffFixtures.q141CorpusDiff(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expected, s"missing=${expected -- out} extra=${out -- expected}")
  }

  test("q141: insert-then-delete nets out; update-then-delete reports the " +
    "original size as the delete preimage") {
    import spark.implicits._
    val root = DiffFixtures.ensure(spark, sf0001)
    val ch = ManifestTable.readChanges(spark, root, 1, 3, Seq("doc_id"),
      preimages = true)
    val byDoc = ch.select($"doc_id", $"_change_type", $"n_chars")
      .as[(Long, String, Long)].collect().groupBy(_._1)
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    // doc class (4k+3, %3==0, %5==0): arrived in v2, deleted in v3 - net nothing
    val netOut = raw.keys.filter(k => k % 4 == 3 && k % 3 == 0 && k % 5 == 0)
    assert(netOut.nonEmpty, "fixture corpus lacks the insert-then-delete class")
    netOut.foreach(k => assert(!byDoc.contains(k), s"doc $k should net out, got ${byDoc.get(k)}"))
    // doc class (in v1, %3==0, %5==0): updated by v2 then deleted - ONE
    // delete row with the v1 image's n_chars (not the +3 update image)
    val updDel = raw.keys.filter(k => k % 4 != 3 && k % 3 == 0 && k % 5 == 0)
    assert(updDel.nonEmpty, "fixture corpus lacks the update-then-delete class")
    updDel.foreach { k =>
      val rows = byDoc(k).toSeq
      assert(rows.map(_._2) == Seq("delete"), s"doc $k: $rows")
      assert(rows.head._3 == raw(k), s"doc $k delete image carries ${rows.head._3}")
    }
  }

  test("CorpusDiff.report composes over arbitrary dims (empty dims = one " +
    "row per change type)") {
    val root = DiffFixtures.ensure(spark, sf0001)
    val ch = ManifestTable.readChanges(spark, root, 1, 3, Seq("doc_id"),
      preimages = true)
    val global = CorpusDiff.report(ch, dims = Nil, sizeCol = "n_chars").collect()
    assert(global.map(_.getString(0)).toSet == Set("insert", "update", "delete"))
    // per-source counts roll up to the global ones
    val perSource = DiffFixtures.q141CorpusDiff(spark, sf0001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    global.foreach { r =>
      assert(r.getLong(1) == perSource(r.getString(0)),
        s"${r.getString(0)}: global ${r.getLong(1)} vs rollup ${perSource(r.getString(0))}")
    }
  }

  test("reportStream: the release FEED's running totals track each commit, " +
    "survive a restart with a commit-while-down, and equal the sum of " +
    "per-commit batch reports (the additivity contract)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-diffstream").toString
    val ckpt = Files.createTempDirectory("graft-diffstream-ckpt").toString
    def mk(rows: (Long, String, Long)*): DataFrame =
      rows.toDF("doc_id", "source", "n_chars")
    ManifestTable.merge(mk((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L)),
      root, Seq("doc_id"))

    @volatile var snap: Array[org.apache.spark.sql.Row] = Array.empty
    def start() = CorpusDiff
      .reportStream(spark, root, Seq("source"), "doc_id", "n_chars")
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) => snap = df.collect() }
      .start()
    def totals: Set[(String, String, Long, Long)] =
      snap.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val q = start()
    q.processAllAvailable()
    assert(totals == Set(("A", "insert", 2L, 30L), ("B", "insert", 1L, 30L)),
      s"bootstrap = snapshot as inserts, got $totals")

    // v2: change-detecting merge — doc 2 grows 20→25, doc 4 arrives
    ManifestTable.merge(mk((2L, "A", 25L), (4L, "B", 40L)), root, Seq("doc_id"))
    q.processAllAvailable()
    assert(totals == Set(("A", "insert", 2L, 30L), ("A", "update", 1L, 5L),
      ("B", "insert", 2L, 70L)), s"after v2: $totals")
    q.stop()

    // v3 lands while the stream is DOWN: doc 3 deleted
    ManifestTable.commitSnapshot(
      ManifestTable.read(spark, root).where($"doc_id" =!= 3L).localCheckpoint(),
      root, Nil)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(totals == Set(("A", "insert", 2L, 30L), ("A", "update", 1L, 5L),
      ("B", "insert", 2L, 70L), ("B", "delete", 1L, -30L)),
      s"restart resumes state + picks up only the offline commit: $totals")

    // the pinned contract: streamed ≡ Σ per-commit batch reports — the
    // additive count is what makes the two faces agree by construction
    val summed = (1 to 3)
      .map(v => CorpusDiff.report(
        ManifestTable.readChanges(spark, root, v - 1, v, Seq("doc_id"),
          preimages = true),
        Seq("source"), "n_chars"))
      .reduce(_ unionByName _)
      .groupBy("source", "change_type")
      .agg(org.apache.spark.sql.functions.sum("n_docs").as("n_docs"),
        org.apache.spark.sql.functions.sum("chars_delta").as("chars_delta"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(totals == summed, s"stream $totals vs summed batch $summed")
  }
}
