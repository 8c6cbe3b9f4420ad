package graft

import graft.functions.VectorOps
import graft.sources.{ManifestTable, VecIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental IVF index lifecycle: frozen quantizer + CDC-maintained
  * cell index must answer exactly like a from-scratch recompute of the
  * current corpus snapshot — across inserts, a vector update that MOVES
  * CELLS, and a delete — and the maintained probe must reproduce q129 on
  * the real embeddings table. */
class VecIndexSpec extends SparkSpec {

  // two well-separated label clusters: label 0 near +x, label 1 near +y,
  // so cell assignment is unambiguous and an update can hop cells
  private def vec(x: Double, y: Double, z: Double): Seq[Float] =
    Seq(x.toFloat, y.toFloat, z.toFloat)

  private def embDf(rows: (Long, Seq[Float], Int)*): DataFrame = {
    import spark.implicits._
    // explicit cast: a literal-built array is array<float, containsNull
    // = false>, but parquet reads back containsNull = true, and the
    // merge's retyping guard compares exact DataTypes
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toVector
      case x => x
    }.toVector: Seq[Any]).toSet

  private def assertMatchesSnapshot(corpusRoot: String, centRoot: String,
      idxRoot: String, clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpusRoot)
    val cent = VecIndex.readCentroids(spark, centRoot)
    val expected = VecIndex.computeCellIndex(snap, cent).where(col("live"))
      .select(col("vec_id"), col("cell"), col("v"), col("norm"))
    assert(rows(VecIndex.readCellIndex(spark, idxRoot)) == rows(expected),
      s"cell index drifted: $clue")
  }

  test("maintained cell index equals recomputed across insert / cell-hopping " +
    "update / delete commits, against the frozen quantizer") {
    val work = Files.createTempDirectory("graft-vecidx").toString
    val corpus = s"$work/corpus"
    val cent = s"$work/cent"
    val idx = s"$work/idx"

    val v1 = ManifestTable.merge(embDf(
      (1L, vec(1, 0, 0), 0), (2L, vec(0.9, 0.1, 0), 0),
      (3L, vec(0, 1, 0), 1), (4L, vec(0.1, 0.9, 0), 1)), corpus, Seq("vec_id"))
    VecIndex.bootstrap(ManifestTable.read(spark, corpus), cent, idx)
    assertMatchesSnapshot(corpus, cent, idx, "after bootstrap")

    // v2: two inserts, one per cluster — only they are assigned
    val v2 = ManifestTable.merge(embDf(
      (5L, vec(0.8, 0, 0.1), 0), (6L, vec(0, 0.8, 0.1), 1)), corpus, Seq("vec_id"))
    VecIndex.refresh(spark, corpus, cent, idx, v1, v2)
    assertMatchesSnapshot(corpus, cent, idx, "after v2 inserts")

    // v3: vector 2 MOVES to the +y cluster (its label column stays 0 —
    // assignment is nearest-CENTROID, not label, so it must hop cells)
    val v3 = ManifestTable.merge(embDf((2L, vec(0, 1.1, 0), 0)), corpus, Seq("vec_id"))
    VecIndex.refresh(spark, corpus, cent, idx, v2, v3)
    assertMatchesSnapshot(corpus, cent, idx, "after v3 cell-hopping update")
    val cellOf2 = VecIndex.readCellIndex(spark, idx)
      .where(col("vec_id") === 2L).select(col("cell")).head().getLong(0)
    assert(cellOf2 == 1L, s"vec 2 should have hopped to cell 1, got $cellOf2")

    // v4: delete vector 3 — tombstone retracts it from the index
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("vec_id") =!= 3L)
        .localCheckpoint(), corpus)
    VecIndex.refresh(spark, corpus, cent, idx, v3, v4)
    assertMatchesSnapshot(corpus, cent, idx, "after v4 delete")
    assert(VecIndex.readCellIndex(spark, idx).where(col("vec_id") === 3L).count() == 0L)

    // probe: a batch vector in the +x cluster finds its cell's members
    val near = VecIndex.probe(embDf((100L, vec(1, 0.05, 0), 0))
      .select(col("vec_id"), col("embedding")), spark, cent, idx, nprobe = 1, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(near.map(_._1).subsetOf(Set(1L, 5L)), s"got $near") // +x members only
  }

  test("maintained-index probe reproduces q129 on the real embeddings table " +
    "when the corpus arrives as incremental commits") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-vecidx2").toString
    val corpus = s"$work/corpus"
    val cent = s"$work/cent"
    val idx = s"$work/idx"
    val all = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding", $"label")
    // q129's split: corpus = vec_id % 10 != 9 in two commits; batch = == 9.
    // The quantizer must be bootstrapped from the FULL corpus (q129's
    // centroids are per-label means of all corpus vectors), so commit
    // both batches first, bootstrap, then roll the index across a
    // further update commit to exercise maintenance.
    val v1 = ManifestTable.merge(
      all.where($"vec_id" % 10 =!= 9 && $"vec_id" % 2 === 0), corpus, Seq("vec_id"))
    val v2 = ManifestTable.merge(
      all.where($"vec_id" % 10 =!= 9 && $"vec_id" % 2 === 1), corpus, Seq("vec_id"))
    VecIndex.bootstrap(ManifestTable.read(spark, corpus), cent, idx)

    val batch = all.where($"vec_id" % 10 === 9).select($"vec_id", $"embedding")
    val probed = VecIndex.probe(batch, spark, cent, idx, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val q129 = VectorOps.q129IncrementalIvf(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(probed == q129)
    assert(v1 == 1 && v2 == 2)
  }

  test("exactly-once maintenance: applyBatch skips a replayed batch id, and " +
    "the turnkey startMaintenance stream keeps the cell index current " +
    "across commits and a restart") {
    val work = Files.createTempDirectory("graft-vecidx-eo").toString
    val corpus = s"$work/corpus"
    val cent = s"$work/cent"
    val idx = s"$work/idx"
    val ckpt = s"$work/ckpt"
    val v1 = ManifestTable.merge(embDf(
      (1L, vec(1, 0, 0), 0), (2L, vec(0, 1, 0), 1)), corpus, Seq("vec_id"))
    // quantizer frozen from the bootstrap corpus; the index itself is
    // then maintained exclusively through the CDC stream
    ManifestTable.commit(
      VecIndex.computeCentroids(ManifestTable.read(spark, corpus))
        .localCheckpoint(), cent)
    val q = VecIndex.startMaintenance(spark, corpus, cent, idx, ckpt)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, cent, idx, "turnkey bootstrap")
    ManifestTable.merge(embDf((3L, vec(0.9, 0.1, 0), 0)), corpus, Seq("vec_id"))
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, cent, idx, "turnkey incremental commit")
    q.stop()

    // replay the last CDC batch id by hand — watermark must reject it.
    // The stream writes SCOPED tags (batch=<scope>/<id>); a replay is
    // only a replay within the same scope, so parse both parts
    val vIdx = ManifestTable.currentVersion(idx)
    val (lastScope, lastId) = ManifestTable.history(idx).flatMap(_.tag)
      .collectFirst { case t if t.startsWith("batch=") =>
        t.stripPrefix("batch=").split('/') match {
          case Array(s, id) => (s, id.toLong)
          case Array(id)    => ("", id.toLong)
        }
      }.get
    val ch = ManifestTable.readChanges(spark, corpus, v1,
      ManifestTable.currentVersion(corpus), Seq("vec_id"), preimages = true)
    VecIndex.applyBatch(ch, lastId, cent, idx, lastScope)
    assert(ManifestTable.currentVersion(idx) == vIdx,
      "a replayed batch id must not commit a new index version")
    assertMatchesSnapshot(corpus, cent, idx, "after replay")

    // offline commit + restart from the same checkpoint
    ManifestTable.merge(embDf((4L, vec(0, 0.9, 0.1), 1)), corpus, Seq("vec_id"))
    val q2 = VecIndex.startMaintenance(spark, corpus, cent, idx, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assertMatchesSnapshot(corpus, cent, idx, "turnkey restart")
  }
}
