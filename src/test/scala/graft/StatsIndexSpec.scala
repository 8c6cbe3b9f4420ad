package graft

import graft.sources.{ManifestTable, StatsIndex, StatsIndexFixtures}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained embedding-stats lifecycle: additive centered moments
  * in a tiny ManifestTable, kept current from corpus CDC. The gate
  * everywhere is maintained ≡ recomputed — the covariance read off the
  * maintained sums must equal a brute-force covariance of the CURRENT
  * corpus snapshot across inserts, updates (retraction!), and deletes,
  * with replays rejected by the txn-tag watermark. */
class StatsIndexSpec extends SparkSpec {

  private val dims = 4

  private def vecsDf(rows: (Long, Seq[Double])*): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // explicit schema: toDF infers containsNull=false, which the
    // manifest's no-retyping check would reject against the parquet
    // read-back (containsNull=true) on the SECOND merge
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = true))))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
  }

  /** Brute-force double-rounded covariance triples of the snapshot. */
  private def expected(corpusRoot: String): Map[(Long, Long), Double] = {
    val vs = ManifestTable.read(spark, corpusRoot)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = vs.length.toDouble
    (for (i <- 0 until dims; j <- i until dims) yield {
      val sij = vs.map(v => v(i) * v(j)).sum
      val si = vs.map(_(i)).sum
      val sj = vs.map(_(j)).sum
      (i.toLong, j.toLong) -> (sij / n - (si / n) * (sj / n))
    }).toMap
  }

  private def maintained(root: String): Map[(Long, Long), Double] =
    StatsIndex.covarianceFromStats(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private def assertMatches(corpus: String, stats: String, clue: String): Unit = {
    val exp = expected(corpus)
    val got = maintained(stats)
    assert(got.keySet == exp.keySet, clue)
    got.foreach { case (k, v) =>
      assert(math.abs(v - exp(k)) <= 1.000001e-6, s"$clue cov$k: $v vs ${exp(k)}")
    }
  }

  test("maintained covariance equals recomputed across insert / update-" +
    "retraction / delete commits, and the polling path rejects replays") {
    val work = Files.createTempDirectory("graft-statsidx").toString
    val (corpus, stats) = (s"$work/corpus", s"$work/stats")

    val v1 = ManifestTable.merge(vecsDf(
      1L -> Seq(1.0, 2.0, 3.0, 4.0),
      2L -> Seq(2.0, 1.0, 0.5, -1.0),
      3L -> Seq(-1.0, 0.0, 2.0, 1.5)), corpus, Seq("vec_id"))
    StatsIndex.bootstrap(ManifestTable.read(spark, corpus), stats, dims)
    assertMatches(corpus, stats, "after bootstrap")

    // inserts
    val v2 = ManifestTable.merge(vecsDf(
      4L -> Seq(0.25, -2.0, 1.0, 0.0),
      5L -> Seq(3.0, 3.0, -0.5, 2.0)), corpus, Seq("vec_id"))
    StatsIndex.refresh(spark, corpus, stats, v1, v2)
    assertMatches(corpus, stats, "after inserts")

    // update: vec 2's old image must SUBTRACT from the sums exactly
    val v3 = ManifestTable.merge(vecsDf(
      2L -> Seq(-0.5, 4.0, 4.0, 4.0)), corpus, Seq("vec_id"))
    StatsIndex.refresh(spark, corpus, stats, v2, v3)
    assertMatches(corpus, stats, "after update retraction")

    // delete
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("vec_id") =!= 1L)
        .localCheckpoint(), corpus)
    StatsIndex.refresh(spark, corpus, stats, v3, v4)
    assertMatches(corpus, stats, "after delete")
    // the count row retracted too
    val n = StatsIndex.readStats(spark, stats)
      .where(col("i") === -1 && col("j") === -1).collect()(0).getDouble(2)
    assert(n == 4.0, s"count row: $n")

    // replayed/overlapping ranges: no new version, sums unchanged
    val vS = ManifestTable.currentVersion(stats)
    val before = maintained(stats)
    StatsIndex.refresh(spark, corpus, stats, 0, v4)
    assert(ManifestTable.currentVersion(stats) == vS,
      "replayed range must not commit a new stats version")
    assert(maintained(stats) == before, "sums double-counted on replay")
  }

  test("turnkey startMaintenance keeps the stats current across commits " +
    "and a restart (bootstrap paired with startingVersion)") {
    val work = Files.createTempDirectory("graft-statsidx2").toString
    val (corpus, stats) = (s"$work/corpus", s"$work/stats")
    val ckpt = s"$work/ckpt"
    val v1 = ManifestTable.merge(vecsDf(
      1L -> Seq(1.0, 2.0, 3.0, 4.0),
      2L -> Seq(2.0, 1.0, 0.5, -1.0)), corpus, Seq("vec_id"))
    StatsIndex.bootstrap(ManifestTable.read(spark, corpus), stats, dims)
    val q = StatsIndex.startMaintenance(spark, corpus, stats, ckpt,
      startingVersion = v1)
    q.processAllAvailable()
    assertMatches(corpus, stats, "no-op first batch (post-bootstrap start)")
    ManifestTable.merge(vecsDf(3L -> Seq(0.0, -1.0, 2.0, 2.5)), corpus, Seq("vec_id"))
    q.processAllAvailable()
    q.stop()
    assertMatches(corpus, stats, "streamed insert")
    // restart absorbs an offline update
    ManifestTable.merge(vecsDf(1L -> Seq(5.0, 5.0, 5.0, 5.0)), corpus, Seq("vec_id"))
    val q2 = StatsIndex.startMaintenance(spark, corpus, stats, ckpt,
      startingVersion = v1)
    q2.processAllAvailable()
    q2.stop()
    assertMatches(corpus, stats, "after restart")
  }

  /** UNROUNDED maintained covariance — the drift spec needs to see
    * residue far below covarianceFromStats' 6-decimal display. */
  private def maintainedRaw(root: String): Map[(Long, Long), Double] = {
    val rows = StatsIndex.readStats(spark, root).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val n = rows.find(r => r._1 == -1 && r._2 == -1).get._3
    val si = rows.filter(r => r._1 >= 0 && r._2 == -1).map(r => r._1 -> r._3).toMap
    rows.filter(_._2 >= 0).map { case (i, j, sij) =>
      (i.toLong, j.toLong) -> (sij / n - (si(i) / n) * (si(j) / n))
    }.toMap
  }

  private def maxDivergence(corpus: String, stats: String): Double = {
    val exp = expected(corpus)
    maintainedRaw(stats).map { case (k, v) => math.abs(v - exp(k)) }.max
  }

  test("drift hardening: a 100-commit retraction-heavy chain stays inside the " +
    "K-linear residue bound, and rebootstrap collapses the residue and " +
    "resumes the polling protocol exactly-once") {
    val work = Files.createTempDirectory("graft-statsidx-drift").toString
    val (corpus, stats) = (s"$work/corpus", s"$work/stats")
    // sevenths are non-representable doubles, so every retraction leaves
    // genuine ~ulp(S) residue (integer-valued vectors would sum exactly
    // and the chain would show zero drift no matter how long)
    def vec(seed: Int): Seq[Double] =
      (0 until dims).map(k => (((seed * 31 + k * 17) % 13) - 6) / 7.0)
    var v = ManifestTable.merge(
      vecsDf((1L to 5L).map(id => id -> vec(id.toInt)): _*), corpus, Seq("vec_id"))
    StatsIndex.bootstrap(ManifestTable.read(spark, corpus), stats, dims)
    val commits = 100
    var nextId = 6L
    (1 to commits).foreach { step =>
      val prev = v
      v =
        if (step % 9 == 0) { // delete a survivor (keep ≥3 rows alive)
          val keep = ManifestTable.read(spark, corpus)
            .orderBy(col("vec_id").desc).limit(1)
            .collect()(0).getLong(0)
          ManifestTable.commit(ManifestTable.read(spark, corpus)
            .where(col("vec_id") =!= keep).localCheckpoint(), corpus)
        } else if (step % 3 == 0) { // insert
          val r = ManifestTable.merge(vecsDf(nextId -> vec(step)), corpus, Seq("vec_id"))
          nextId += 1; r
        } else { // update = preimage retraction + postimage add
          val id = ManifestTable.read(spark, corpus)
            .orderBy(col("vec_id")).limit(1).collect()(0).getLong(0)
          ManifestTable.merge(vecsDf(id -> vec(step + 7)), corpus, Seq("vec_id"))
        }
      StatsIndex.refresh(spark, corpus, stats, prev, v)
    }
    // the stated bound: each of the K commits perturbs a sum S by at most
    // a few ulp(S) per retraction/addition; 8·K·ulp(max|S|) is generous
    // headroom over the ~2·K·ulp expectation and stays ~1e-12 here —
    // four display orders below the 6-decimal grid
    val maxAbsSum = StatsIndex.readStats(spark, stats)
      .where(col("j") =!= -2).collect().map(r => math.abs(r.getDouble(2))).max
    val bound = 8.0 * commits * math.ulp(maxAbsSum)
    val drift = maxDivergence(corpus, stats)
    assert(drift <= bound, s"chain drift $drift exceeds stated bound $bound")
    assert(bound < 1e-9, s"fixture bound degenerate: $bound") // bound is meaningful

    // recompute-and-swap: residue collapses to a single-pass's ~1e-15
    val swappedAt = StatsIndex.rebootstrap(spark, corpus, stats, dims)
    assert(swappedAt == v)
    assert(maxDivergence(corpus, stats) <= 1e-13,
      s"post-rebootstrap divergence ${maxDivergence(corpus, stats)}")

    // the swap carries the polling watermark: replaying the absorbed
    // history is a no-op, and the NEXT commit applies exactly-once
    val vS = ManifestTable.currentVersion(stats)
    StatsIndex.refresh(spark, corpus, stats, 0, v)
    assert(ManifestTable.currentVersion(stats) == vS,
      "pre-swap versions replayed onto the rebootstrapped stats")
    val v2 = ManifestTable.merge(vecsDf(nextId -> vec(commits + 1)), corpus, Seq("vec_id"))
    StatsIndex.refresh(spark, corpus, stats, v, v2)
    assertMatches(corpus, stats, "first post-rebootstrap commit")
    assert(maxDivergence(corpus, stats) <= 1e-12, "post-swap chain restarts clean")
  }

  test("q145's direction/means from the maintained fixture equal the " +
    "single-shot whiteningStats on the same corpus content") {
    val root = StatsIndexFixtures.ensure(spark, sf0001)
    val (wM, muM) = StatsIndex.whiteningFromStats(spark, s"$root/stats")
    val (wS, muS, _) = graft.functions.VectorOps.whiteningStats(spark, sf0001)
    assert(wM.length == wS.length && muM.length == muS.length)
    // both are snapped at 6; a single grid-step disagreement would mean
    // the maintained covariance drifted past the snap ladder's margin
    wM.zip(wS).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1.000001e-6, s"direction drifted: $a vs $b") }
    muM.zip(muS).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1.000001e-6, s"means drifted: $a vs $b") }
  }
}
