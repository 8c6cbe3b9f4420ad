package graft

import graft.functions.VectorOps

/** The benched q35 is the LSH-prefiltered rescore; the exact all-pairs
  * scan lives only here, as its correctness oracle (an O(n²) broadcast
  * nested loop must not be the benchmark artifact). */
class VectorOpsSpec extends SparkSpec {

  test("q35: bucketed near-dup pairs are a subset of the exact all-pairs result") {
    val bucketed = VectorOps.q35CosineNearDup(spark, sf0001).collect().map(_.toString).toSet
    val exact = VectorOps.cosineNearDupExact(spark, sf0001).collect().map(_.toString).toSet
    assert(bucketed.subsetOf(exact),
      s"prefilter invented pairs: ${(bucketed -- exact).mkString(", ")}")
  }

  test("q102: audit counts zero vectors and ragged dims the corpus never " +
    "exercises (hand fixture)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-embaudit").toString
    Seq(
      (1L, Array(3.0f, 4.0f), 0),        // norm 5
      (2L, Array(0.0f, 0.0f), 0),        // zero vector
      (3L, Array(1.0f, 0.0f, 0.0f), 1))  // different dim, norm 1
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.functions.VectorOps.q102EmbeddingAudit(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // label 0: 2 vecs, dims 2/2, one zero vector, mean norm (5+0)/2
    assert(out(0L) == ((2L, 2L, 2L, 1L, 2.5)), s"got $out")
    // label 1: clean single vector
    assert(out(1L) == ((1L, 3L, 3L, 0L, 1.0)), s"got $out")
  }

  test("q113: hard negatives match a driver-side brute force — every neighbor " +
    "has a different label and is the true label-filtered cosine top-3") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"), $"label")
      .as[(Long, Array[Double], Int)].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val expected = all.filter(_._1 < 10).flatMap { case (qId, qv, qLabel) =>
      all.filter(c => c._1 != qId && c._3 != qLabel)
        .map(c => (c._1, cos(qv, c._2)))
        .sortBy { case (id, sim) => (-sim, id) }
        .take(3).zipWithIndex
        .map { case ((nId, _), i) => (qId, nId, i + 1L) }
    }.toSet
    val out = VectorOps.q113HardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(out == expected, s"missing=${expected -- out} extra=${out -- expected}")
    // and the label constraint holds structurally
    val labels = all.map(e => e._1 -> e._3).toMap
    VectorOps.q113HardNegatives(spark, sf0001).collect().foreach { r =>
      assert(labels(r.getLong(1)).toLong == r.getLong(2) &&
        labels(r.getLong(1)) != labels(r.getLong(0)), r.toString)
    }
  }

  private def neighborSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallAt3(dir: String): (Double, Double, Set[(Long, Long)] => Double) = {
    val exact = neighborSet(VectorOps.knnExact(spark, dir, k = 3, nQueries = 50))
    assert(exact.nonEmpty)
    def recall(ann: Set[(Long, Long)]): Double = (ann & exact).size.toDouble / exact.size
    (recall(neighborSet(VectorOps.annLsh(spark, dir, nBits = 8, k = 3, nQueries = 50))),
     recall(neighborSet(VectorOps.ivfAnn(spark, dir, nprobe = 2, k = 3, nQueries = 50))),
     recall)
  }

  test("ANN recall@3 on the synthetic corpus: honest floors + convergence to exact") {
    // The sf corpus's embeddings are near-iid random, so ANY partitioned
    // index has near-chance recall — roughly the probed fraction of the
    // corpus (IVF probes 2 of 10 cells → ~0.2 expected; LSH 8-bit buckets
    // hold ~1/256 of the corpus → ~0.004 by chance). The floors assert the
    // index beats chance; the clustered test below shows real quality.
    val (rLsh, rIvf, recall) = recallAt3(sf0001)
    info(f"sf0.001 corpus recall@3: LSH(8 bits) = $rLsh%.3f, IVF(nprobe=2) = $rIvf%.3f")
    assert(rIvf >= 0.20, f"IVF nprobe=2 recall@3 $rIvf%.3f below the 2-of-10-cells chance line")
    assert(rLsh >= 0.01, f"LSH 8-bit recall@3 $rLsh%.3f below floor (chance is ~0.004)")
    // recall converges to 1.0 as the index relaxes to the exact scan
    val rLsh4 = recall(neighborSet(VectorOps.annLsh(spark, sf0001, nBits = 4, k = 3, nQueries = 50)))
    assert(rLsh4 >= rLsh, f"LSH recall must not drop with fewer bits: $rLsh4%.3f < $rLsh%.3f")
    assert(recall(neighborSet(VectorOps.annLsh(spark, sf0001, nBits = 0, k = 3, nQueries = 50))) == 1.0)
    assert(recall(neighborSet(VectorOps.ivfAnn(spark, sf0001, nprobe = 1000, k = 3, nQueries = 50))) == 1.0)
  }

  test("ANN recall@3 on clustered embeddings: IVF >= 0.9, LSH >= 0.6") {
    // 10 Gaussian clusters (sigma 0.15 around unit-scale centers), labels
    // = true cluster: the near-neighbor structure ANN indexes exist for.
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val centers = Array.fill(10, 64)(rnd.nextGaussian())
    val rows = for (c <- 0 until 10; i <- 0 until 60) yield (
      i.toLong * 10 + c, // interleave ids so the 50 queries span clusters
      centers(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat),
      c)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-clustered").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (rLsh, rIvf, _) = recallAt3(dir)
    info(f"clustered recall@3: LSH(8 bits) = $rLsh%.3f, IVF(nprobe=2) = $rIvf%.3f")
    assert(rIvf >= 0.90, f"IVF nprobe=2 recall@3 $rIvf%.3f below 0.90 on clustered data")
    assert(rLsh >= 0.60, f"LSH 8-bit recall@3 $rLsh%.3f below 0.60 on clustered data")
  }

  test("q35: exact baseline finds pairs the 0.40 threshold admits") {
    // guards against both sides being vacuously empty at sf0.001 — the
    // subset assertion above must be exercised against real pairs
    val exact = VectorOps.cosineNearDupExact(spark, sf0001).collect()
    assert(exact.nonEmpty)
    assert(exact.forall(_.getDouble(2) >= 0.40))
  }

  private def embFixture(rows: (Long, Seq[Float], Int)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-embfix").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q82: int8 quantization — exact scale and reconstruction error on hand " +
    "vectors; the all-zero vector yields scale 0 / error 0, not a NaN") {
    val dir = embFixture(
      (1L, Seq(1.0f, -0.5f, 0.0f), 0),
      (2L, Seq(0.0f, 0.0f, 0.0f), 0))
    val out = VectorOps.q82Int8Quant(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // maxabs=1: scale = 1/127 = 0.007874 (6 dp); worst dim is -0.5:
    // round(-63.5) = -64 (half away from zero), err = |-0.5 + 64/127| = 0.003937
    assert(out(1L) == ((0.007874, 0.003937)))
    assert(out(2L) == ((0.0, 0.0)))
  }

  test("q83: semdedup keeps the lowest-id member of each within-cell near-dup " +
    "group; cross-cell twins and orthogonal cellmates are kept") {
    val dir = embFixture(
      (1L, Seq(1.0f, 0.0f), 0),   // keeper
      (2L, Seq(0.999f, 0.01f), 0), // near-dup of 1 (same cell)  -> removed
      (3L, Seq(0.0f, 1.0f), 0),   // orthogonal cellmate         -> kept
      (4L, Seq(1.0f, 0.0f), 1),   // exact twin of 1, OTHER cell -> kept
      (5L, Seq(0.5f, 0.5f), 1))   // cos vs 4 = 0.707 >= 0.30    -> removed
    val out = VectorOps.q83SemDedup(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0 -> ((3L, 2L)), 1 -> ((2L, 1L))))
  }

  test("q93: per-dim stats are exact on hand vectors, and the plan is one " +
    "columnar aggregate — no Generate below the aggregation") {
    val dir = embFixture(
      (1L, Seq(1.0f, -2.0f), 0),
      (2L, Seq(3.0f, 2.0f), 0))
    val out = VectorOps.dimStats(spark, dir, 2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // dim0: mean 2, E[x^2]=5, std=sqrt(5-4)=1; dim1: mean 0, std 2
    assert(out(0L) == ((2.0, 1.0, 1.0, 3.0)))
    assert(out(1L) == ((0.0, 2.0, -2.0, 2.0)))

    // scale shape: the only Generate (explode) sits ABOVE the final
    // aggregate, pivoting its single row — the corpus-wide path is pure
    // HashAggregate with map-side partials, never an n·dims explode
    val plan = VectorOps.q93DimStats(spark, sf0001).queryExecution.executedPlan.toString
    val genIdx = plan.indexOf("Generate")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(genIdx >= 0 && aggIdx > genIdx,
      "explode must pivot the aggregated row (Generate above HashAggregate), " +
        s"not expand the corpus:\n$plan")
    assert(!plan.substring(genIdx).contains("Generate explode(v"),
      "the embedding column itself must never be exploded")
  }

  test("q128: every fused row's rrf equals the rank formula, ranks are valid " +
    "top-50 positions, the query doc never retrieves itself, and at least " +
    "one doc is found by BOTH lists") {
    val rows = VectorOps.q128HybridRrf(spark, sf0001).collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.getLong(0) != 0L)) // doc 0 is the query
    var both = 0
    rows.foreach { r =>
      val kw = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val vec = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(kw.nonEmpty || vec.nonEmpty)
      assert(kw.forall(k => k >= 1 && k <= 50) && vec.forall(v => v >= 1 && v <= 50))
      val expected = BigDecimal(
        kw.map(k => 1.0 / (k + 60)).getOrElse(0.0) +
          vec.map(v => 1.0 / (v + 60)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expected) < 1e-9, r.toString)
      if (kw.nonEmpty && vec.nonEmpty) both += 1
    }
    assert(both >= 1, "no doc retrieved by both lists - fusion untested")
    // fused order is by rrf desc (doc_id tie-break) - monotone down the list
    val rrfs = rows.map(_.getDouble(3)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("q139: covariance matrix matches a driver-side brute force at sf0.001") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"embedding".cast("array<double>")).as[Array[Double]].collect()
    val n = vecs.length.toDouble
    val dims = vecs.head.length
    val expected = (for (i <- 0 until dims; j <- i until dims) yield {
      val sij = vecs.map(v => v(i) * v(j)).sum
      val si = vecs.map(_(i)).sum
      val sj = vecs.map(_(j)).sum
      (i.toLong, j.toLong,
        BigDecimal(sij / n - (si / n) * (sj / n))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toSet
    val out = VectorOps.q139EmbeddingCovariance(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.size == dims * (dims + 1) / 2)
    // summation-order wobble can flip a rounded 6th decimal on a knife-edge
    // value; compare at 1e-6 tolerance keyed by (i, j), not set equality
    val em = expected.map(t => (t._1, t._2) -> t._3).toMap
    out.foreach { case (i, j, c) =>
      assert(math.abs(c - em((i, j))) <= 1.000001e-6, s"cov($i,$j): $c vs ${em((i, j))}")
    }
  }

  test("q139: the Aggregator's partial-buffer merge is exact across a forced " +
    "multi-partition layout (same triples as a single partition)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("v"))
    def run(parts: Int) = df.repartition(parts)
      .agg(graft.functions.TypedAggregators.covarianceMatrix($"v", 64).as("c"))
      .select(explode($"c").as("e")).select($"e._1", $"e._2", $"e._3")
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    val one = run(1)
    val many = run(13)
    assert(one.keySet == many.keySet)
    // merge is float-exact only up to reassociation; pin to 1e-12 absolute
    one.foreach { case (k, c) => assert(math.abs(c - many(k)) < 1e-9, s"$k: $c vs ${many(k)}") }
  }

  test("q139: the ROUNDED output is bit-identical under merge orders forced " +
    "by 1 / 7 / 32-partition layouts (the oracle-gate determinism pin)") {
    import spark.implicits._
    // Different partition counts force different Welford/Chan merge trees;
    // the single round-at-6 must absorb every bit of the resulting
    // reassociation noise (~1e-16 relative) — EXACT equality, no tolerance.
    // Force the merge-order variation directly: repartition the scan feeding
    // the Aggregator (shuffle.partitions alone doesn't split a global agg's
    // map side), at three layouts.
    def runPartitioned(parts: Int): Map[(Long, Long), Double] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        import org.apache.spark.sql.functions.{explode, round}
        spark.read.parquet(s"$sf0001/embeddings.parquet")
          .select($"embedding".cast("array<double>").as("v"))
          .repartition(parts)
          .agg(graft.functions.TypedAggregators.covarianceMatrix($"v", 64).as("c"))
          .select(explode($"c").as("e"))
          .select($"e._1".cast("long"), $"e._2".cast("long"),
            round($"e._3", 6))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val base = runPartitioned(1)
    Seq(7, 32).foreach { p =>
      val other = runPartitioned(p)
      assert(other == base, s"rounded covariance differs between 1 and $p partitions")
    }
    // and the production query itself agrees with the 1-partition ground run
    val prod = VectorOps.q139EmbeddingCovariance(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(prod == base, "q139's own plan disagrees with the pinned layout")
  }

  test("q153: semantic decon matches a driver-side brute force — per train " +
    "vector the max eval cosine, the argmax eval id (smallest on ties), and " +
    "the leak flag computed from the ROUNDED similarity") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val eval = all.filter(_._1 % 19 == 0)
    val train = all.filter(_._1 % 19 != 0)
    assert(eval.nonEmpty && train.nonEmpty)
    val exp = train.map { case (id, v) =>
      id -> eval.map { case (eid, ev) => (cos(v, ev), eid) }
        .maxBy { case (s, eid) => (s, -eid) }
    }.toMap
    val got = VectorOps.q153SemanticDecon(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.keySet == exp.keySet, "train coverage")
    got.foreach { case (id, (eid, sim, leaky)) =>
      val (es, eeid) = exp(id)
      assert(eid == eeid, s"vec $id argmax: $eid vs $eeid")
      // the query emits the 6-rounded similarity; HALF_UP like its round()
      assert(sim == VectorOps.snapHalfUp(es, 6), s"vec $id sim: $sim vs $es")
      assert(leaky == (sim >= 0.35), s"vec $id flag at rounded $sim")
    }
    // the flag marks a nonempty strict minority on the fixture
    val flagged = got.values.count(_._3)
    assert(flagged > 0 && flagged < got.size, s"degenerate flag split: $flagged")
  }

  test("q139/q147 @ sf0.01: the five boundary entries that the r12 double-round " +
    "manufactured into cross-engine ties are pinned to their single-round values") {
    // VERDICT r12 #1: round(round(x,9),6) snapped four sf0.01 covariance
    // entries and one q147 residual onto exact 6-decimal half-boundaries,
    // where Spark (BigDecimal shortest-repr HALF_UP) and DuckDB
    // (binary-product round) tie-break differently. With the single
    // round-at-6, every raw value sits ≥1e-11 clear of its boundary and
    // both engines agree; pin the rounded doubles so any future display
    // change that re-manufactures the ties fails here first.
    val sf001 = "/root/testdata/sf0.01"
    val cov = VectorOps.q139EmbeddingCovariance(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cov((17L, 29L)) == 0.000544, s"(17,29): ${cov((17L, 29L))}")
    assert(cov((42L, 54L)) == 0.000598, s"(42,54): ${cov((42L, 54L))}")
    assert(cov((18L, 42L)) == 0.000642, s"(18,42): ${cov((18L, 42L))}")
    assert(cov((29L, 46L)) == 0.000051, s"(29,46): ${cov((29L, 46L))}")
    val v229 = VectorOps.q147WhitenTopTwo(spark, sf001)
      .where(org.apache.spark.sql.functions.col("vec_id") === 229L).collect()(0)
    assert(v229.getDouble(1) == -0.044658, s"top_coef: ${v229.getDouble(1)}")
    assert(v229.getDouble(2) == 0.006173, s"second_coef: ${v229.getDouble(2)}")
    // raw resid = 1.0026015001… — legitimately ABOVE the half-boundary; the
    // r12 9-snap dragged it to 1.00260149999…, flipping DuckDB to 1.002601
    assert(v229.getDouble(3) == 1.002602, s"resid_norm: ${v229.getDouble(3)}")
  }

  test("q139 signed-zero regression: entry (5,9) at sf0.01 rounds to ZERO with " +
    "a clear sign bit, and every rounded oracle display is +0-normalized") {
    // VERDICT r13 #1: the raw (5,9) covariance at sf0.01 is −3.508e−7.
    // DuckDB's round keeps the IEEE sign bit (−0.0, 0x8000000000000000);
    // Spark's BigDecimal round cannot represent −0.0 (+0.0, 0x0) — the
    // values are EQUAL but the driver hashes representations, and this
    // one entry was the q139/q144 red for three rounds. The oracle text
    // normalizes with `round(...) + 0` (IEEE: −0.0 + 0 = +0.0, exact
    // no-op for every nonzero value); the Spark side needs no change.
    val sf001 = "/root/testdata/sf0.01"
    val cov = VectorOps.q139EmbeddingCovariance(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val e59 = cov((5L, 9L))
    assert(e59 == 0.0, s"(5,9) no longer rounds to zero: $e59 — the fixture " +
      "moved; re-derive the signed-zero pin")
    assert(java.lang.Double.doubleToRawLongBits(e59) == 0L,
      f"(5,9) sign bit set: 0x${java.lang.Double.doubleToRawLongBits(e59)}%016x")
    // the normalization must stay in the oracle texts (q144 reuses q139Sql)
    assert(VectorOps.q139Sql.contains("+ 0 AS cov"), "q139Sql lost its + 0")
    assert(VectorOps.q143Sql.contains("+ 0 AS top_coef"), "q143Sql lost its + 0")
    assert(VectorOps.q147Sql.contains("+ 0 AS second_coef"), "q147Sql lost its + 0")
  }

  test("q147 pays the SAME number of Spark jobs to build as q143 — the " +
    "snapped covariance rides back from whiteningStats, so k = 2 costs no " +
    "second corpus aggregation (VERDICT r12 advice)") {
    // count jobs via job groups; the status tracker is listener-fed, so
    // poll until the count is stable for a moment
    def jobsDuring(group: String)(f: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try f finally spark.sparkContext.clearJobGroup()
      val t = spark.sparkContext.statusTracker
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        val n = t.getJobIdsForGroup(group).length
        if (n == last) stable += 1 else { stable = 0; last = n }
        Thread.sleep(100); waited += 1
      }
      last
    }
    val j143 = jobsDuring("vops-q143")(VectorOps.q143WhitenTopComponent(spark, sf0001))
    val j147 = jobsDuring("vops-q147")(VectorOps.q147WhitenTopTwo(spark, sf0001))
    assert(j143 > 0, "q143 construction ran no jobs — the probe is broken")
    assert(j147 == j143,
      s"q147 construction ran $j147 jobs vs q143's $j143 — a second corpus pass crept back in")
  }

  test("pca: power iteration converges to an eigenpair of the covariance " +
    "(residual small, ratio in (0,1], lambda >= max per-dim variance)") {
    val (v, lambda, ratio) = VectorOps.pcaTopComponent(spark, sf0001)
    assert(v.length == 64)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "eigenvector not unit-norm")
    assert(lambda > 0 && ratio > 0 && ratio <= 1.0, s"lambda=$lambda ratio=$ratio")
    // residual ||Cv - lambda v||_inf: rebuild C from q139 (rounded copy is
    // fine at this tolerance)
    val rows = VectorOps.q139EmbeddingCovariance(spark, sf0001).collect()
    val c = Array.ofDim[Double](64, 64)
    rows.foreach { r =>
      val (i, j, x) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      c(i)(j) = x; c(j)(i) = x
    }
    val cv = Array.tabulate(64)(i => (0 until 64).map(j => c(i)(j) * v(j)).sum)
    val resid = (0 until 64).map(i => math.abs(cv(i) - lambda * v(i))).max
    assert(resid < 1e-4, s"residual $resid")
    val maxDiag = (0 until 64).map(i => c(i)(i)).max
    assert(lambda >= maxDiag - 1e-6, s"lambda $lambda < max variance $maxDiag")
  }

  test("q147: top-two whitening is consistent with q143 (same first " +
    "coefficient), the deflated direction is near-orthogonal to the first, " +
    "and removing two components never leaves MORE residual than one") {
    val q143 = VectorOps.q143WhitenTopComponent(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val q147 = VectorOps.q147WhitenTopTwo(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(q147.keySet == q143.keySet)
    q147.foreach { case (id, (c1, _, resid2)) =>
      assert(c1 == q143(id)._1, s"vec $id: first coefficient diverged")
      assert(resid2 <= q143(id)._2 + 1e-5,
        s"vec $id: two-component residual ${resid2} > one-component ${q143(id)._2}")
    }
    // the snapped directions stay near-orthogonal (snap error only)
    val (w1, mu, _) = VectorOps.whiteningStats(spark, sf0001)
    val dims = w1.length
    import spark.implicits._
    val row = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("v"))
      .agg(graft.functions.TypedAggregators.covarianceMatrix($"v", dims).as("c"))
      .collect()(0)
    val c = Array.ofDim[Double](dims, dims)
    row.getAs[Seq[org.apache.spark.sql.Row]]("c").foreach { r =>
      val v = VectorOps.snapHalfUp(r.getDouble(2), 7)
      c(r.getInt(0))(r.getInt(1)) = v; c(r.getInt(1))(r.getInt(0)) = v
    }
    val lam1 = VectorOps.snapHalfUp(
      (0 until dims).map(i => (0 until dims).map(j => w1(i) * c(i)(j) * w1(j)).sum).sum, 7)
    assert(lam1 > 0, "top eigenvalue estimate must be positive")
    val c2 = Array.tabulate(dims, dims)((i, j) =>
      VectorOps.snapHalfUp(c(i)(j) - lam1 * w1(i) * w1(j), 7))
    val w2 = VectorOps.powerDirection(c2, orthoTo = Some(w1))
    val dot12 = w1.zip(w2).map { case (a, b) => a * b }.sum
    // Gram–Schmidt makes the pair orthogonal up to the component snap
    assert(math.abs(dot12) < 1e-3, s"directions not near-orthogonal: $dot12")
    assert(mu.length == dims)
  }

  test("q139: an EMPTY input yields zero covariance rows (what a SQL GROUP BY " +
    "over zero rows returns), not 2,080 fabricated zeros") {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    val none = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("v")).limit(0)
    val out = none
      .agg(graft.functions.TypedAggregators.covarianceMatrix($"v", 64).as("c"))
      .select(explode($"c")).count()
    assert(out == 0L, s"empty corpus produced $out covariance rows")
  }

  test("q140: truncation fidelity matches a driver-side brute force and error " +
    "shrinks as the kept prefix grows") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val pairs = all.keys.filter(k => k % 2 == 0 && all.contains(k + 1)).toSeq.sorted
      .map(k => (all(k), all(k + 1)))
    val out = VectorOps.q140MatryoshkaFidelity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(8L, 16L, 32L))
    Seq(8, 16, 32).foreach { w =>
      val errs = pairs.map { case (a, b) =>
        math.abs(cos(a.take(w), b.take(w)) - cos(a, b))
      }
      val (n, err) = out(w.toLong)
      assert(n == pairs.size.toLong)
      assert(math.abs(err - errs.sum / errs.size) < 1e-5, s"w=$w: $err")
    }
    // more kept dims -> strictly better fidelity on this corpus
    assert(out(8L)._2 > out(16L)._2 && out(16L)._2 > out(32L)._2, s"$out")
  }
}
