package graft

import graft.functions.EntityOps
import org.apache.spark.sql.functions._

/** Entity-resolution family (q154/q155/q156): blocking recall against a
  * brute-force all-pairs sweep, component/golden-record parity with a
  * driver-side transitive closure, the block-size skew guard, and the
  * no-cross-join plan pin. */
class EntityOpsSpec extends SparkSpec {

  private def allNames: Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_name").distinct().as[String].collect().toSeq.sorted
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("q154 blocking has FULL pair recall on the fixture: every all-pairs " +
    "match within the edit threshold shares an adjective or noun block " +
    "(and the distances agree with a driver-side Levenshtein)") {
    val names = allNames
    val brute = (for {
      i <- names.indices; j <- (i + 1) until names.length
      d = lev(names(i), names(j)) if d <= EntityOps.MatchMaxDist
    } yield (names(i), names(j), d.toLong)).toSet
    assert(brute.nonEmpty, "fixture degenerate: no close name pairs at all")
    val got = EntityOps.q154ErPairs(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == brute,
      s"blocked-only: ${(got -- brute).take(3)}; missed: ${(brute -- got).take(3)}")
  }

  test("q155 entities equal a driver-side transitive closure of the match " +
    "graph; each entity_id is the MIN record key among its members and the " +
    "canonical name is that key's name; singleton names keep themselves") {
    import spark.implicits._
    val nm = spark.read.parquet(s"$sf0001/part.parquet")
      .groupBy($"p_name").agg(min($"p_partkey").cast("long").as("nid"))
      .as[(String, Long)].collect().toMap
    // brute-force closure over the spec's own brute edges
    val names = allNames
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for {
      i <- names.indices; j <- (i + 1) until names.length
      if lev(names(i), names(j)) <= EntityOps.MatchMaxDist
    } {
      val (ra, rb) = (find(names(i)), find(names(j)))
      if (ra != rb) {
        // keep the root at the member with the smallest nid — the contract
        if (nm(ra) < nm(rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val expectEntity: Map[String, Long] = names.map(n => n -> nm(find(n))).toMap
    val got = EntityOps.q155ErEntities(spark, sf0001).collect()
    val gotByName: Map[String, (Long, String)] = got.flatMap { r =>
      val eid = r.getLong(0); val canon = r.getString(1)
      names.filter(n => expectEntity(n) == eid).map(_ -> (eid, canon))
    }.toMap
    // every entity id is the min member nid and its canonical name matches
    got.foreach { r =>
      val eid = r.getLong(0)
      val members = names.filter(n => expectEntity(n) == eid)
      assert(members.nonEmpty, s"entity $eid has no brute-force members")
      assert(members.map(nm).min == eid, s"entity $eid is not its min member key")
      val canonName = nm.collectFirst { case (n, id) if id == eid => n }.get
      assert(r.getString(1) == canonName,
        s"entity $eid canonical ${r.getString(1)} != $canonName")
      assert(r.getLong(2) == members.size,
        s"entity $eid variants ${r.getLong(2)} != ${members.size}")
    }
    assert(got.length == expectEntity.values.toSet.size,
      s"entity count ${got.length} != brute ${expectEntity.values.toSet.size}")
    assert(gotByName.size == names.size)
    // record conservation: entities partition the record table
    val totalRecords = spark.read.parquet(s"$sf0001/part.parquet").count()
    assert(got.map(_.getLong(3)).sum == totalRecords)
  }

  test("q156 report: both blocking passes appear, candidates bound matches, " +
    "and pairs_quality is the rounded ratio") {
    val rows = EntityOps.q156ErBlockingReport(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == Set("adj", "noun"))
    rows.foreach { r =>
      val (cand, m) = (r.getLong(3), r.getLong(4))
      assert(m <= cand, s"${r.getString(0)}: matches $m > candidates $cand")
      assert(r.getDouble(5) ==
        BigDecimal(m.toDouble / cand).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("q157 scores EVERY blocked candidate (pairs sharing an adjective or " +
    "noun token), the weight equals a driver-side Fellegi-Sunter recompute " +
    "exactly, the decision follows the thresholds on the rounded weight, " +
    "and all three decision classes occur on the fixture") {
    import spark.implicits._
    val attrs = spark.read.parquet(s"$sf0001/part.parquet")
      .groupBy($"p_name").agg(
        min($"p_brand").as("brand"),
        floor(avg($"p_size") / 10).cast("long").as("szb"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val names = allNames
    def toks(n: String) = (n.split(" ").head, n.split(" ").last)
    val expectPairs = (for {
      i <- names.indices; j <- (i + 1) until names.length
      (a1, n1) = toks(names(i)); (a2, n2) = toks(names(j))
      if a1 == a2 || n1 == n2
    } yield (names(i), names(j))).toSet
    val got = EntityOps.q157ErMatchWeights(spark, sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == expectPairs)
    got.foreach { r =>
      val (na, nb) = (r.getString(0), r.getString(1))
      val (aa, nna) = toks(na); val (ab, nnb) = toks(nb)
      val agrees = Seq(
        "adj" -> (aa == ab), "noun" -> (nna == nnb),
        "near" -> (lev(na, nb) <= 1),
        "brand" -> (attrs(na)._1 == attrs(nb)._1),
        "size" -> (attrs(na)._2 == attrs(nb)._2))
      val w = agrees.map { case (f, ok) =>
        if (ok) EntityOps.FsAgreeW(f) else EntityOps.FsDisagreeW(f) }
        .reduceLeft(_ + _)
      val expectW = BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(2) == agrees.count(_._2), s"$na/$nb agreements")
      assert(r.getDouble(3) == expectW,
        s"$na/$nb weight ${r.getDouble(3)} != $expectW")
      val expectD =
        if (expectW >= EntityOps.FsUpper) "match"
        else if (expectW < EntityOps.FsLower) "non_match"
        else "possible"
      assert(r.getString(4) == expectD, s"$na/$nb decision")
    }
    val classes = got.map(_.getString(4)).toSet
    assert(classes == Set("match", "possible", "non_match"),
      s"fixture exercises only $classes — threshold placement degenerate")
  }

  test("q161 threshold evaluation equals a rollup of q157's own rows and " +
    "partitions the full candidate set across the decision classes") {
    val scored = EntityOps.q157ErMatchWeights(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(4)))
    val expected = scored.groupBy(_._3).map { case (dec, ps) =>
      val em = ps.count(p => lev(p._1, p._2) <= EntityOps.MatchMaxDist)
      (dec, ps.length.toLong, em.toLong,
        BigDecimal(em.toDouble / ps.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = EntityOps.q161ErThresholdEval(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected, s"got $got vs $expected")
    assert(got.map(_._2).sum == scored.length.toLong)
  }

  test("the block-size cap is a real skew guard: capping at 1 empties the " +
    "candidate set entirely (every fixture block has >= 2 members)") {
    assert(EntityOps.q154ErPairs(spark, sf0001, cap = 1L).count() == 0L)
  }

  test("oracle adj/noun extraction matches the engine's substring_index " +
    "semantics for 3-token and space-free names, not just the fixture's " +
    "two-token shape (ADVICE r13: the old after-first-space oracle " +
    "silently diverged on anything but exactly one space)") {
    import spark.implicits._
    // the exact neutral fragment the four ER oracle texts use (pinned
    // below so the texts can't drift from what this test exercises)
    val adjSql = "CASE WHEN instr(p_name, ' ') = 0 THEN p_name " +
      "ELSE substr(p_name, 1, instr(p_name, ' ') - 1) END"
    val nounSql = "CASE WHEN instr(p_name, ' ') = 0 THEN p_name " +
      "ELSE substr(p_name, length(p_name) - instr(reverse(p_name), ' ') + 2) END"
    Seq("promo burnished", "goldenrod lavender spring chocolate lace",
      "plain", "a b", "x  y") // double space: '' adj-side token boundary
      .toDF("p_name")
      .select($"p_name",
        expr(adjSql).as("adj_sql"), expr(nounSql).as("noun_sql"),
        substring_index($"p_name", " ", 1).as("adj_engine"),
        substring_index($"p_name", " ", -1).as("noun_engine"))
      .collect().foreach { r =>
        assert(r.getString(1) == r.getString(3),
          s"adj diverges for '${r.getString(0)}': sql=${r.getString(1)} engine=${r.getString(3)}")
        assert(r.getString(2) == r.getString(4),
          s"noun diverges for '${r.getString(0)}': sql=${r.getString(2)} engine=${r.getString(4)}")
      }
    // and the live oracle texts carry exactly this extraction
    Seq(EntityOps.q154Sql, EntityOps.q155Sql, EntityOps.q156Sql).foreach { sql =>
      assert(sql.contains("instr(reverse(p_name), ' ')"),
        "an ER oracle text lost the last-token noun extract")
    }
  }

  test("the pipeline is a LIBRARY, not a part-table special case: a people " +
    "schema with its own blocking passes (first initial + surname) runs the " +
    "same block→cap→compare→cluster spine end to end") {
    import spark.implicits._
    // dirty person records: same people under typo'd names, a different
    // id column, and a surname-colliding distinct person
    val people = Seq(
      (101L, "jon smith"), (102L, "john smith"), (103L, "jon smyth"),
      (104L, "mary jones"), (105L, "mary jones"), (106L, "marie jones"),
      (107L, "zed qux")
    ).toDF("person_id", "full_name")
    val blockers: Seq[EntityOps.Blocker] = Seq(
      "initial" -> (n => substring(substring_index(n, " ", 1), 1, 1)),
      "surname" -> (n => substring_index(n, " ", -1)))
    val labels = EntityOps.resolveEntities(
      people, "person_id", "full_name", blockers, maxDist = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // smith/smyth variants merge (surname block, lev<=2); jones variants
    // merge; zed qux is a singleton labeled by its own nid
    assert(labels("jon smith") === labels("john smith"))
    assert(labels("jon smith") === labels("jon smyth"))
    assert(labels("mary jones") === labels("marie jones"))
    assert(labels("zed qux") === 107L)
    assert(labels("jon smith") !== labels("mary jones"))
    // entity id = min member nid: the smith cluster labels as 101
    assert(labels("jon smith") === 101L)
    // the cap is schema-independent skew armor: cap 1 kills every block
    // (each holds >=2 names here), so everyone is a singleton
    val capped = EntityOps.resolveEntities(
      people, "person_id", "full_name", blockers, maxDist = 2, cap = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(capped.values.toSet.size === capped.size,
      s"cap=1 should isolate every name: $capped")
    // generic candidate pairs respect the pass list: initial-pass pairs
    // j* names; surname-pass pairs the joneses and smiths
    val cands = EntityOps.candidatePairsOfNames(
      people.select($"full_name".as("name")).distinct(), blockers)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cands.contains(("jon smith", "jon smyth")))
    assert(cands.contains(("marie jones", "mary jones")))
    assert(!cands.exists { case (a, b) => a.contains("qux") || b.contains("qux") })
  }

  test("the skeleton pass buys recall exactly where token blocking is blind " +
    "(both tokens vowel-typo'd), at a visible pair-budget cost, and q173 is " +
    "a strict superset of q154 on the real fixture") {
    import spark.implicits._
    // 1-2: both tokens carry vowel typos — no shared adj, no shared noun,
    // same consonant skeleton ("rctc"); 3-4: the noun pass still catches
    val recs = Seq(
      (1L, "arctic rose"), (2L, "erctic rosa"),
      (3L, "misty plum"), (4L, "musty plum"),
      (5L, "navy linen")
    ).toDF("rid", "name")
    val names = recs.select($"name").distinct()
    def pairs(bs: Seq[EntityOps.Blocker]): Set[(String, String)] =
      EntityOps.candidatePairsOfNames(names, bs)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val two = pairs(EntityOps.PartBlockers)
    val three = pairs(EntityOps.PartBlockers3)
    assert(two.subsetOf(three), "adding a pass must only ADD candidates")
    assert(!two(("arctic rose", "erctic rosa")), "2-pass should be blind here")
    assert(three(("arctic rose", "erctic rosa")), "skeleton pass missed its case")
    // the recall gain has a bounded, measurable budget — q156's framing:
    // extra candidates, not an all-pairs blowup
    assert(three.size > two.size && three.size <= two.size + names.count(),
      s"pair budget: ${two.size} -> ${three.size}")
    // end to end through the library seam: 3 passes merge the pair,
    // 2 passes leave them apart
    val l3 = EntityOps.resolveEntities(recs, "rid", "name", EntityOps.PartBlockers3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(l3("arctic rose") === l3("erctic rosa"))
    assert(l3("arctic rose") === 1L, "entity id = min member key")
    val l2 = EntityOps.resolveEntities(recs, "rid", "name")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(l2("arctic rose") !== l2("erctic rosa"))
    // on the real part fixture the 3-pass pair report q173 oracle-gates
    // is a superset of q154's
    val p154 = EntityOps.q154ErPairs(spark, sf0001)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val p173 = EntityOps.q173ErPairs3Pass(spark, sf0001)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(p154.subsetOf(p173),
      s"q173 lost q154 pairs: ${(p154 -- p173).take(3)}")
  }

  test("the solver-choice probe is job-capped: deciding local-vs-iterative " +
    "on an over-cap graph touches only as many partitions as it takes to " +
    "see cap+1 edges, never the whole graph (and the boundary is exact)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("edge_rows_computed")
    val total = 100000L
    val big = spark.range(0, total, 1, 32)
      .map { i => acc.add(1); (i, i + 1) }.toDF("doc_a", "doc_b")
    assert(!graft.functions.TextOps.isSubcritical(big, cap = 10L))
    assert(acc.value < total,
      s"probe materialized the whole graph: ${acc.value} of $total rows")
    // exact boundary: cap edges is subcritical, cap+1 is not
    val three = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    assert(graft.functions.TextOps.isSubcritical(three, cap = 3L))
    assert(!graft.functions.TextOps.isSubcritical(three, cap = 2L))
  }

  test("the part-table family IS the library defaults: entityLabels equals " +
    "resolveEntities(part, p_partkey, p_name) row for row") {
    val viaFamily = EntityOps.entityLabels(spark, sf0001)
    val viaLibrary = EntityOps.resolveEntities(
      spark.read.parquet(s"$sf0001/part.parquet"), "p_partkey", "p_name")
    assert(viaFamily.exceptAll(viaLibrary).count() === 0)
    assert(viaLibrary.exceptAll(viaFamily).count() === 0)
  }

  test("plan pin: no CartesianProduct / BroadcastNestedLoopJoin anywhere in " +
    "the family — candidate generation is equi-joins on block keys") {
    Seq(EntityOps.q154ErPairs(spark, sf0001),
      EntityOps.q156ErBlockingReport(spark, sf0001),
      EntityOps.q157ErMatchWeights(spark, sf0001)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    }
  }
}
