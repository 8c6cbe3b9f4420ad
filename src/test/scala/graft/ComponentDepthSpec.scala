package graft

import graft.functions.{EntityOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ties [[SparkSqlTwins.ComponentLevels]] to MEASURED fixture depth
  * (VERDICT r18 #3): the unrolled label-propagation twins are exact
  * whenever the graph's synchronous min-label propagation depth is
  * ≤ K, and the convergence witness inside each twin makes a shortfall
  * loudly wrong — but only at DRIVER-GATE time (an `assert_true`
  * failure inside oracle verification), which is the wrong place to
  * first learn that a fixture regeneration deepened the near-dup or ER
  * graph. This spec computes the depth of both fixture graphs WITH THE
  * ENGINE ITSELF — the exact iteration the twins unroll: symmetrized
  * edges + self-loops, identity labels, synchronous `min(lbl)` over
  * in-neighbors per round, depth = rounds until fixpoint — and asserts
  * `depth + 2 ≤ ComponentLevels`, so a deepened graph fails HERE, a
  * local test naming the margin, before any driver gate runs.
  *
  * Both label domains the ER twins use are measured (numeric min-nid
  * for q155's chain, the name string for q162's — where the minimum
  * label SITS in a component can change how many rounds it takes to
  * reach every node). sf0.01 is the gate (the suite's affordable SF);
  * the r18 verdict's measured depths — candidates 1/2/4 at
  * sf0.001/0.01/0.1, ER 4 at every SF — mean the binding fixture is
  * ER, which this spec measures at its worst recorded depth. */
class ComponentDepthSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  /** Synchronous min-label propagation depth: rounds until one more
    * round changes no label. `pairs(a, b)` is the undirected match/
    * candidate edge list; `l0(node, lbl)` the identity labeling (every
    * node present — isolated nodes converge at round 0). */
  private def depthOf(pairs: DataFrame, a: String, b: String,
      l0: DataFrame): Int = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .union(l0.select(col("node").as("src"), col("node").as("dst")))
      .localCheckpoint()
    var labels = l0.localCheckpoint()
    var depth = 0
    var changed = true
    while (changed) {
      assert(depth <= 16, "propagation did not converge in 16 rounds - " +
        "the fixture graph has degenerated into a long chain")
      val next = edges.as("e")
        .join(labels.as("l"), col("e.src") === col("l.node"))
        .groupBy(col("e.dst").as("node")).agg(min(col("l.lbl")).as("lbl"))
        .localCheckpoint()
      changed = next
        .join(labels.withColumnRenamed("lbl", "prev"), Seq("node"))
        .where(col("lbl") =!= col("prev")).limit(1).count() > 0
      if (changed) { depth += 1; labels = next }
    }
    depth
  }

  private def assertBudget(what: String, depth: Int): Unit =
    assert(depth + 2 <= SparkSqlTwins.ComponentLevels,
      s"$what propagation depth $depth leaves less than the 2-round " +
        s"margin under ComponentLevels=${SparkSqlTwins.ComponentLevels} " +
        "- a fixture regeneration deepened the graph; raise K in " +
        "SparkSqlTwins (the convergence witness would fail the driver " +
        "gate loudly, but this is the place to learn it)")

  test("near-dup candidate graph: measured propagation depth + 2 fits " +
    "inside ComponentLevels at sf0.01") {
    val cand = TextOps.q30MinHashLsh(spark, sfDir)
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("node"), col("doc_id").as("lbl"))
    assertBudget("near-dup candidate graph",
      depthOf(cand, "doc_a", "doc_b", docs))
  }

  test("the convergence witness FAILS LOUDLY when K is under the graph's " +
    "depth (the guarantee ComponentLevels budgets against): a 6-node path " +
    "needs 5 min-label rounds, so K=2 must throw the assert_true, and " +
    "K=5 must converge to one component") {
    def chainSql(k: Int): String = {
      val edgePairs = (1 to 5).flatMap(i => Seq(s"($i, ${i + 1})", s"(${i + 1}, $i)")) ++
        (1 to 6).map(i => s"($i, $i)")
      s"""WITH edges AS (SELECT * FROM VALUES ${edgePairs.mkString(", ")} AS t(src, dst)),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
         |${SparkSqlTwins.labelPropChain(k)}
         |SELECT node, lbl FROM comp""".stripMargin
    }
    val shallow = intercept[Exception](spark.sql(chainSql(2)).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(shallow).exists(_.contains("not converged")),
      s"under-K must fail via the witness, got: ${messages(shallow).take(2)}")
    val converged = spark.sql(chainSql(5)).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(converged == (1 to 6).map(_ -> 1).toMap, converged.toString)
  }

  test("ER match graph: measured propagation depth + 2 fits inside " +
    "ComponentLevels at sf0.01, under BOTH twin label domains") {
    val pairs = EntityOps.q154ErPairs(spark, sfDir)
      .select(col("name_a"), col("name_b")).localCheckpoint()
    val names = Tables(spark, sfDir, "part")
      .groupBy(col("p_name").as("name"))
      .agg(min(col("p_partkey")).cast("long").as("nid"))
      .localCheckpoint()
    // q162's chain labels by the name string
    assertBudget("ER match graph (name labels)",
      depthOf(pairs, "name_a", "name_b",
        names.select(col("name").as("node"), col("name").as("lbl"))))
    // q155's chain labels by numeric nid = min p_partkey of the name
    val nidPairs = pairs
      .join(names.select(col("name").as("name_a"), col("nid").as("nid_a")), "name_a")
      .join(names.select(col("name").as("name_b"), col("nid").as("nid_b")), "name_b")
    assertBudget("ER match graph (nid labels)",
      depthOf(nidPairs, "nid_a", "nid_b",
        names.select(col("nid").as("node"), col("nid").as("lbl"))))
  }
}
