package graft

import graft.plans.{TopK, TopKPerGroupPartialExec}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerGroup operator (LogicalPlan + Strategy + SparkPlan):
  * result equivalence with the window form, plan shape, and the map-side
  * shuffle bound that is its reason to exist. */
class TopKSpec extends SparkSpec {

  test("topKPerGroup matches row_number window semantics, ties broken deterministically") {
    import spark.implicits._
    val orders = Tables(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val custom = TopK.perGroup(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select($"o_custkey", $"o_orderkey", $"rn".cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val windowed = orders.withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(custom == windowed)
    assert(custom.nonEmpty)
  }

  test("plan shape: partial exec feeds the exchange, final exec follows it") {
    import spark.implicits._
    val df = TopK.perGroup(
      Tables(spark, sf0001, "orders").select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), plan)
    assert(plan.contains("TopKPerGroupFinal"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    // partial must be BELOW the exchange (map side), final above it
    val partialIdx = plan.indexOf("TopKPerGroupPartial")
    val finalIdx = plan.indexOf("TopKPerGroupFinal")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"final=$finalIdx exchange=$exchangeIdx partial=$partialIdx\n$plan")
  }

  test("map-side partial bounds shuffle input to k rows per group per partition") {
    import spark.implicits._
    // heavy-hitter group: 10,000 rows, one group, 4 input partitions —
    // the window form would shuffle all 10,000; the partial emits ≤ k×4
    val skewed = spark.createDataset(1 to 10000).repartition(4)
      .map(i => (1L, i.toLong)).toDF("g", "v")
    skewed.collect() // settle AQE so executedPlan is final
    val analyzed = skewed.queryExecution.analyzed
    val g = analyzed.output.find(_.name == "g").get
    val v = analyzed.output.find(_.name == "v").get
    val partial = TopKPerGroupPartialExec(
      Seq(g), Seq(SortOrder(v, Ascending)), 3, skewed.queryExecution.executedPlan)
    val emitted = partial.execute().count()
    assert(emitted <= 3 * 4, s"partial emitted $emitted rows")
    assert(emitted >= 3, s"partial emitted $emitted rows")
  }

  test("property: custom operator matches the window form on random data (nulls, ties, k >= group size)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = Gen.listOfN(60, for {
      g <- Gen.choose(1, 5)
      v <- Gen.option(Gen.choose(-10, 10)) // null order values + heavy ties
    } yield (g, v))
    (0 until 6).foreach { i =>
      val rows = rowGen.apply(Gen.Parameters.default, Seed(7L + i)).get
        .zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) } // unique tie-break
      val df = rows.toDF("g", "v", "id")
      val k = 1 + i % 4
      val custom = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), k)
        .select($"g", $"id", $"rn".cast("long"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      val windowed = df.withColumn("rn", row_number().over(w)).where($"rn" <= k)
        .select($"g", $"id", $"rn".cast("long"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(custom == windowed, s"seed ${7 + i}, k=$k")
    }
  }

  test("rank column is 1-based and dense within each group") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 20), (1, 30), (1, 40), (2, 5)).toDF("g", "v")
    val out = TopK.perGroup(df, Seq("g"), Seq(("v", false)), 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(out.toSet == Set((1, 40, 1), (1, 30, 2), (2, 5, 1)))
  }
}
