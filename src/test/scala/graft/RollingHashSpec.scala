package graft

import graft.expressions.RollingHash
import org.apache.spark.sql.functions._

/** The codegen rolling hash must be bit-identical to the built-in HOF
  * composition it replaces (q45's oracle depends on these exact values). */
class RollingHashSpec extends SparkSpec {

  private val hofExpr =
    """aggregate(transform(split(s, ''), c -> ascii(c)),
      |          CAST(0 AS BIGINT),
      |          (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  test("rolling_hash_native equals the interpreted HOF fold on varied inputs") {
    import spark.implicits._
    RollingHash.register(spark)
    val inputs = Seq(
      "", "a", "hello world", "  padded  ",
      "größe straße", "naïve café", "中文文档内容", "mixed 中文 and ascii 123",
      "!@#$%^&*()", "a" * 5000,
      "a𝄞b", "emoji 😀 doc") // astral chars: surrogate PAIRS fold as one code point
    val rows = inputs.toDF("s")
      .select(expr("rolling_hash_native(s)").as("native"), expr(hofExpr).as("hof"))
      .collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for input '$in'")
    }
  }

  test("astral input folds code points — the DuckDB oracle's semantics") {
    import spark.implicits._
    RollingHash.register(spark)
    // fold of [97, 0x1D11E, 98] — cross-checked against DuckDB's
    // list_reduce over string_split('a𝄞b', '')
    val h = Seq("a𝄞b").toDF("s")
      .select(expr("rolling_hash_native(s)")).head().getLong(0)
    assert(h == 3784485L)
  }

  test("rolling_hash_native stays inside whole-stage codegen") {
    // a parquet scan, not a local relation — LocalTableScan plans skip
    // codegen regardless of the expression
    RollingHash.register(spark)
    val df = Tables(spark, sf0001, "documents")
      .selectExpr("rolling_hash_native(text) AS h")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
