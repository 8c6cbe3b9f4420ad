package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions wiring: dot_native available via catalog
  * injection, and the optimizer rule rewrites the interpreted HOF dot
  * into the codegen expression with identical results. Uses its own
  * session — extensions bind at session build time. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would silently reuse another spec's session (without
    // the extensions) when suites share the JVM — force a new session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      // withExtensions, not config("spark.sql.extensions", ...): the
      // config form only applies when the SparkContext itself is new,
      // and suites in this JVM share one context. Production
      // spark-submit uses --conf spark.sql.extensions=graft.expressions.GraftExtensions
      .withExtensions(ext => new graft.expressions.GraftExtensions()(ext))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    assert(s.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dot_native")),
      "extensions did not apply — session was reused")
    s
  }

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"

  test("injected dot_native works through plain spark.sql with no manual registration") {
    val r = spark.sql(
      "SELECT dot_native(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect().head
    assert(r.getDouble(0) === 11.0)
  }

  test("optimizer rule rewrites the HOF dot-product pattern to dot_native") {
    // a parquet-backed input: a LocalRelation would be constant-folded
    // away before the rewrite is observable
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS a",
                  "CAST(embedding AS ARRAY<DOUBLE>) AS b")
      .selectExpr(s"$hof AS d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_native"), optimized)
    val viaRule = df.agg(org.apache.spark.sql.functions.sum("d")).collect().head.getDouble(0)
    val direct = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("dot_native(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS d")
      .agg(org.apache.spark.sql.functions.sum("d")).collect().head.getDouble(0)
    assert(math.abs(viaRule - direct) < 1e-9)
  }

  test("rule leaves non-matching aggregates alone") {
    import spark.implicits._
    // different combine function (+ on squares) — must NOT be rewritten
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> x + y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS s")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("dot_native"), optimized)
    assert(df.collect().head.getDouble(0) === 10.0)
  }
}
