package graft

import graft.expressions.DotProduct
import org.apache.spark.sql.functions._

/** Custom codegen expression correctness: dot_native ≡ the built-in
  * aggregate(zip_with(...)) composition it replaces, under both codegen
  * and interpreted paths. */
class DotProductSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"

  test("dot_native equals the higher-order-function dot on random vectors") {
    import spark.implicits._
    DotProduct.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(100)((Array.fill(64)(rnd.nextDouble()), Array.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
      .select(expr("dot_native(a, b)").as("fast"), expr(hofDot).as("slow"))
    val bad = df.where(abs($"fast" - $"slow") > 1e-9).count()
    assert(bad === 0)
  }

  test("null input array yields null, not a crash") {
    import spark.implicits._
    DotProduct.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
      .select(expr("dot_native(a, b)").as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("length mismatch uses the common prefix (defensive, not an error)") {
    import spark.implicits._
    DotProduct.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0)))
      .toDF("a", "b").select(expr("dot_native(a, b)").as("d"))
    assert(df.collect().head.getDouble(0) === 50.0)
  }

  test("interpreted eval agrees with codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val mk = (xs: Array[Double]) =>
      Literal.create(ArrayData.toArrayData(xs), ArrayType(DoubleType))
    val e = DotProduct(mk(Array(1.0, 2.0)), mk(Array(3.0, 4.0)))
    assert(e.eval(null) === 11.0)
  }
}
