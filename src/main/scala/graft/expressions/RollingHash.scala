package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling polynomial fingerprint h = fold(chars, (h*31 + c) mod p)
  * with p = 1e9+7 — the content-defined hash q45 computes.
  *
  * The built-in form `aggregate(transform(split(s, ''), c -> ascii(c)),
  * 0L, (acc, x) -> (acc*31 + x) % p)` is semantically right but runs as
  * interpreted lambdas materializing a per-character array for every row
  * — at corpus scale that interpreter loop IS the scan cost. This
  * expression folds in a tight JVM loop (one static call per row from
  * whole-stage codegen). Char semantics match the built-in composition
  * exactly: UTF-16 code units, identical to `split('')` + `ascii` for
  * all BMP text (and bit-compatible for unpaired surrogates).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_native requires a string input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_hash_native"

  override protected def nullSafeEval(s: Any): Any =
    RollingHash.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Mod = 1000000007L

  /** Folds UNICODE CODE POINTS (not UTF-16 code units): a surrogate pair
    * contributes one term, its code point — matching both Spark's
    * `split('') + ascii` composition and DuckDB's `string_split('') +
    * ascii`, which are code-point based (RollingHashSpec pins a
    * non-BMP input against both). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Register `rolling_hash_native(s)` as a temp SQL function
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash_native", args => RollingHash(args(0)), "built-in")
}
