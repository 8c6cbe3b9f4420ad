package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash over a token array — the per-row form of q32's
  * sketch. Semantics are EXACTLY the declarative composition the oracle
  * computes (distinct tokens; per token, md5 hex digits 1..16 vote
  * +1 when the digit ≥ 8 — i.e. the nibble's high bit — else −1; the
  * sign of each digit's vote total is that bit, ties → '1'):
  * digit i ≥ 8 ⇔ high bit of nibble i of the MD5 digest.
  *
  * Why an Expression and not the explode+groupBy form: the declarative
  * q32 shuffles one row PER (doc, token) into a 16-sum aggregate —
  * combiner-friendly but still a corpus-wide exchange whose width is the
  * token multiset. This computes the whole sketch inside the scan (one
  * static call per row from whole-stage codegen, one MessageDigest
  * reused across tokens), so the operator needs NO shuffle at all —
  * the same per-row-beats-exchange trade as [[DotProduct]] and
  * [[RollingHash]]. TextDedupSpec pins equivalence against the
  * declarative form.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_native requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "simhash_native"

  override protected def nullSafeEval(a: Any): Any =
    SimHash.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  /** One pass over the array: dedup via a hash set (array_distinct
    * semantics — first occurrence wins, null elements skipped), MD5 of
    * each distinct token's UTF-8 bytes (what Spark's and DuckDB's `md5`
    * hash), nibble-sign votes, 16-char '1'/'0' sketch. */
  def compute(arr: ArrayData): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (seen.add(t.clone())) {
          md.reset()
          val dig = md.digest(t.getBytes)
          var j = 0
          while (j < 8) {
            val b = dig(j) & 0xFF
            votes(2 * j) += (if ((b >>> 4) >= 8) 1 else -1)
            votes(2 * j + 1) += (if ((b & 0xF) >= 8) 1 else -1)
            j += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var k = 0
    while (k < 16) {
      out(k) = if (votes(k) >= 0) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Register `simhash_native(arr)` as a temp SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_native", args => SimHash(args(0)), "built-in")
}
