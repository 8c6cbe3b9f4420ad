package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `capped_collect_set(x, cap)` — collect_set with a HARD per-group size
  * bound: the distinct set of `x` per group if its cardinality is
  * ≤ cap, else NULL ("poisoned"). The 100 TB guard q31 needs: with the
  * plain collect_set, a boilerplate shingle shared by 10M docs
  * materializes a multi-GB array on ONE row before any df-cap filter can
  * drop it; here every aggregation buffer stops growing at cap+1
  * elements, so memory per group is bounded by the CAP, not the data.
  *
  * Exactness argument (why the early stop cannot lie): a buffer is
  * poisoned iff it reached cap+1 DISTINCT elements; a non-poisoned
  * buffer added every element it saw. Merging non-poisoned (complete)
  * sets unions them exactly; a poisoned buffer carries exactly cap+1
  * distinct elements, so merging it drives any target past the cap.
  * Hence: output NULL ⇔ true distinct count > cap — identical to
  * filtering `size(collect_set(x)) <= cap` afterwards, without ever
  * holding more than cap+1 values anywhere.
  *
  * Map-side combine applies (TypedImperativeAggregate partials shuffle
  * as ≤ (cap+1)·8-byte blobs), so the plan keeps the ONE exchange of the
  * collect_set form it replaces.
  */
case class CappedCollectSet(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  private lazy val cap: Int = capExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"capped_collect_set cap must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, capExpr) match {
      case (LongType, Literal(_, IntegerType | LongType)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, c) => TypeCheckResult.TypeCheckFailure(
        s"capped_collect_set requires (bigint column, int literal cap), " +
          s"got (${t.catalogString}, $c)")
    }

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  // poison convention: size == cap+1. The guard keeps the buffer from
  // ever growing past cap+1 regardless of input volume.
  override def update(
      buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null && buf.size <= cap) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.HashSet[Long], other: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = other.iterator()
    while (it.hasNext && buf.size <= cap) buf.add(it.next())
    buf
  }

  override def eval(buf: java.util.HashSet[Long]): Any =
    if (buf.size > cap) null
    else {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      new GenericArrayData(arr)
    }

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.HashSet[Long](math.max(8, n * 2))
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_collect_set"
  override def children: Seq[Expression] = Seq(child, capExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectSet =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

object CappedCollectSet {
  /** Register `capped_collect_set(col, cap)` as a temp SQL aggregate
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "capped_collect_set", args => CappedCollectSet(args(0), args(1)), "built-in")
}
