package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed Aggregators (SURVEY §2.11's reserve path — used only
  * where built-ins genuinely can't express the aggregate).
  *
  * Aggregators get Spark's full partial-aggregation treatment: the
  * reduce runs map-side, merge runs after the shuffle — the same
  * two-phase shape as built-in sums, so they scale identically.
  */
object TypedAggregators {

  /** Geometric mean = exp(mean(ln x)), accumulated as (Σ ln x, n) so
    * partial buffers merge exactly. Non-positive inputs are skipped
    * (ln undefined), matching SQL's null-skipping aggregate contract. */
  object GeometricMean extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: java.lang.Double): (Double, Long) =
      if (x == null || x <= 0.0) b else (b._1 + math.log(x), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): java.lang.Double =
      if (b._2 == 0) null else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** GeometricMean as an untyped column aggregate for groupBy().agg. */
  def geometricMean(c: Column): Column = udaf(GeometricMean).apply(c)
}
