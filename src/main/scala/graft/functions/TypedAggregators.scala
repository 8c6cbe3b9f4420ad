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

  /** Full covariance matrix of a fixed-width vector column in ONE pass.
    *
    * Why an Aggregator and not q93's scalar-aggregate layout: the upper
    * triangle of a dims-wide covariance needs dims·(dims+1)/2 product
    * sums (2,080 at dims = 64) — as separate agg columns that is a
    * ~2,100-expression Aggregate node, past what codegen compiles
    * comfortably. One typed buffer of 1 + dims + dims·(dims+1)/2
    * doubles gets the same two-phase treatment as a built-in sum
    * (reduce map-side, merge post-shuffle — `ScalaAggregator` is a
    * `TypedImperativeAggregate`, so within a partition the buffer stays
    * a live JVM array and only task-count buffers ever cross the
    * exchange: ~17 KB each at dims = 64, regardless of row count).
    *
    * finish emits the (i, j, cov) triples directly — POPULATION
    * covariance accumulated as CENTERED co-moments (multivariate
    * Welford reduce, Chan merge), NOT the moment identity
    * E[xy] − E[x]E[y]. The moment identity suffers catastrophic
    * cancellation: two near-equal large sums subtract, amplifying
    * summation-order noise to ~1e-11 of the result — enough that a
    * value sitting ~1e-11 from a display-rounding half-boundary flips
    * its rounded digit run-to-run as Spark's partial-merge order
    * varies with task scheduling. Centered co-moments keep the
    * accumulated quantity at the scale of the answer itself, so
    * reassociation noise stays near machine epsilon of the covariance
    * (~1e-16 relative), and the caller's boundary-snapping round (see
    * [[graft.functions.VectorOps.q139EmbeddingCovariance]]) has
    * nothing left to absorb. Buffer layout (same size as the moment
    * form): [n, mean(0..dims), C(upper triangle)] where
    * C_ij = Σ (x_i − mean_i)(x_j − mean_j); cov_ij = C_ij / n. */
  final class CovarianceMatrix(dims: Int)
    extends Aggregator[Seq[Double], Array[Double], Seq[(Int, Int, Double)]] {
    private val nPairs = dims * (dims + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + dims + nPairs)
    override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      val n1 = b(0) + 1
      b(0) = n1
      // deltaOld_i = x_i − mean_i(before); deltaNew_i = x_i − mean_i(after).
      // C_ij += deltaOld_i · deltaNew_j is symmetric because
      // deltaNew_j = deltaOld_j · (n−1)/n.
      val deltaOld = new Array[Double](dims)
      val deltaNew = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        val vi = v(i)
        deltaOld(i) = vi - b(1 + i)
        b(1 + i) += deltaOld(i) / n1
        deltaNew(i) = vi - b(1 + i)
        i += 1
      }
      var k = 1 + dims
      i = 0
      while (i < dims) {
        val di = deltaOld(i)
        var j = i
        while (j < dims) { b(k) += di * deltaNew(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      val na = a(0)
      val nb = b(0)
      if (nb == 0) return a
      if (na == 0) { System.arraycopy(b, 0, a, 0, a.length); return a }
      // Chan's parallel update: C = CA + CB + δ_i δ_j · na·nb/n
      val n = na + nb
      a(0) = n
      val delta = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        delta(i) = b(1 + i) - a(1 + i)
        a(1 + i) += delta(i) * nb / n
        i += 1
      }
      val w = na * nb / n
      var k = 1 + dims
      i = 0
      while (i < dims) {
        val di = delta(i)
        var j = i
        while (j < dims) { a(k) += b(k) + di * delta(j) * w; k += 1; j += 1 }
        i += 1
      }
      a
    }
    override def finish(b: Array[Double]): Seq[(Int, Int, Double)] = {
      val n = b(0)
      // empty input → empty result (the caller explodes it to zero
      // rows), matching what a SQL GROUP BY over zero rows returns —
      // NOT 2,080 fabricated "perfectly uncorrelated" zeros
      if (n == 0) return Vector.empty
      val out = Vector.newBuilder[(Int, Int, Double)]
      var i = 0
      var k = 1 + dims
      while (i < dims) {
        var j = i
        while (j < dims) {
          out += ((i, j, b(k) / n))
          k += 1; j += 1
        }
        i += 1
      }
      out.result()
    }
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[(Int, Int, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Int, Int, Double)]]()
  }

  /** CovarianceMatrix as an untyped column aggregate. */
  def covarianceMatrix(c: Column, dims: Int): Column =
    udaf(new CovarianceMatrix(dims)).apply(c)

  /** SIGNED raw-moment sums of a fixed-width vector column in ONE pass —
    * the additive sufficient statistics a CDC-maintained stats table
    * accumulates ([[graft.sources.StatsIndex]]): each input row carries
    * a ±1 sign (insert/update_postimage = +1, delete/update_preimage =
    * −1), and the buffer adds sgn·1, sgn·vᵢ, sgn·vᵢvⱼ. Unlike
    * [[CovarianceMatrix]] this CANNOT be Welford-centered — retraction
    * requires plain additivity — which is exactly why [[StatsIndex]]
    * pre-centers its inputs on a FROZEN bootstrap mean: centered inputs
    * keep the moment identity cancellation-free, so the maintained
    * covariance carries ~1e-13 noise instead of ~1e-11.
    *
    * finish emits triples keyed like the stats table: (-1, -1, n),
    * (i, -1, Σvᵢ), (i, j, Σvᵢvⱼ) for j ≥ i — or NOTHING when the
    * aggregator saw zero input rows (a no-op delta must not fabricate
    * 2,145 zero rows). */
  final class MomentMatrix(dims: Int)
    extends Aggregator[(Seq[Double], Double), Array[Double], Seq[(Int, Int, Double)]] {
    private val nPairs = dims * (dims + 1) / 2
    // buffer: [rowsSeen, signedN, s_0..s_{dims-1}, upper-triangle products]
    override def zero: Array[Double] = new Array[Double](2 + dims + nPairs)
    override def reduce(b: Array[Double], in: (Seq[Double], Double)): Array[Double] = {
      val (v, sgn) = in
      b(0) += 1
      b(1) += sgn
      var i = 0
      var k = 2 + dims
      while (i < dims) {
        val vi = v(i)
        b(2 + i) += sgn * vi
        var j = i
        while (j < dims) { b(k) += sgn * vi * v(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var k = 0
      while (k < a.length) { a(k) += b(k); k += 1 }
      a
    }
    override def finish(b: Array[Double]): Seq[(Int, Int, Double)] = {
      if (b(0) == 0) return Vector.empty
      val out = Vector.newBuilder[(Int, Int, Double)]
      out += ((-1, -1, b(1)))
      var i = 0
      while (i < dims) { out += ((i, -1, b(2 + i))); i += 1 }
      var k = 2 + dims
      i = 0
      while (i < dims) {
        var j = i
        while (j < dims) { out += ((i, j, b(k))); k += 1; j += 1 }
        i += 1
      }
      out.result()
    }
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[(Int, Int, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Int, Int, Double)]]()
  }

  /** MomentMatrix as an untyped column aggregate over (vector, sign). */
  def momentMatrix(v: Column, sgn: Column, dims: Int): Column =
    udaf(new MomentMatrix(dims)).apply(v, sgn)
}
