package graft

import graft.functions.VectorOps

/** The benched q35 is the LSH-prefiltered rescore; the exact all-pairs
  * scan lives only here, as its correctness oracle (an O(n²) broadcast
  * nested loop must not be the benchmark artifact). */
class VectorOpsSpec extends SparkSpec {

  test("q35: bucketed near-dup pairs are a subset of the exact all-pairs result") {
    val bucketed = VectorOps.q35CosineNearDup(spark, sf0001).collect().map(_.toString).toSet
    val exact = VectorOps.cosineNearDupExact(spark, sf0001).collect().map(_.toString).toSet
    assert(bucketed.subsetOf(exact),
      s"prefilter invented pairs: ${(bucketed -- exact).mkString(", ")}")
  }

  test("q35: exact baseline finds pairs the 0.40 threshold admits") {
    // guards against both sides being vacuously empty at sf0.001 — the
    // subset assertion above must be exercised against real pairs
    val exact = VectorOps.cosineNearDupExact(spark, sf0001).collect()
    assert(exact.nonEmpty)
    assert(exact.forall(_.getDouble(2) >= 0.40))
  }
}
