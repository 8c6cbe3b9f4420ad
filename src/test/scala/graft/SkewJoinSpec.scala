package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted-join equivalence: same results as the plain join, spread
  * across salt buckets. */
class SkewJoinSpec extends SparkSpec {

  test("saltedJoin(inner) ≡ plain inner join on a skewed fact table") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1 else i % 50, s"row$i")).toDF("k", "payload")
    val dim = (0 to 50).map(i => (i, s"dim$i")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "attr")
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 8).select("k", "payload", "attr")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("saltedJoin(left) preserves unmatched fact rows exactly once") {
    import spark.implicits._
    val fact = Seq((1, "a"), (2, "b"), (99, "nomatch")).toDF("k", "payload")
    val dim = Seq((1, "x"), (2, "y")).toDF("k", "attr")
    val out = SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 4, "left")
    assert(out.count() === 3)
    assert(out.where($"payload" === "nomatch").collect().head.isNullAt(2))
  }

  test("hotKeys surfaces the skewed key first") {
    import spark.implicits._
    val fact = (1 to 100).map(i => (if (i <= 80) 7 else i, i)).toDF("k", "v")
    val top = SkewJoin.hotKeys(fact, $"k", 1).collect().head
    assert(top.getInt(0) === 7)
    assert(top.getLong(1) === 80L)
  }
}
