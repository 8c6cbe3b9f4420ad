package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** D1/D3/D2 semantics (SURVEY §2.3) incl. the idempotence /convergence
  * properties the reference asserts operationally (main.py:164-165). */
class DedupSpec extends SparkSpec {

  import Dedup._

  private def entries(rows: (String, Int, java.lang.Long, String, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("food_entry_id", "date_int", "timestamp", "meal", "food_entry_name", "calories")
  }

  test("D1: duplicate (id, date_int, timestamp) fingerprints collapse to one row (main.py:96-105)") {
    val df = entries(
      ("1", 100, 5L, "breakfast", "oats", 200.0),
      ("1", 100, 5L, "breakfast", "oats", 200.0),
      ("1", 100, 6L, "breakfast", "oats", 200.0), // different ts → kept
      ("2", 100, 5L, "lunch", "rice", 300.0))
    assert(dedupExtract(df).count() === 3)
  }

  test("D1: null timestamp is a valid identity component, not a wildcard") {
    val df = entries(
      ("1", 100, null, "b", "x", 1.0),
      ("1", 100, null, "b", "x", 1.0),
      ("1", 100, 5L, "b", "x", 1.0))
    assert(dedupExtract(df).count() === 2)
  }

  test("D1 vs D3 keys differ: same D3 identity, different food_entry_id survives D1 but not D3 (SURVEY §7.4 #5)") {
    import spark.implicits._
    val df = Seq(
      ("a", "id1", "2026-04-03", 5L, "b", "oats", 1.0),
      ("b", "id1", "2026-04-03", 5L, "b", "oats", 1.0))
      .toDF("food_entry_id", "id", "date", "timestamp", "meal", "food_entry_name", "calories")
      .withColumn("date_int", lit(100))
    assert(dedupExtract(df).count() === 2) // distinct food_entry_id
    assert(dedupRead(df).count() === 1) // same (date,id,name,ts,meal)
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val df = entries(
      ("1", 100, 5L, "b", "x", 1.0), ("1", 100, 5L, "b", "x", 2.0),
      ("2", 100, 5L, "b", "y", 3.0))
    val once = dedupExtract(df)
    val twice = dedupExtract(once)
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("dedup survivor is deterministic under the tie-break, not arrival order") {
    import spark.implicits._
    val df = Seq(("1", 100, 5L, "b", "x", 9.0), ("1", 100, 5L, "b", "x", 1.0))
      .toDF("food_entry_id", "date_int", "timestamp", "meal", "food_entry_name", "calories")
    val kept = Dedup.deduplicate(df, extractKey, Seq(col("calories"))).collect()
    assert(kept.length === 1)
    assert(kept.head.getAs[Double]("calories") === 1.0)
  }

  test("D2 merge: insert new, update changed, preserve untouched (main.py:140-161)") {
    import spark.implicits._
    val existing = Seq(("k1", 100.0, "old"), ("k2", 200.0, "old"))
      .toDF("key", "calories", "tag")
    val incoming = Seq(("k2", 222.0, "new"), ("k3", 300.0, "new"))
      .toDF("key", "calories", "tag")
    val merged = Dedup.merge(existing, incoming, Seq("key"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(merged === Set(("k1", 100.0, "old"), ("k2", 222.0, "new"), ("k3", 300.0, "new")))
  }

  test("D2 merge: incoming null VALUE overwrites (side presence, not column coalesce)") {
    import spark.implicits._
    val existing = Seq(("k1", java.lang.Double.valueOf(1.0))).toDF("key", "v")
    val incoming = Seq(("k1", null.asInstanceOf[java.lang.Double])).toDF("key", "v")
    val out = Dedup.merge(existing, incoming, Seq("key")).collect()
    assert(out.length === 1 && out.head.isNullAt(1))
  }

  test("D2 merge converges: re-applying the same batch is a no-op (main.py:164-165)") {
    import spark.implicits._
    val existing = Seq(("k1", 1.0), ("k2", 2.0)).toDF("key", "v")
    val batch = Seq(("k2", 20.0), ("k3", 3.0)).toDF("key", "v")
    val once = Dedup.merge(existing, batch, Seq("key"))
    val twice = Dedup.merge(once, batch, Seq("key"))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("D2 merge with composite key incl. null component (null-safe join)") {
    import spark.implicits._
    val existing = Seq(("1", java.lang.Long.valueOf(5L), 1.0), ("1", null.asInstanceOf[java.lang.Long], 2.0))
      .toDF("id", "ts", "v")
    val incoming = Seq(("1", null.asInstanceOf[java.lang.Long], 20.0)).toDF("id", "ts", "v")
    val out = Dedup.merge(existing, incoming, Seq("id", "ts"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getDouble(2))).toSet
    assert(out === Set(("1", Some(5L), 1.0), ("1", None, 20.0)))
  }
}
