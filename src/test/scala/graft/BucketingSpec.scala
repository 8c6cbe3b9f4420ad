package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the "pre-shuffle once, join many times
  * free" scale pattern from the build brief. Both sides bucketed on the
  * join key with the same bucket count ⇒ the join plans with NO exchange
  * on either side. */
class BucketingSpec extends SparkSpec {

  test("joining two tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    // unique db per run: a leftover warehouse dir from a prior JVM (the
    // managed-table location outlives the in-memory catalog) would fail
    // CREATE TABLE with LOCATION_ALREADY_EXISTS
    val db = s"graft_bucket_test_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

    Tables(spark, sf0001, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(s"$db.orders_b")
    Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(s"$db.lineitem_b")

    // force the join shape a big-table join would take (broadcast would
    // hide the bucketing at this toy SF)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, bucketedRows) = try {
      val j = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum($"l_extendedprice").as("rev"))
      val rows = j.collect() // one execution: the plan asserted IS the plan checked
      (j.queryExecution.executedPlan.toString, rows)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // co-located: SMJ reads bucketed files directly, no Exchange below it
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
           !plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    // and the result matches the plain join
    val plain = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority").agg(sum($"l_extendedprice").as("rev"))
    assert(bucketedRows.map(r => (r.getString(0), math.round(r.getDouble(1)))).toSet ===
      plain.collect().map(r => (r.getString(0), math.round(r.getDouble(1)))).toSet)
  }
}
