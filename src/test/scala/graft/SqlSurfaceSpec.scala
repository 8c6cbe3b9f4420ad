package graft

import graft.operators.{Extended, Relational}

/** The engine's SQL face: the same ANSI SQL text the DuckDB oracle runs
  * also runs through spark.sql over registered views and agrees with the
  * DataFrame-API plan. (Engine-neutral queries only — the oracle texts
  * using DuckDB-specific functions are covered by the driver's DuckDB
  * side instead.) */
class SqlSurfaceSpec extends SparkSpec {

  private val neutral: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, String)] = Seq(
    ("q1", Relational.q1PricingSummary _, Relational.q1Sql),
    ("q3", Relational.q3RevenueByNation _, Relational.q3Sql),
    ("q4", Relational.q4SemiJoin _, Relational.q4Sql),
    ("q5", Relational.q5AntiJoin _, Relational.q5Sql),
    ("q6", Relational.q6TopCustomers _, Relational.q6Sql),
    ("q7", Relational.q7TopOrdersPerCustomer _, Relational.q7Sql),
    ("q8", Relational.q8DistinctAgg _, Relational.q8Sql),
    ("q10", Relational.q10SetOps _, Relational.q10Sql),
    ("q16", Relational.q16DedupRowNumber _, Relational.q16Sql),
    ("q17", Relational.q17MergeUpsert _, Relational.q17Sql),
    ("q39", Extended.q39CorrelatedSubquery _, Extended.q39Sql),
    ("q43", Extended.q43ConditionalAgg _, Extended.q43Sql),
    ("q104", graft.operators.TimeSeries.q104BehaviorTrigrams _,
      graft.operators.TimeSeries.q104Sql),
    ("q106", graft.operators.TimeSeries.q106MetricCorrelation _,
      graft.operators.TimeSeries.q106Sql),
    ("q107", Relational.q107LocalSupplierRevenue _, Relational.q107Sql),
    ("q108", Extended.q108ColumnProfile _, Extended.q108Sql))

  neutral.foreach { case (name, fn, sqlText) =>
    test(s"$name: spark.sql(oracle text) ≡ DataFrame plan") {
      val viaDf = fn(spark, sf0001)
      val viaSql = SqlSurface.sql(spark, sf0001, sqlText)
      assert(viaSql.columns.toSeq === viaDf.columns.toSeq)
      assert(viaSql.exceptAll(viaDf).count() === 0, s"$name sql-only rows")
      assert(viaDf.exceptAll(viaSql).count() === 0, s"$name df-only rows")
    }
  }
}
