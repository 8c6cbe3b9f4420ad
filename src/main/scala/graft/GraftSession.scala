package graft

import org.apache.spark.sql.SparkSession

/** One place for the session conf every graft entry point shares, so no
  * query path has to mutate session state (the conf a table reader needs
  * is a property of the session, set at build time).
  */
object GraftSession {
  /** Build-time defaults:
    *   - `nanosAsLong`: events.parquet carries TIMESTAMP(NANOS), which
    *     Spark's parquet reader rejects outright; surfacing nanos as long
    *     lets `Tables.load` floor them to micros (DuckDB's own ns→µs
    *     truncation, so oracle results line up exactly).
    *   - UTC + no UI: deterministic dates, no port squatting in CI.
    */
  val defaults: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // Driver testdata generations differ: some write events.ts as parquet
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark would surface
    // as TIMESTAMP_NTZ and every timestamp-literal comparison would fail
    // analysis. Reading it as TIMESTAMP_LTZ is value-identical under the
    // UTC session zone AND keeps ts predicates pushable to the scan
    // (a cast(ts) workaround would block parquet filter pushdown).
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.ui.enabled" -> "false")

  /** Builder preloaded with the graft defaults; call sites chain their
    * own master/shuffle/extension config on top. */
  def builder(): SparkSession.Builder = {
    val b = SparkSession.builder()
    defaults.foreach { case (k, v) => b.config(k, v) }
    b
  }
}
