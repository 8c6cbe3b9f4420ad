package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loader for the driver's deterministic testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At cluster scale the
  * same call sites would point at a partitioned table root; every query in
  * this engine is written so that Catalyst can push filters and prune
  * columns down to this scan (verified via `.explain("formatted")` in
  * PlanSpec).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Opt-in table cache for suite runs (Bench sets
    * -Dgraft.cacheTables=true): returns one shared persisted DataFrame
    * per (sfDir, table) so all queries hit the same InMemoryRelation —
    * the engine-side analog of the reference's st.cache_data gold cache
    * (streamlit_app.py:114). Off by default: Verify measures the real
    * scan path. */
  private val cached = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (sys.props.get("graft.cacheTables").contains("true"))
      cached.getOrElseUpdate((sfDir, name), load(spark, sfDir, name).persist())
    else load(spark, sfDir, name)

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts varies by driver testdata generation:
      //   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so
      //     GraftSession presets nanosAsLong and we floor ns→µs here (the
      //     same truncation DuckDB applies, so oracle results line up).
      //   - TIMESTAMP(MICROS, isAdjustedToUTC=false): would surface as
      //     TIMESTAMP_NTZ and break every timestamp-literal comparison;
      //     GraftSession presets inferTimestampNTZ=false so it reads as
      //     plain TIMESTAMP (value-identical under the UTC session zone,
      //     and ts predicates stay pushable to the parquet scan).
      // The guards below only fire for externally-built sessions (e.g.
      // the driver's smoke session) that lack the presets.
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      if (spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => // NTZ slipped through (conf read too late): identity cast under UTC
          raw.withColumn("ts", expr("cast(ts as timestamp)"))
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
