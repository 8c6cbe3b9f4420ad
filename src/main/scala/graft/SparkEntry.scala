package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2 + training-data
  * extensions), each paired in `oracleSql` with ANSI SQL the driver runs
  * in DuckDB over the same parquet tables. Column names/types are aligned
  * pair-by-pair — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the star-schema revenue rollup (joins + broadcast + aggregation). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q3RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TimeSeries.queries ++
      operators.Extended.queries ++
      functions.TextOps.queries ++
      functions.CurationOps.queries ++
      functions.VectorOps.queries ++
      functions.EntityOps.queries ++
      multimodal.Multimodal.queries ++
      sources.IngestFixtures.queries ++
      sources.DedupIndexFixtures.queries ++
      sources.StatsIndexFixtures.queries ++
      sources.EntityIndexFixtures.queries ++
      sources.DiffFixtures.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++
      operators.TimeSeries.oracleSql ++
      operators.Extended.oracleSql ++
      functions.TextOps.oracleSql ++
      functions.CurationOps.oracleSql ++
      functions.VectorOps.oracleSql ++
      functions.EntityOps.oracleSql ++
      multimodal.Multimodal.oracleSql ++
      sources.IngestFixtures.oracleSql ++
      sources.DedupIndexFixtures.oracleSql ++
      sources.StatsIndexFixtures.oracleSql ++
      sources.EntityIndexFixtures.oracleSql ++
      sources.DiffFixtures.oracleSql

  /** Spark-dialect twins for oracle texts that are DuckDB-only
    * ([[SparkSqlTwins]]); SqlSurfaceSpec proves each ≡ the DataFrame
    * plan, widening the `spark.sql` face past the engine-neutral set. */
  def sparkSql: Map[String, String] = SparkSqlTwins.texts
}
