package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface (SURVEY §7.1 module 5): register the testdata tables as
  * temp views so every query is reachable through `spark.sql` as well as
  * the DataFrame API — one SQL text can then run against both this
  * engine and the DuckDB oracle. */
object SqlSurface {

  /** Register all testdata tables as temp views on the session. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }

  /** Run a SQL text against the registered views. */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(text)
  }
}
