package graft


/** Dev tool: print the formatted physical plan (and optionally the final
  * adaptive plan) for any SparkEntry query.
  * `sbt "runMain graft.PlanDump q30_minhash_lsh [exec]"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val exec = args.length > 1 && args(1) == "exec"
    val spark = GraftSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    if (exec) {
      df.collect()
      println("=== FINAL ADAPTIVE PLAN ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
