package graft

/** Scratch dev tool (r21): time one Spark-dialect twin's phases —
  * parse+analyze (spark.sql), optimize+execute (count) — at a given SF,
  * to localize where a pathological twin spends its time.
  *
  *   sbt "runMain graft.TwinProbe q147_whiten_top_two /root/testdata/sf0.001"
  */
object TwinProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q147_whiten_top_two")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val text = SparkEntry.sparkSql.getOrElse(name, SparkEntry.oracleSql(name))
    val t0 = System.nanoTime()
    val df = SqlSurface.sql(spark, sfDir, text)
    val t1 = System.nanoTime()
    println(f"[twinprobe] $name analyze: ${(t1 - t0) / 1e9}%.2f s")
    val opt = df.queryExecution.optimizedPlan // force optimization
    val t2 = System.nanoTime()
    println(f"[twinprobe] $name optimize: ${(t2 - t1) / 1e9}%.2f s (optimized plan ${opt.toString.length} chars)")
    val n = df.count()
    val t3 = System.nanoTime()
    println(f"[twinprobe] $name execute: ${(t3 - t2) / 1e9}%.2f s ($n rows)")
    val n2 = df.count()
    val t4 = System.nanoTime()
    println(f"[twinprobe] $name re-execute: ${(t4 - t3) / 1e9}%.2f s ($n2 rows)")
    val viaDf = SparkEntry.queries(name)(spark, sfDir)
    val t5 = System.nanoTime()
    val nDf = viaDf.count()
    val t6 = System.nanoTime()
    println(f"[twinprobe] $name DF-side execute: ${(t6 - t5) / 1e9}%.2f s ($nDf rows)")
    val sqlM = df.localCheckpoint()
    val t7 = System.nanoTime()
    println(f"[twinprobe] $name sql localCheckpoint: ${(t7 - t6) / 1e9}%.2f s")
    val dfM = viaDf.localCheckpoint()
    val t8 = System.nanoTime()
    println(f"[twinprobe] $name df localCheckpoint: ${(t8 - t7) / 1e9}%.2f s")
    val e1 = sqlM.exceptAll(dfM).count()
    val t9 = System.nanoTime()
    println(f"[twinprobe] $name exceptAll 1: ${(t9 - t8) / 1e9}%.2f s ($e1)")
    val e2 = dfM.exceptAll(sqlM).count()
    val t10 = System.nanoTime()
    println(f"[twinprobe] $name exceptAll 2: ${(t10 - t9) / 1e9}%.2f s ($e2)")
    spark.stop()
  }
}
