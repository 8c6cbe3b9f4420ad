package graft

import java.nio.file.Files

/** Standalone yardstick probe: run [[Bench]]'s two fixed-work
  * calibration jobs (CPU: 6e9-row integer mix, zero IO; IO: 16M-row
  * parquet write+read) WITHOUT the suite, n times each, and print every
  * sample. This is how a clean-window `cal_io` basis is established or
  * re-checked (VERDICT r17 #2): run it in a quiet window, take the min,
  * and compare against [[Bench.CalIoCleanBasis]] — if the box's clean
  * minimum drifts past the pinned basis (hardware change, kernel
  * upgrade), re-pin the constant and record the new measurement in the
  * README.
  *
  *   sbt "runMain graft.CalProbe [samples]"
  */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ioDir = Files.createTempDirectory("graft-calprobe")
    val cal = (1 to n).map { i =>
      val s = Bench.calibrationJob(spark, cpus.toInt); println(f"cal[$i]: $s%.3f"); s
    }
    val io = (1 to n).map { i =>
      val s = Bench.calIoJob(spark, ioDir); println(f"cal_io[$i]: $s%.3f"); s
    }
    println(f"cal_min=${cal.min}%.3f cal_io_min=${io.min}%.3f " +
      f"basis=${Bench.CalIoCleanBasis}%.3f " +
      s"contended=${Bench.contended(io.min)}")
    spark.stop()
  }
}
