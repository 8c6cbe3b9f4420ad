ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "caloristaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked child's stdout through VERBATIM. The default
// (LoggedOutput) prefixes every line with "[info] ", which makes the
// bench/verify JSON lines unparseable by the driver.
outputStrategy := Some(StdoutOutput)
// Without this, sbt appends "[success] Total time: ..." to stdout AFTER
// the forked program exits, so the bench JSON is never the last stdout
// line and a last-line parser misses it.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by sbt commands, not tasks
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// ---------------------------------------------------------------- tests
// r21 (VERDICT r20 #1): the suite ran 53 min in ONE forked JVM —
// sequential suites, each a long chain of tiny local[4] Spark jobs — and
// the r20 driver run was budget-killed mid-suite. Suites are independent
// (each builds its own fixtures via FixtureLifecycle's cross-PROCESS
// file lock, sessions/warehouses are per-JVM), so split them into
// SPARK_GRAFT_TEST_GROUPS (default 4) forked JVMs run in parallel:
// process isolation keeps every suite's session conf/sys.props to
// itself (the in-JVM-parallelism alternative would share one
// SparkSession's mutable SQLConf across suites). The heavy suites,
// measured in the r21 baseline run, are pinned to separate groups so no
// group serializes two of them; the rest spread by stable name hash.
// Set SPARK_GRAFT_TEST_GROUPS=1 for the old single-JVM behavior.
val testGroupCount = math.max(1,
  sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "4").toInt)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(8, testGroupCount + 2)),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // measured suite weights (seconds, r21 baseline after the
  // SqlSurfaceSpec fixes) — used only for balancing; an unlisted suite
  // is light (<20 s)
  val weight: Map[String, Int] = Map(
    "graft.BatchedRefreshSpec" -> 490, "graft.SqlSurfaceSpec" -> 390,
    "graft.StatsIndexSpec" -> 225, "graft.EntityIndexSpec" -> 196,
    "graft.ClusterIndexSpec" -> 136, "graft.MaintainedIndexPropertySpec" -> 91,
    "graft.DedupIndexSpec" -> 76, "graft.ManifestTableSpec" -> 48,
    "graft.StreamingSpec" -> 48, "graft.ConcurrentMaintenanceSpec" -> 46,
    "graft.RobustIndexSpec" -> 44, "graft.VecIndexSpec" -> 40,
    "graft.TextDedupSpec" -> 34, "graft.IndexGcSpec" -> 34,
    "graft.PropertySpec" -> 33, "graft.PlanSpec" -> 28,
    "graft.ComponentDepthSpec" -> 26, "graft.CrossModalIndexSpec" -> 25,
    "graft.ModalityIndexSpec" -> 24, "graft.AudioWindowIndexSpec" -> 23,
    "graft.DfIndexSpec" -> 23, "graft.MultimodalSpec" -> 21,
    "graft.SceneIndexSpec" -> 21)
  // longest-processing-time-first bin packing into the lightest group
  val bins = Array.fill(testGroupCount)(0L)
  val assign = tests.sortBy(t => (-weight.getOrElse(t.name, 10), t.name)).map { t =>
    val g = bins.indexOf(bins.min)
    bins(g) += weight.getOrElse(t.name, 10).toLong
    t -> g
  }.toMap
  val opts = (Test / javaOptions).value.toVector ++
    // cap each group JVM's heap below the single-JVM default so
    // testGroupCount forks fit the box comfortably
    Seq(s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_GROUP_MEM", "8g")}")
  val fo = ForkOptions().withRunJVMOptions(opts)
    .withOutputStrategy(Some(StdoutOutput: OutputStrategy))
  assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (g, ts) =>
    Tests.Group(s"group$g", ts.keys.toSeq.sortBy(_.name), Tests.SubProcess(fo))
  }
}
