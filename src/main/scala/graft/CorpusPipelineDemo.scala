package graft

import graft.functions.{CurationOps, TextOps}
import graft.sources.ManifestTable
import org.apache.spark.sql.functions._

/** Executable end-to-end TRAINING-DATA slice — the corpus-side twin of
  * [[PipelineDemo]]: documents → quality + repetition scoring → exact
  * dedup → MinHash near-dup components → keeper selection → benchmark
  * decontamination → deterministic train/val/test split → transactional
  * snapshot commit → read-back stats. Run with
  * `sbt "runMain graft.CorpusPipelineDemo [sfDir]"`.
  *
  * Every stage is one of the oracle-gated operators (q26/q56/q28/q54/
  * q98/q55) composed as a user of the library would compose them; the
  * sink is the manifest-committed table, so a re-run commits a new
  * snapshot and the previous one stays readable. */
object CorpusPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft_corpus").toString

    // 1. quality + repetition signals (q26/q56 shapes)
    val quality = TextOps.q26QualityScore(spark, sfDir)
      .join(TextOps.q56Repetition(spark, sfDir), "doc_id")
      .where($"quality_score" > 0.05 && $"repetition_ratio" < 0.95)

    // 2. exact dedup keepers (q28)
    val exactKeepers = TextOps.q28ExactDedup(spark, sfDir)
      .select($"keeper_id".as("doc_id"))

    // 3. near-dup components (q54): keep only each component's keeper
    val nearKeepers = TextOps.q54NearDupComponents(spark, sfDir)
      .where($"doc_id" === $"component_id")
      .select($"doc_id")

    // 4. benchmark decontamination (q98): drop docs sharing a 3-gram
    // with the held-out eval slice — the anti-join side is the bloom-
    // prefiltered hit set, duplicate-bounded and broadcastable
    val contaminated = CurationOps.q98BloomDecontaminate(spark, sfDir)
      .select($"doc_id")

    // 5. surviving docs + deterministic split (q55). The held-out eval
    // slice itself (q98's doc_id % 19 == 0 stand-in benchmark) is ALSO
    // excluded: decontamination only removes TRAINING docs that overlap
    // it — committing the eval docs themselves would defeat the held-out
    // premise the stage demonstrates (ADVICE r7)
    val survivors = Tables(spark, sfDir, "documents")
      .where($"doc_id" % 19 =!= 0)
      .join(quality.select($"doc_id"), "doc_id")
      .join(exactKeepers, "doc_id")
      .join(nearKeepers, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
    val split = TextOps.q55HashSplit(spark, sfDir)
      .select($"doc_id", $"split")
    val curated = survivors.join(split, "doc_id")
      .select($"doc_id", $"lang", $"split", $"n_chars", $"text")

    // 6. transactional snapshot commit + read-back
    val v = ManifestTable.merge(curated, s"$work/curated", Seq("doc_id"))
    val back = ManifestTable.read(spark, s"$work/curated")
    val total = Tables(spark, sfDir, "documents").count()
    println(s"CURATED_VERSION=$v")
    println(s"DOCS_IN=$total DOCS_OUT=${back.count()}")
    println("== split sizes ==")
    back.groupBy($"split").agg(count(lit(1)).as("n_docs"),
      sum($"n_chars").as("n_chars")).orderBy($"split").show()
    println("== per-language survivors ==")
    back.groupBy($"lang").agg(count(lit(1)).as("n_docs")).orderBy($"lang").show()
    spark.stop()
  }
}
