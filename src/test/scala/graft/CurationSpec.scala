package graft

import graft.functions.CurationOps

/** Functional guards for the curation operators (the corpus is word-soup,
  * so PII/chunk edge behavior is proven on fixtures here; the oracle gate
  * proves cross-engine parity on the corpus). */
class CurationSpec extends SparkSpec {

  private def fixture(rows: (Long, String)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q64: emails and phone runs are redacted and counted; clean text unchanged") {
    val dir = fixture(
      1L -> "contact me at jane.doe+spam@example.co.uk or +1 (555) 123-4567 thanks",
      2L -> "no pii here at all")
    val out = CurationOps.q64PiiRedaction(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(1L)._3 == "contact me at <EMAIL> or <PHONE> thanks")
    assert(out(2L) == ((0L, 0L, "no pii here at all")))
  }

  test("q65: chunk boundaries — 50-token windows at stride 40, short docs = one chunk") {
    val dir = fixture(
      1L -> (1 to 95).map(i => s"w$i").mkString(" "), // 95 tokens -> starts 1, 41, 81
      2L -> "tiny doc")
    val out = CurationOps.q65Chunking(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(c => (c._2, c._3)).toSeq == Seq((0L, 50L), (1L, 50L), (2L, 15L)))
    assert(doc1(0)._4.startsWith("w1 w2 ") && doc1(0)._4.endsWith(" w50"))
    assert(doc1(1)._4.startsWith("w41 ")) // 10-token overlap with chunk 0
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.map(c => (c._2, c._3, c._4)).toSeq == Seq((0L, 2L, "tiny doc")))
  }

  test("q66: per-stratum quota is deterministic across runs and bounded") {
    val a = CurationOps.q66StratifiedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = CurationOps.q66StratifiedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.groupBy(_._2).forall(_._2.size <= 20))
    assert(a.forall(_._3 <= 20))
  }

  test("q68: two-phase prefix sum equals the naive global cumsum, and the " +
    "corpus-sized window is bucket-partitioned") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // naive reference: ONE global window over the whole corpus
    val t = Tables(spark, sf0001, "documents").select(
      $"doc_id",
      size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"),
      md5($"doc_id".cast("string")).as("h"))
    val naive = t.withColumn("cum_tokens",
        sum($"n_tokens").over(Window.orderBy($"h", $"doc_id")).cast("long"))
      .crossJoin(broadcast(t.agg(sum($"n_tokens").as("total"))))
      .where($"cum_tokens" * 5 <= $"total")
      .select($"doc_id", $"n_tokens", $"cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val twoPhase = CurationOps.q68TokenBudget(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty && twoPhase == naive)
    // the only window over corpus-sized data is partitioned by bucket
    val plan = CurationOps.q68TokenBudget(spark, sf0001)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.trim.startsWith("+- Window")).toSeq ++
      plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.exists(_.contains("[bucket")), plan) // corpus cumsum: partitioned
  }

  test("q67: contamination hits only docs sharing a benchmark 3-gram, with exact counts") {
    val dir = fixture(
      1L -> "prefix stream table hash suffix and also row column sort here",
      2L -> "completely unrelated words that never match anything benchmarky",
      3L -> "stream table hash stream table hash repeated twice")
    val out = CurationOps.q67Contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L)) // doc 2 absent; repeats counted once
  }
}
