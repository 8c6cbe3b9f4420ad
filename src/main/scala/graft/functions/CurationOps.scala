package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators past the dedup family (the rest of what a
  * training-data pipeline runs between crawl and tokenizer): PII-style
  * redaction, token-window chunking, stratified deterministic sampling,
  * and benchmark-contamination checks. Same contract as TextOps: pure
  * built-in codegen'd expressions, per-doc work embarrassingly parallel,
  * shuffles only where a grouping genuinely requires one.
  */
object CurationOps {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** RE2-safe patterns shared verbatim by both engines (no lookaround —
    * DuckDB's RE2 has none). */
  val EmailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val PhonePat = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** PII-style redaction: emails and phone-shaped digit runs replaced by
    * placeholder tags, with per-doc match counts for curation stats. A
    * pure per-row map — scan-speed at any scale; the synthetic corpus is
    * word-soup (counts are usually 0), CurationSpec proves the redaction
    * itself on a fixture with real PII shapes. */
  def q64PiiRedaction(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d).select(
      $"doc_id",
      size(regexp_extract_all($"text", lit(EmailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all($"text", lit(PhonePat), lit(0))).cast("long").as("n_phones"),
      regexp_replace(regexp_replace($"text", EmailPat, "<EMAIL>"), PhonePat, "<PHONE>")
        .as("redacted"))
  }

  val q64Sql: String =
    s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '$EmailPat')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '$PhonePat')) AS BIGINT) AS n_phones,
      |  regexp_replace(regexp_replace(text, '$EmailPat', '<EMAIL>', 'g'),
      |                 '$PhonePat', '<PHONE>', 'g') AS redacted
      |FROM documents""".stripMargin

  /** Token-window chunking (the pre-tokenizer step every training
    * pipeline runs): 50-token chunks, stride 40 (10-token overlap), so
    * chunk i covers tokens [1 + 40i, 50 + 40i]. Each chunk is one output
    * row — explode over the window starts; per-doc work only, no
    * shuffle. Short docs yield one (possibly short) chunk. */
  def q65Chunking(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id", $"toks",
        explode(expr("sequence(1, greatest(size(toks) - 10, 1), 40)")).as("i"))
      .select($"doc_id",
        expr("CAST((i - 1) DIV 40 AS BIGINT)").as("chunk_id"),
        expr("CAST(size(slice(toks, i, 50)) AS BIGINT)").as("chunk_tokens"),
        expr("array_join(slice(toks, i, 50), ' ')").as("chunk"))
  }

  val q65Sql: String =
    raw"""WITH tokd AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |              FROM documents),
      |starts AS (SELECT doc_id, toks,
      |                  unnest(generate_series(1, greatest(len(toks) - 10, 1), 40)) AS i
      |           FROM tokd)
      |SELECT doc_id,
      |       CAST((i - 1) // 40 AS BIGINT) AS chunk_id,
      |       CAST(len(toks[i:i+49]) AS BIGINT) AS chunk_tokens,
      |       array_to_string(toks[i:i+49], ' ') AS chunk
      |FROM starts""".stripMargin

  /** Stratified deterministic sampling: per-language quota of 20 docs,
    * chosen by ranking on an engine-portable content-free hash
    * (md5 of the doc_id string) — the same docs come back on every
    * engine, every run, every cluster topology. One shuffle on lang;
    * at 100 TB the per-stratum rank is the standard hash-reservoir
    * replacement (no RNG state, no driver coordination). */
  def q66StratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy(md5($"doc_id".cast("string")), $"doc_id")
    docs(s, d)
      .select($"doc_id", $"lang")
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where($"sample_rank" <= 20)
  }

  val q66Sql: String =
    """SELECT doc_id, lang, sample_rank FROM (
      |  SELECT doc_id, lang,
      |         CAST(row_number() OVER (PARTITION BY lang
      |                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS sample_rank
      |  FROM documents)
      |WHERE sample_rank <= 20""".stripMargin

  /** Benchmark 3-grams for the contamination check — stand-ins for "the
    * eval set's n-grams" (drawn from the corpus vocabulary so the test
    * SFs produce hits). In production this list arrives as a table and
    * is broadcast the same way. */
  val BenchmarkShingles: Seq[String] = Seq(
    "stream table hash", "row column sort", "window fast query",
    "part filter scan", "value spark vector")

  /** Benchmark-contamination check: docs sharing ≥1 word-3-gram with the
    * benchmark list, with the count of DISTINCT matched benchmark
    * n-grams. The benchmark side is a literal/broadcast table, so the
    * check is a broadcast semi-join against exploded shingles — no
    * shuffle of the corpus; the standard decontamination shape. */
  def q67Contamination(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bench = BenchmarkShingles.toDF("shingle")
    docs(s, d)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id", explode(expr(TextOps.shinglesExpr)).as("shingle"))
      .join(broadcast(bench), "shingle")
      .groupBy($"doc_id")
      .agg(countDistinct($"shingle").as("n_benchmark_hits"))
  }

  val q67Sql: String = {
    val list = BenchmarkShingles.map(x => s"'$x'").mkString(", ")
    s"""WITH ${TextOps.shingleCte}
      |SELECT doc_id, count(DISTINCT shingle) AS n_benchmark_hits
      |FROM sh
      |WHERE shingle IN ($list)
      |GROUP BY doc_id""".stripMargin
  }

  /** Deterministic token-budget fill (the "cut a 10B-token training mix"
    * step): take docs in content-free hash order until the running token
    * count reaches 20% of the corpus. The running sum is a DISTRIBUTED
    * two-phase prefix sum — per-bucket cumsum (256 hash-prefix buckets,
    * each a parallel window partition) plus broadcast bucket offsets
    * from a 256-row window — so no corpus-sized single-partition window
    * exists in the plan (the classic global-cumsum scale trap; the
    * DuckDB oracle runs the naive global window and must agree exactly).
    * Bucket = first 2 hex chars of the hash, so bucket-then-hash order
    * IS global hash order. The 20% threshold compares 5·cum ≤ total in
    * integer arithmetic — no float wobble. */
  def q68TokenBudget(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = docs(s, d).select(
      $"doc_id",
      size(TextOps.tokens($"text")).cast("long").as("n_tokens"),
      md5($"doc_id".cast("string")).as("h"))
      .withColumn("bucket", substring($"h", 1, 2))
    val wIn = Window.partitionBy($"bucket").orderBy($"h", $"doc_id")
    val inBucket = t.withColumn("cum_in", sum($"n_tokens").over(wIn))
    val wBuckets = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy($"bucket").agg(sum($"n_tokens").as("btok"))
      .withColumn("offset", coalesce(sum($"btok").over(wBuckets), lit(0L)))
      .select($"bucket", $"offset")
    val total = t.agg(sum($"n_tokens").as("total"))
    inBucket.join(broadcast(offsets), "bucket")
      .withColumn("cum_tokens", ($"offset" + $"cum_in").cast("long"))
      .crossJoin(broadcast(total))
      .where($"cum_tokens" * 5 <= $"total")
      .select($"doc_id", $"n_tokens", $"cum_tokens")
  }

  val q68Sql: String =
    raw"""WITH t AS (SELECT doc_id,
      |                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |                   md5(CAST(doc_id AS VARCHAR)) AS h
      |            FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |               AS cum_tokens
      |      FROM t)
      |SELECT doc_id, n_tokens, cum_tokens
      |FROM c
      |WHERE cum_tokens * 5 <= (SELECT sum(n_tokens) FROM t)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_pii_redaction" -> (q64PiiRedaction _),
    "q65_chunking" -> (q65Chunking _),
    "q66_stratified_sample" -> (q66StratifiedSample _),
    "q67_contamination" -> (q67Contamination _),
    "q68_token_budget" -> (q68TokenBudget _))

  val oracleSql: Map[String, String] = Map(
    "q64_pii_redaction" -> q64Sql,
    "q65_chunking" -> q65Sql,
    "q66_stratified_sample" -> q66Sql,
    "q67_contamination" -> q67Sql,
    "q68_token_budget" -> q68Sql)
}
