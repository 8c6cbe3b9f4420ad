package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      |                ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS sample_rank
      |  FROM documents)
      |WHERE sample_rank <= 20""".stripMargin

  /** Benchmark 3-grams for the contamination check — stand-ins for "the
    * eval set's n-grams" (drawn from the corpus vocabulary so the test
    * SFs produce hits). In production this list arrives as a table and
    * is broadcast the same way. */
  val BenchmarkShingles: Seq[String] = Seq(
    "stream table hash", "row column sort", "window fast query",
    "part filter scan", "value spark vector")

  /** Benchmark lists up to this size are compiled into the scan as
    * per-row substring probes; larger lists go through the exploded
    * broadcast join. The probe path is O(list · text) per row, so the
    * cutoff keeps the per-row work bounded. */
  val CompiledContaminationMaxNgrams = 64

  /** Benchmark-contamination check: docs sharing ≥1 word-3-gram with the
    * benchmark list, with the count of DISTINCT matched benchmark
    * n-grams. Two shapes behind one contract, chosen by list size:
    *
    *  - small list (the common "handful of eval sets" case): each
    *    n-gram is compiled into the scan as a token-aligned substring
    *    probe on the whitespace-normalized text — ZERO explode, ZERO
    *    shuffle, one whole-stage-codegen corpus pass. Token alignment
    *    is exact: tokens are split on `\s+`, so a padded single-space
    *    join makes " a b c " match iff [a,b,c] occur consecutively.
    *  - large list (a real eval suite's thousands of n-grams): explode
    *    corpus 3-grams and broadcast-semi-join the benchmark table — the
    *    corpus still never shuffles; only the tiny hit set aggregates.
    *
    * CurationSpec pins path equivalence. */
  def contamination(s: SparkSession, d: String, benchmark: Seq[String]): DataFrame = {
    import s.implicits._
    val ngrams = benchmark.distinct
    // The contract is word-3-grams: the large-list path joins against
    // 3-token shingles, so a 2- or 4-token entry would silently match on
    // the probe path only (ADVICE r5). Reject it at the boundary, naming
    // the offenders so a misconfigured benchmark list is fixable from
    // the error alone (ADVICE r6).
    val badEntries = ngrams.filterNot(_.trim.split("\\s+").length == 3)
    require(badEntries.isEmpty,
      "contamination: every benchmark entry must be exactly 3 whitespace-" +
        "separated tokens (the shingle width both paths match against); " +
        s"offending entries (${badEntries.size}): " +
        badEntries.take(5).map(e => s"'$e'").mkString(", ") +
        (if (badEntries.size > 5) ", ..." else ""))
    if (ngrams.size <= CompiledContaminationMaxNgrams) {
      val padded = concat(lit(" "), concat_ws(" ", TextOps.tokens($"text")), lit(" "))
      val hits = ngrams
        .map(b => when($"padded".contains(" " + b + " "), 1L).otherwise(0L))
        .reduce(_ + _)
      docs(s, d)
        .select($"doc_id", padded.as("padded"))
        .select($"doc_id", hits.as("n_benchmark_hits"))
        .where($"n_benchmark_hits" > 0)
    } else {
      val bench = ngrams.toDF("shingle")
      docs(s, d)
        .select($"doc_id", TextOps.tokens($"text").as("toks"))
        .select($"doc_id", explode(expr(TextOps.shinglesExpr)).as("shingle"))
        .join(broadcast(bench), "shingle")
        .groupBy($"doc_id")
        .agg(countDistinct($"shingle").as("n_benchmark_hits"))
    }
  }

  def q67Contamination(s: SparkSession, d: String): DataFrame =
    contamination(s, d, BenchmarkShingles)

  val q67Sql: String = {
    val list = BenchmarkShingles.map(x => s"'$x'").mkString(", ")
    s"""WITH ${TextOps.shingleCte}
      |SELECT doc_id, count(DISTINCT shingle) AS n_benchmark_hits
      |FROM sh
      |WHERE shingle IN ($list)
      |GROUP BY doc_id""".stripMargin
  }

  /** Distributed global prefix sum of per-doc token counts in
    * content-free hash order — the shared engine under q68 (budget cut)
    * and q71 (sequence packing). Two phases: per-bucket cumsum (256
    * hash-prefix buckets, each a parallel window partition) plus
    * broadcast bucket offsets from a 256-row window — so no corpus-sized
    * single-partition window exists in the plan (the classic
    * global-cumsum scale trap; the DuckDB oracles run the naive global
    * window and must agree exactly). Bucket = first 2 hex chars of the
    * hash, so bucket-then-hash order IS global hash order.
    *
    * Returns (t, cum): `t` = (doc_id, n_tokens, h, bucket) for cheap
    * side-aggregates, `cum` = t + exact global `cum_tokens`. */
  private def tokenPrefixSum(s: SparkSession, d: String): (DataFrame, DataFrame) = {
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
    val cum = inBucket.join(broadcast(offsets), "bucket")
      .withColumn("cum_tokens", ($"offset" + $"cum_in").cast("long"))
    (t, cum)
  }

  /** The shared hash-order token CTE both prefix-sum oracles start from. */
  private val tokenCte: String =
    raw"""t AS (SELECT doc_id,
      |                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |                   md5(CAST(doc_id AS VARCHAR)) AS h
      |            FROM documents)""".stripMargin

  /** Deterministic token-budget fill (the "cut a 10B-token training mix"
    * step): take docs in content-free hash order until the running token
    * count reaches 20% of the corpus, via [[tokenPrefixSum]]. The 20%
    * threshold compares 5·cum ≤ total in integer arithmetic — no float
    * wobble. */
  def q68TokenBudget(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (t, cum) = tokenPrefixSum(s, d)
    val total = t.agg(sum($"n_tokens").as("total"))
    cum.crossJoin(broadcast(total))
      .where($"cum_tokens" * 5 <= $"total")
      .select($"doc_id", $"n_tokens", $"cum_tokens")
  }

  val q68Sql: String =
    s"""WITH $tokenCte,
      |c AS (SELECT doc_id, n_tokens,
      |             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |               AS cum_tokens
      |      FROM t)
      |SELECT doc_id, n_tokens, cum_tokens
      |FROM c
      |WHERE cum_tokens * 5 <= (SELECT sum(n_tokens) FROM t)""".stripMargin

  /** Boilerplate line removal (the crawl-cleaning step that strips nav
    * bars, cookie banners, repeated headers): a line appearing in more
    * than one DISTINCT document is boilerplate; every doc is rewritten
    * with only its unique lines, original order preserved. Shape at
    * scale: explode lines → two-phase distinct-doc count per line → hash
    * join back → per-doc ordered reassembly. The line-frequency table is
    * bounded by DISTINCT lines — corpus-proportional in the worst case
    * (all-unique bodies), which is why the join back is key-partitioned
    * rather than assumed broadcastable (Catalyst broadcasts it only when
    * stats say it fits, as at test SF). The
    * per-doc collect is bounded by that doc's own line count — no
    * cross-doc state ever sits on one row. Docs whose every line is
    * boilerplate (e.g. exact duplicates) survive with empty clean_text,
    * so the output is always one row per input doc. */
  def q70BoilerplateLines(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lines = docs(s, d)
      .select($"doc_id", posexplode(split($"text", "\n")).as(Seq("pos", "line")))
    val freq = lines.groupBy($"line")
      .agg(countDistinct($"doc_id").as("docfreq"))
    lines.join(freq, "line")
      .groupBy($"doc_id")
      .agg(
        count(when($"docfreq" === 1, 1)).as("n_kept"),
        count(when($"docfreq" > 1, 1)).as("n_dropped"),
        expr("""array_join(
                  transform(
                    array_sort(collect_list(CASE WHEN docfreq = 1
                                            THEN struct(pos, line) END)),
                    x -> x.line),
                  chr(10))""").as("clean_text"))
  }

  val q70Sql: String =
    """WITH p AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM documents),
      |l AS (SELECT doc_id, pl['pos'] AS pos, pl['line'] AS line
      |      FROM (SELECT doc_id,
      |                   unnest([{'pos': i, 'line': parts[i]}
      |                           FOR i IN generate_series(1, len(parts))]) AS pl
      |            FROM p)),
      |f AS (SELECT line, count(DISTINCT doc_id) AS docfreq FROM l GROUP BY 1)
      |SELECT l.doc_id,
      |       count(*) FILTER (WHERE docfreq = 1) AS n_kept,
      |       count(*) FILTER (WHERE docfreq > 1) AS n_dropped,
      |       coalesce(string_agg(line, chr(10) ORDER BY pos)
      |                  FILTER (WHERE docfreq = 1), '') AS clean_text
      |FROM l JOIN f USING (line)
      |GROUP BY l.doc_id""".stripMargin

  /** Sequence packing (the "concat then chunk into training sequences"
    * step): docs laid end-to-end in content-free hash order are assigned
    * to fixed 256-token sequences; a doc starts in sequence
    * cum_before DIV 256 at offset cum_before MOD 256. Reuses
    * [[tokenPrefixSum]], so the assignment is exact and global with no
    * single-partition window. Pure integer arithmetic — deterministic on
    * every engine and cluster topology. */
  def q71SequencePack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, cum) = tokenPrefixSum(s, d)
    cum.withColumn("cum_before", $"cum_tokens" - $"n_tokens")
      .select($"doc_id", $"n_tokens",
        expr("cum_before DIV 256").as("seq_id"),
        ($"cum_before" % 256).as("offset_in_seq"))
  }

  val q71Sql: String =
    s"""WITH $tokenCte,
      |c AS (SELECT doc_id, n_tokens,
      |             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |               - n_tokens AS cum_before
      |      FROM t)
      |SELECT doc_id, n_tokens,
      |       CAST(cum_before // 256 AS BIGINT) AS seq_id,
      |       CAST(cum_before % 256 AS BIGINT) AS offset_in_seq
      |FROM c""".stripMargin

  /** Quality-weighted deterministic sampling: keep a doc with
    * probability equal to its quality score (q26's formula), decided by
    * comparing the score against a content-free uniform draw derived
    * from md5(doc_id) — the hash-Bernoulli that replaces RNG sampling in
    * a distributed pipeline (rerun-stable, topology-independent,
    * per-row, zero shuffle). Quality-weighted mixes are how curation
    * pipelines upsample good text without a hard threshold. */
  def q74QualitySample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id",
        (least(size($"toks") / 100.0, lit(1.0)) *
          (lit(1.0) - size(expr("filter(toks, x -> x IN ('the', 'a', 'of', 'and'))"))
            / size($"toks"))).as("quality_score"),
        (conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("double") / 65536.0).as("sample_u"))
      .where($"sample_u" < $"quality_score")
  }

  val q74Sql: String =
    raw"""SELECT doc_id, quality_score, sample_u FROM (
      |  SELECT doc_id,
      |    least(len(toks) / 100.0, 1.0)
      |      * (1.0 - len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and')))
      |          / len(toks)) AS quality_score,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
      |      / 65536.0 AS sample_u
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents))
      |WHERE sample_u < quality_score""".stripMargin

  /** Length-curriculum buckets: per language, the four ntile(4) quartiles
    * of document token count, with doc counts and length stats per
    * quartile — the report a curriculum/batching scheduler is built from.
    *
    * Deliberately NOT a per-doc `ntile` window: that plan moves every doc
    * of a language into ONE task (Spark windows don't split a partition
    * key), the classic per-group-sort scale trap. Instead the corpus
    * collapses to (lang, n_tokens) counts first — bounded by the number
    * of DISTINCT lengths, not docs — and ntile's bucket arithmetic
    * (first `n mod 4` buckets take `ceil(n/4)`, rest `floor(n/4)`) is
    * applied to the cumulative counts: each length-group is split across
    * the quartiles it straddles by pure arithmetic. Quartile-level
    * aggregates (count / avg / min / max) are tie-order-free, so this is
    * EXACTLY the naive per-doc `ntile(4) ... ORDER BY n_tokens, doc_id`
    * the DuckDB oracle runs — at a window size of distinct-lengths
    * instead of corpus size. */
  def q84Curriculum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = docs(s, d).select($"lang",
      size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
    val grp = t.groupBy($"lang", $"n_tokens").agg(count(lit(1)).as("c"))
    val byLang = Window.partitionBy($"lang")
    val cum = grp
      .withColumn("cb", coalesce(
        sum($"c").over(byLang.orderBy($"n_tokens")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum($"c").over(byLang))
    cum
      .select($"lang", $"n_tokens", $"c", $"cb", $"n",
        explode(sequence(lit(1), lit(4))).as("quartile"))
      .withColumn("base", floor($"n" / 4))
      .withColumn("rem", $"n" % 4)
      .withColumn("start_k",
        ($"quartile" - 1) * $"base" + least($"quartile" - 1, $"rem") + 1)
      .withColumn("end_k", $"quartile" * $"base" + least($"quartile", $"rem"))
      .withColumn("take",
        least($"end_k", $"cb" + $"c") - greatest($"start_k", $"cb" + 1) + 1)
      .where($"take" > 0)
      .groupBy($"lang", $"quartile".cast("long").as("quartile"))
      .agg(sum($"take").as("n_docs"),
           round(sum($"take" * $"n_tokens") / sum($"take"), 4).as("avg_tokens"),
           min($"n_tokens").as("min_tokens"),
           max($"n_tokens").as("max_tokens"))
  }

  val q84Sql: String =
    raw"""WITH t AS (SELECT doc_id, lang,
      |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |       FROM documents),
      |q AS (SELECT lang, n_tokens,
      |             ntile(4) OVER (PARTITION BY lang
      |                            ORDER BY n_tokens, doc_id) AS quartile
      |      FROM t)
      |SELECT lang, CAST(quartile AS BIGINT) AS quartile,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       round(avg(n_tokens), 4) AS avg_tokens,
      |       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
      |FROM q GROUP BY 1, 2""".stripMargin

  /** Padding-efficiency report for length-bucketed batching: docs land in
    * 32-token-wide buckets (clamped at bucket 7, i.e. 224+), each padded
    * to its bucket cap — efficiency = real tokens / padded tokens. The
    * bucket width is a power of two ON PURPOSE: `n/32` is exact in
    * binary, so `floor` can't straddle an engine's rounding. Per-row map
    * + an 8-group aggregate; at 100 TB this runs at scan speed. */
  def q85PackEfficiency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select(size(TextOps.tokens($"text")).cast("long").as("n"))
      .withColumn("bucket", least(floor($"n" / 32), lit(7L)))
      .withColumn("cap", ($"bucket" + 1) * 32)
      .groupBy($"bucket", $"cap")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n").as("sum_tokens"),
           round(sum($"n") / sum(greatest($"cap", $"n")), 6).as("efficiency"))
  }

  val q85Sql: String =
    raw"""WITH t AS (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
      |       FROM documents),
      |b AS (SELECT n, least(CAST(floor(n / 32) AS BIGINT), 7) AS bucket FROM t)
      |SELECT bucket, (bucket + 1) * 32 AS cap,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n) AS BIGINT) AS sum_tokens,
      |       round(CAST(sum(n) AS DOUBLE) / sum(greatest((bucket + 1) * 32, n)), 6)
      |         AS efficiency
      |FROM b GROUP BY 1, 2""".stripMargin

  /** Corpus-mix allocation under a token budget — WATER-FILLING, the
    * exact algorithm behind "rebalance the crawl mix": with budget
    * B = ⌊half the corpus tokens⌋, find the level L with
    * Σ min(tokens_s, L) = B; sources under the level keep everything,
    * sources above are capped at L. Closed form on the per-source totals
    * sorted ascending: L is the candidate level
    * (B − cum_before)/(remaining sources) at the FIRST source exceeding
    * its own candidate (min_by over the unique rank — deterministic in
    * both engines); no source exceeding means the budget isn't binding
    * and every source keeps its tokens.
    *
    * Scale shape: the corpus collapses to per-source token totals in one
    * combiner shuffle; every window after that runs on the SOURCE-count-
    * sized table (a catalog dimension, not data) — the single-partition
    * window is bounded by construction. The level itself is a
    * min-of-struct window over the same frame (struct(i, lev) orders by
    * the unique rank, so min = the first saturated source's level) — no
    * subquery, no second corpus scan, ONE plan. */
  def q89CorpusMix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = docs(s, d)
      .select($"source", size(TextOps.tokens($"text")).cast("long").as("n"))
      .groupBy($"source").agg(sum($"n").as("toks"))
    val ord = Window.orderBy($"toks", $"source")
    val all = Window.partitionBy()
    val o = t
      .withColumn("i", row_number().over(ord))
      .withColumn("s", count(lit(1)).over(all))
      .withColumn("total", sum($"toks").over(all))
      .withColumn("cum_before", coalesce(
        sum($"toks").over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("lev",
        (floor(lit(0.5) * $"total") - $"cum_before") / ($"s" - $"i" + 1))
      .withColumn("level",
        min(when($"toks" > $"lev", struct($"i", $"lev"))).over(all).getField("lev"))
    val kept = least($"toks".cast("double"),
      coalesce($"level", $"toks".cast("double")))
    o.select($"source", $"toks".as("tokens_avail"),
      round(kept, 4).as("kept_tokens"),
      round(kept / $"toks", 6).as("keep_frac"))
  }

  val q89Sql: String =
    raw"""WITH t AS (SELECT source,
      |         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS toks
      |       FROM documents GROUP BY source),
      |o AS (SELECT source, toks,
      |             row_number() OVER (ORDER BY toks, source) AS i,
      |             count(*) OVER () AS s,
      |             sum(toks) OVER () AS total,
      |             coalesce(sum(toks) OVER (ORDER BY toks, source
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |               AS cum_before
      |      FROM t),
      |lv AS (SELECT *, (floor(0.5 * total) - cum_before) / (s - i + 1) AS lev FROM o),
      |sat AS (SELECT arg_min(lev, i) AS level FROM lv WHERE toks > lev)
      |SELECT source, toks AS tokens_avail,
      |       round(least(CAST(toks AS DOUBLE), coalesce(level, CAST(toks AS DOUBLE))), 4)
      |         AS kept_tokens,
      |       round(least(CAST(toks AS DOUBLE), coalesce(level, CAST(toks AS DOUBLE)))
      |             / toks, 6) AS keep_frac
      |FROM lv CROSS JOIN sat""".stripMargin

  /** q96 — TEMPERATURE-weighted corpus resampling (the multilingual /
    * multi-source mixing rule: keep probability ∝ tokens^τ with τ = 0.5,
    * the standard up-weight-the-tail recipe), realized DETERMINISTICALLY
    * at doc level: a doc survives iff its content-independent md5 bucket
    * (q55's machinery) falls under its source's keep-rate — stable
    * across runs, machines and engines; no rand(), no sampling drift.
    * Single-shot allocation at half the corpus token budget, capped at
    * keep-everything per source (q89's water-filling is the exact
    * re-allocating variant; this is its cheap stochastic-realization
    * companion — together they are the plan and the execution of a mix).
    *
    * 100 TB shape: one corpus scan builds (source, tokens) totals with
    * map-side combine; the rate table is catalog-sized and broadcast
    * back; the doc-level filter is a pure per-row predicate at scan
    * speed. τ = 0.5 means weights are sqrt(n) — exact in both engines.
    *
    * Note on 0.5·ntot: Spark computes the budget as DOUBLE both sides;
    * token totals are < 2^53, so the product is exact. */
  def q96TemperatureMix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = docs(s, d).select(
      $"source",
      size(TextOps.tokens($"text")).cast("long").as("n_tokens"),
      (conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long")
        / 65536.0).as("u"))
    val bySrc = t.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("src_tokens"))
    val tot = bySrc.agg(
      sum(sqrt($"src_tokens".cast("double"))).as("sw"),
      sum($"src_tokens").cast("double").as("ntot"))
    val rates = bySrc.crossJoin(broadcast(tot))
      .withColumn("keep_rate",
        least(lit(1.0),
          sqrt($"src_tokens".cast("double")) / $"sw" * (lit(0.5) * $"ntot") / $"src_tokens"))
    val kept = t.join(broadcast(rates.select($"source", $"keep_rate")), "source")
      .where($"u" < $"keep_rate")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_tokens").as("kept_tokens"))
    rates.join(kept, Seq("source"), "left")
      .select($"source", $"n_docs", $"src_tokens",
        round($"keep_rate", 6).as("keep_rate"),
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"kept_tokens", lit(0L)).as("kept_tokens"))
  }

  val q96Sql: String =
    raw"""WITH t AS (SELECT source,
      |             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) / 65536.0 AS u
      |           FROM documents),
      |s AS (SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
      |      FROM t GROUP BY 1),
      |g AS (SELECT sum(sqrt(CAST(src_tokens AS DOUBLE))) AS sw,
      |             CAST(sum(src_tokens) AS DOUBLE) AS ntot FROM s),
      |r AS (SELECT source, n_docs, src_tokens,
      |             least(1.0, sqrt(CAST(src_tokens AS DOUBLE)) / sw * (0.5 * ntot) / src_tokens) AS keep_rate
      |      FROM s CROSS JOIN g),
      |k AS (SELECT t.source, count(*) AS n_kept, CAST(sum(t.n_tokens) AS BIGINT) AS kept_tokens
      |      FROM t JOIN r USING (source) WHERE t.u < r.keep_rate GROUP BY 1)
      |SELECT r.source, r.n_docs, r.src_tokens, round(r.keep_rate, 6) AS keep_rate,
      |       COALESCE(k.n_kept, 0) AS n_kept, COALESCE(k.kept_tokens, 0) AS kept_tokens
      |FROM r LEFT JOIN k USING (source)""".stripMargin

  /** Probes per key in the q98 bloom bitset (Kirsch–Mitzenmacher double
    * hashing: position_i = h1 + i·h2 mod m). At ~16 bits/key and k=3 the
    * false-positive rate is ≈1% — the exact rescore join makes the final
    * answer independent of it. */
  val BloomProbes = 3

  /** Build the bloom bitset from xxhash64 values of the member set.
    * Bit count is the next power of two ≥ 16 bits/key (min 64), so the
    * filter for a 10⁶-shingle eval suite is ~2 MB — a broadcast literal,
    * not a shuffle side. Pure driver-side bit math over hashes Spark
    * itself computed; the probe side recomputes the same xxhash64. */
  private[graft] def bloomBitset(hashes: Array[Long]): (Array[Long], Long) = {
    val want = math.max(64L, hashes.length.toLong * 16L)
    val nBits = java.lang.Long.highestOneBit(want - 1L) * 2L
    val words = new Array[Long]((nBits >> 6).toInt)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j); val h1 = h >>> 32; val h2 = h & 0xFFFFFFFFL
      var i = 0
      while (i < BloomProbes) {
        val p = ((h1 + i.toLong * h2) % nBits).toInt
        words(p >> 6) |= 1L << (p & 63)
        i += 1
      }
      j += 1
    }
    (words, nBits)
  }

  /** Membership probe over `key = xxhash64(x)` as a pure built-in Column
    * — array-literal indexing plus a mask lookup (no dynamic shifts), so
    * the whole test stays inside whole-stage codegen. h1/h2 are the two
    * 32-bit halves of the hash; both are non-negative, so plain `%` is
    * already a floor mod. */
  private[graft] def bloomProbe(words: Array[Long], nBits: Long, key: Column): Column = {
    val bits = typedlit(words.toSeq)
    val masks = typedlit(Array.tabulate(64)(i => 1L << i).toSeq)
    val h1 = shiftrightunsigned(key, 32)
    val h2 = key.bitwiseAND(lit(0xFFFFFFFFL))
    (0 until BloomProbes).map { i =>
      val p = (h1 + lit(i.toLong) * h2) % lit(nBits)
      val word = element_at(bits, shiftrightunsigned(p, 6).cast("int") + lit(1))
      val mask = element_at(masks, (p % 64).cast("int") + lit(1))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Bloom-filter decontamination — the shape that makes "drop every
    * training doc sharing a 3-gram with the eval suite" run at 100 TB.
    * The eval set (docs with doc_id % 19 = 0 stand in for a held-out
    * benchmark) contributes its DISTINCT shingles twice: once collected
    * as xxhash64 values into a bitset bloom ([[bloomBitset]] — a few MB
    * even for millions of eval n-grams) that filters the corpus-side
    * shingle stream at scan speed, and once as the broadcast build side
    * of the exact rescore join. The corpus side never shuffles at corpus
    * width: scan → codegen probe (drops ~94% of rows here, ~(1−fpp) of
    * clean rows in general) → broadcast join → partial-agg'd
    * countDistinct on the few survivors. Bloom has no false negatives,
    * so prefilter + exact join ≡ exact join — the DuckDB oracle runs the
    * plain join and must hash-match. */
  def q98BloomDecontaminate(s: SparkSession, d: String): DataFrame =
    bloomDecontaminate(s, d, MaxEvalBloomHashes)

  /** Driver-side bloom builds collect the eval hash set — safe ONLY while
    * the eval suite is benchmark-sized. 16M distinct shingles ≈ 128 MB of
    * hashes (and a 32 MB bitset): comfortably driver-sized, far beyond
    * any real benchmark, and a hard wall against a misconfigured eval
    * predicate silently collecting half the corpus (VERDICT r7). */
  private[graft] val MaxEvalBloomHashes: Int = 16 << 20

  /** [[q98BloomDecontaminate]] with the eval-set cap explicit. The cap
    * is enforced BEFORE anything reaches the driver by a fully-parallel
    * `count()` over the distinct eval shingles — overflow fails loudly
    * instead of OOMing, and no corpus-scale data ever starts moving
    * driver-ward. (VERDICT r9: the previous `limit(max + 1).collect()`
    * guard compiled to CollectLimit, which funnels every distinct
    * shingle through ONE task before the driver sees it — a 2× q98
    * regression. count-then-collect keeps both jobs parallel; the
    * distinct eval set is persisted so the guard, the hash collect and
    * the rescore join's broadcast build all share one aggregation.) */
  private[graft] def bloomDecontaminate(
      s: SparkSession, d: String, maxHashes: Int): DataFrame = {
    import s.implicits._
    val sh = TextOps.rawShingles(s, d)
    val eval = sh.where($"doc_id" % 19 === 0).select($"shingle").distinct().persist()
    val n = eval.count()
    require(n <= maxHashes,
      s"bloom decontamination: eval suite has $n distinct shingles, exceeding $maxHashes - " +
        "that is corpus-scale, not benchmark-scale (misconfigured eval predicate?). " +
        "Past this size build the filter distributed (bloom_filter_agg) instead " +
        "of collecting it to the driver.")
    val hashes = eval.select(xxhash64($"shingle")).as[Long].collect()
    val (words, nBits) = bloomBitset(hashes)
    sh.where($"doc_id" % 19 =!= 0)
      .where(bloomProbe(words, nBits, xxhash64($"shingle")))
      .join(broadcast(eval), "shingle")
      .groupBy($"doc_id")
      .agg(countDistinct($"shingle").as("n_matched"))
  }

  val q98Sql: String =
    s"""WITH ${TextOps.shingleCte},
      |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 19 = 0)
      |SELECT tr.doc_id, count(DISTINCT tr.shingle) AS n_matched
      |FROM sh tr JOIN ev USING (shingle)
      |WHERE tr.doc_id % 19 <> 0
      |GROUP BY tr.doc_id""".stripMargin

  /** q105 — weighted sampling WITHOUT replacement via exponential keys
    * (Efraimidis–Spirakis): doc i gets key u_i^(1/w_i) — equivalently
    * rank by ln(u_i)/w_i — and the top-k keys ARE a weighted sample
    * without replacement. This is the standard distributed algorithm for
    * "sample 10k docs proportional to token count from 100 TB": one
    * scan, per-row key arithmetic, top-k via orderBy+limit =
    * TakeOrderedAndProject (map-side partial top-k, no global sort, no
    * rejection loop, no sequential pass). u is the content-free md5
    * bucket of doc_id mapped to (0,1) — the q66/q96 determinism
    * contract: same sample on every engine, run, and topology.
    * Weight = token count (longer docs proportionally likelier). */
  def q105WeightedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select($"doc_id",
        size(TextOps.tokens($"text")).cast("long").as("n_tokens"),
        ((conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("double") + 0.5) / 65536.0).as("u"))
      .select($"doc_id", $"n_tokens",
        round(log($"u") / greatest($"n_tokens", lit(1L)), 8).as("es_key"))
      .orderBy($"es_key".desc, $"doc_id")
      .limit(20)
  }

  val q105Sql: String =
    raw"""WITH t AS (SELECT doc_id,
      |             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
      |              + 0.5) / 65536.0 AS u
      |      FROM documents)
      |SELECT doc_id, n_tokens,
      |       round(ln(u) / greatest(n_tokens, 1), 8) AS es_key
      |FROM t
      |ORDER BY es_key DESC, doc_id
      |LIMIT 20""".stripMargin

  /** Per-source adaptive quality gate: each source keeps docs at or
    * above its OWN 25th-percentile quality score (q26's formula) — the
    * per-domain threshold calibration curation pipelines use so a
    * uniformly-good source isn't decimated by a global bar tuned for
    * web crawl (and a junk source isn't waved through by one). The
    * threshold is the EXACT interpolated percentile (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, both
    * `lower + frac·(upper−lower)`), computed in one aggregation; the
    * threshold table is bounded by |sources| BY CONSTRUCTION, so the
    * `broadcast` hint back onto the corpus is scale-safe at any corpus
    * size — the legitimate counterpart of the unbounded-vocab hints
    * round 8 removed from q72/q77/q78. Keep/drop compares the ROUNDED
    * score to the ROUNDED threshold so the flag is a pure function of
    * the two displayed columns (engine-portable: interpolation differs
    * in the last ulp across engines). */
  def q117AdaptiveQualityGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scored = docs(s, d)
      .select($"doc_id", $"source", TextOps.tokens($"text").as("toks"))
      .select($"doc_id", $"source",
        (least(size($"toks") / 100.0, lit(1.0)) *
          (lit(1.0) - size(expr("filter(toks, x -> x IN ('the', 'a', 'of', 'and'))"))
            / size($"toks"))).as("quality_score"))
    val thresholds = scored.groupBy($"source")
      .agg(expr("percentile(quality_score, 0.25)").as("src_p25"))
    scored.join(broadcast(thresholds), "source")
      .select($"doc_id", $"source",
        round($"quality_score", 6).as("quality_score"),
        round($"src_p25", 6).as("src_p25"))
      .withColumn("keep", $"quality_score" >= $"src_p25")
  }

  val q117Sql: String =
    raw"""WITH sc AS (
      |  SELECT doc_id, source,
      |    least(len(toks) / 100.0, 1.0)
      |      * (1.0 - len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and')))
      |          / len(toks)) AS quality_score
      |  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |th AS (SELECT source, quantile_cont(quality_score, 0.25) AS src_p25
      |       FROM sc GROUP BY source)
      |SELECT sc.doc_id, sc.source,
      |       round(sc.quality_score, 6) AS quality_score,
      |       round(th.src_p25, 6) AS src_p25,
      |       round(sc.quality_score, 6) >= round(th.src_p25, 6) AS keep
      |FROM sc JOIN th ON th.source = sc.source""".stripMargin

  /** Re-aggregatable DISTINCT counting via HLL sketches (DataSketches,
    * the engine ships them): one pass builds a per-source sketch of the
    * document texts; the GLOBAL distinct count is a metadata-cheap MERGE
    * of those sketches — never a re-scan. This is the 100 TB pattern for
    * every "how many unique X" dashboard: per-partition/per-day sketches
    * are tiny (2^lgK registers), stored next to the data, and any
    * rollup (per source, per month, corpus-wide) is a union of
    * sketches. `approx_count_distinct` alone can't do this — its
    * partials aren't user-visible values; `hll_sketch_agg`'s are, which
    * makes the partial aggregate a first-class TABLE.
    *
    * Like q41, intentionally NOT oracle-gated (sketch estimates are
    * engine-specific); CurationSpec bounds the error vs exact and pins
    * that merging per-source sketches gives the IDENTICAL estimate to
    * sketching the whole corpus in one pass — the losslessness that
    * makes pre-aggregation safe. */
  def q122HllRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perSource = docs(s, d).groupBy($"source")
      .agg(expr("hll_sketch_agg(text, 12)").as("sk"),
        count(lit(1)).as("n_docs"))
    val global = perSource.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("distinct_est"),
      sum($"n_docs").as("n_docs"))
      .select(lit("__all__").as("source"), $"distinct_est", $"n_docs")
    perSource
      .select($"source", expr("hll_sketch_estimate(sk)").as("distinct_est"), $"n_docs")
      .unionByName(global)
  }

  /** q134 — DSIR-shaped DATA SELECTION (importance resampling over
    * hashed n-gram features, Xie et al. 2023, arXiv:2302.03169): score
    * every raw document by how much more likely its tokens are under a
    * TARGET distribution (here: the `src0` slice standing in for
    * "looks like Wikipedia") than under the raw-corpus distribution.
    * Features are hashed unigrams — each token md5-bucketed into one of
    * 256 cells via the engine-portable q114 idiom — so BOTH
    * distributions are 256-cell categorical models estimated from ONE
    * pass over the token matrix, add-one smoothed. A document's log
    * importance weight is the sum of its tokens' per-bucket log-ratios;
    * `keep = logw > 0` is the resampling decision (more target-like
    * than raw).
    *
    * Cross-engine determinism: each bucket's log-ratio is
    * ln(((ct+1)·(R+256)) / ((cr+1)·(T+256))) — products of exact
    * integers well under 2^53, so both engines take ln of the SAME
    * double; the per-doc sum then follows the q77 surprisal rounding
    * precedent (round 6 after engine-order summation).
    *
    * Scale shape: the model is 256 rows BY CONSTRUCTION — broadcast is
    * safe at any corpus size (unlike a vocabulary-sized table, which
    * this engine never force-broadcasts). Cost is two passes over the
    * exploded token matrix (count buckets, score docs) and a per-doc
    * combine — the same envelope as q77; nothing global, nothing
    * collected, no rank over floats (a threshold verdict, not a top-k,
    * so ulp-order ties cannot flip the output across engines). */
  def q134DsirWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r20 (guide §2.3, the q99 restructure): collapse the exploded token
    // matrix to per-(doc, bucket) COUNTS once — the old shape consumed
    // `toks` twice (bucket counts + scoring join), re-running the explode
    // and the per-token md5 for each. `dcb` computes once, its exchange
    // is reused by the model aggregation and the scoring join, and
    // scoring off counts is exact: sum(lw) over occurrences =
    // sum(k · lw) over buckets, n_tokens = sum(k).
    val dcb = docs(s, d).select($"doc_id", $"source",
        explode(TextOps.tokens($"text")).as("token"))
      .withColumn("b", conv(substring(md5($"token"), 1, 4), 16, 10)
        .cast("long") % 256)
      .groupBy($"doc_id", $"source", $"b").agg(count(lit(1)).as("k"))
    val bc = dcb.groupBy($"b").agg(
      sum($"k").as("cr"),
      sum(when($"source" === "src0", $"k").otherwise(0L)).as("ct"))
    val tot = bc.agg(sum($"cr").as("r_tot"), sum($"ct").as("t_tot"))
    val model = bc.crossJoin(broadcast(tot))
      .select($"b", log((($"ct" + lit(1.0)) * ($"r_tot" + lit(256))) /
        (($"cr" + lit(1.0)) * ($"t_tot" + lit(256)))).as("lw"))
    dcb.join(broadcast(model), "b") // 256 rows by construction
      .groupBy($"doc_id")
      .agg(sum($"k").as("n_tokens"),
        round(sum($"k" * $"lw"), 6).as("logw"),
        round(sum($"k" * $"lw") / sum($"k"), 6).as("avg_lw"))
      .withColumn("keep", ($"logw" > 0).cast("long"))
  }

  val q134Sql: String =
    raw"""WITH tok AS (SELECT doc_id, source,
      |         unnest(string_split_regex(trim(text), '\s+')) AS token
      |       FROM documents),
      |tb AS (SELECT doc_id, source,
      |         CAST(('0x' || substring(md5(token), 1, 4)) AS BIGINT) % 256 AS b
      |       FROM tok),
      |bc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr,
      |         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct
      |       FROM tb GROUP BY 1),
      |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS r_tot, CAST(sum(ct) AS BIGINT) AS t_tot
      |        FROM bc),
      |lw AS (SELECT b, ln(((ct + 1.0) * (r_tot + 256)) / ((cr + 1.0) * (t_tot + 256))) AS lw
      |       FROM bc CROSS JOIN tot)
      |SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |       round(sum(lw.lw), 6) AS logw,
      |       round(sum(lw.lw) / count(*), 6) AS avg_lw,
      |       CAST(CASE WHEN round(sum(lw.lw), 6) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM tb JOIN lw USING (b)
      |GROUP BY tb.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_dsir_weights" -> (q134DsirWeights _),
    "q122_hll_rollup" -> (q122HllRollup _),
    "q117_adaptive_quality_gate" -> (q117AdaptiveQualityGate _),
    "q105_weighted_sample" -> (q105WeightedSample _),
    "q98_bloom_decontaminate" -> (q98BloomDecontaminate _),
    "q96_temperature_mix" -> (q96TemperatureMix _),
    "q89_corpus_mix" -> (q89CorpusMix _),
    "q84_curriculum" -> (q84Curriculum _),
    "q85_pack_efficiency" -> (q85PackEfficiency _),
    "q64_pii_redaction" -> (q64PiiRedaction _),
    "q65_chunking" -> (q65Chunking _),
    "q66_stratified_sample" -> (q66StratifiedSample _),
    "q67_contamination" -> (q67Contamination _),
    "q68_token_budget" -> (q68TokenBudget _),
    "q70_boilerplate_lines" -> (q70BoilerplateLines _),
    "q71_sequence_pack" -> (q71SequencePack _),
    "q74_quality_sample" -> (q74QualitySample _))

  /** q122 intentionally omitted (like q41): sketch estimates are
    * engine-specific; CurationSpec error-bounds it instead. */
  val oracleSql: Map[String, String] = Map(
    "q134_dsir_weights" -> q134Sql,
    "q117_adaptive_quality_gate" -> q117Sql,
    "q105_weighted_sample" -> q105Sql,
    "q98_bloom_decontaminate" -> q98Sql,
    "q96_temperature_mix" -> q96Sql,
    "q89_corpus_mix" -> q89Sql,
    "q84_curriculum" -> q84Sql,
    "q85_pack_efficiency" -> q85Sql,
    "q64_pii_redaction" -> q64Sql,
    "q65_chunking" -> q65Sql,
    "q66_stratified_sample" -> q66Sql,
    "q67_contamination" -> q67Sql,
    "q68_token_budget" -> q68Sql,
    "q70_boilerplate_lines" -> q70Sql,
    "q71_sequence_pack" -> q71Sql,
    "q74_quality_sample" -> q74Sql)
}
