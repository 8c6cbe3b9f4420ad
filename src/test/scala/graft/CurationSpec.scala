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

  test("q122: per-source HLL estimates are error-bounded vs exact, and the " +
    "MERGED global estimate is IDENTICAL to a one-pass corpus sketch " +
    "(pre-aggregation is lossless)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString
    // 3000 docs, 1100 distinct texts, spread over 3 sources
    val rows = (0 until 3000).map(i =>
      (i.toLong, s"document body number ${i % 1100}", s"src${i % 3}"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val out = CurationOps.q122HllRollup(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = docs.groupBy($"source")
      .agg(countDistinct($"text").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (src, n) =>
      val est = out(src)._1
      assert(math.abs(est - n) <= n * 0.05,
        s"$src: estimate $est vs exact $n exceeds 5%")
    }
    val globalExact = docs.agg(countDistinct($"text")).head().getLong(0)
    assert(math.abs(out("__all__")._1 - globalExact) <= globalExact * 0.05)
    assert(out("__all__")._2 == 3000L, "global n_docs must sum the sources")

    // losslessness: union of per-source sketches ≡ one-pass corpus sketch
    val onePass = docs
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(text, 12))")).head().getLong(0)
    assert(out("__all__")._1 == onePass,
      s"merged-sketch estimate ${out("__all__")._1} must equal one-pass $onePass")
  }

  test("q67: compiled-probe and exploded-join contamination paths agree, " +
    "and probes are token-aligned (no partial-word or cross-boundary hits)") {
    import graft.functions.CurationOps._
    val dir = fixture(
      1L -> "alpha beta gamma delta",   // contains "alpha beta gamma" + "beta gamma delta"
      2L -> "xalpha beta gamma",        // partial-word: must NOT match "alpha beta gamma"
      3L -> "beta gamma",               // 2-gram only: no 3-gram hit
      4L -> "alpha beta gamma")
    val list = Seq("alpha beta gamma", "beta gamma delta")
    def run(bench: Seq[String]) =
      contamination(spark, dir, bench).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val compiled = run(list)
    assert(list.size <= CompiledContaminationMaxNgrams)
    assert(compiled == Map(1L -> 2L, 4L -> 1L))
    // pad with misses to force the exploded broadcast-join path
    val padded = list ++ (1 to CompiledContaminationMaxNgrams).map(i => s"nohit$i x y")
    assert(run(padded) == compiled, "large-list join path must agree with compiled path")
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

  test("q70: cross-doc repeated lines are stripped, order preserved, " +
    "fully-boilerplate docs survive with empty text") {
    val dir = fixture(
      1L -> "COOKIE BANNER\nunique one\nFOOTER",
      2L -> "COOKIE BANNER\nunique two\nFOOTER",
      3L -> "alpha\nCOOKIE BANNER\nomega", // boilerplate in the middle
      4L -> "dup line only",
      5L -> "dup line only") // exact duplicate of doc 4
    val out = CurationOps.q70BoilerplateLines(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 2L, "unique one")))
    assert(out(2L) == ((1L, 2L, "unique two")))
    assert(out(3L) == ((2L, 1L, "alpha\nomega"))) // order kept across the gap
    assert(out(4L) == ((0L, 1L, "")) && out(5L) == ((0L, 1L, "")))
    assert(out.size == 5) // one row per input doc, always
  }

  test("q71: two-phase packing equals the naive global cumsum; offsets are " +
    "consistent with 256-token sequences") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = Tables(spark, sf0001, "documents").select(
      $"doc_id",
      size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"),
      md5($"doc_id".cast("string")).as("h"))
    val naive = t.withColumn("cum_before",
        sum($"n_tokens").over(Window.orderBy($"h", $"doc_id")).cast("long") - $"n_tokens")
      .select($"doc_id", $"n_tokens",
        expr("cum_before DIV 256").as("seq_id"), ($"cum_before" % 256).as("offset_in_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val packed = CurationOps.q71SequencePack(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(packed == naive && packed.nonEmpty)
    assert(packed.forall { case (_, _, seq, off) => seq >= 0 && off >= 0 && off < 256 })
  }

  test("q72: tf-idf ranks corpus-rare tokens above ubiquitous ones with exact scores") {
    import graft.functions.TextOps
    val dir = fixture(
      1L -> "apple apple banana",
      2L -> "banana cherry",
      3L -> "cherry durian durian durian")
    val out = TextOps.q72TfIdf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    def doc(id: Long) = out.filter(_._1 == id).sortBy(_._5).map(r => (r._2, r._3, r._4)).toSeq
    // n_docs = 3; df: apple 1, banana 2, cherry 2, durian 1
    val ln3 = math.log(3.0); val ln15 = math.log(1.5)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(doc(1L) == Seq(("apple", 2L, r6(2 * ln3)), ("banana", 1L, r6(ln15))))
    assert(doc(3L) == Seq(("durian", 3L, r6(3 * ln3)), ("cherry", 1L, r6(ln15))))
    assert(out.forall(_._5 <= 3)) // top-3 cap
  }

  test("q74: hash-Bernoulli keeps every perfect-quality doc, drops every " +
    "zero-quality doc, and is rerun-stable") {
    val perfect = (1 to 120).map(i => s"tok$i").mkString(" ") // qs = 1.0
    val dir = fixture(
      1L -> perfect,
      2L -> "the a of and the a of and", // all stopwords -> qs = 0.0
      3L -> perfect)
    val out = CurationOps.q74QualitySample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(1L, 3L)) // u < 1.0 always; u < 0.0 never
    assert(out.forall { case (_, qs, u) => u < qs && u >= 0.0 && u < 1.0 })
    val again = CurationOps.q74QualitySample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(again.toSet == out.toSet)
  }

  test("q117: each source's gate is its OWN exact interpolated p25 — a doc " +
    "that one source keeps, a stricter source would drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-adaptive").toString
    // stopword-free docs of t tokens score exactly t/100: hand-computable
    def doc(t: Int) = (1 to t).map(_ => "w").mkString(" ")
    // source A scores (.1 .2 .3 .4): p25 = .1 + .75*(.2-.1) = .175
    // source B scores (.5 .6 .7 .8): p25 = .575
    val rows = Seq(
      (1L, doc(10), "A"), (2L, doc(20), "A"), (3L, doc(30), "A"), (4L, doc(40), "A"),
      (5L, doc(50), "B"), (6L, doc(60), "B"), (7L, doc(70), "B"), (8L, doc(80), "B"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.q117AdaptiveQualityGate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("src_p25"), r.getAs[Boolean]("keep")))).toMap
    assert(out(1L) == ((0.175, false)) && out(2L) == ((0.175, true)))
    assert(out(5L) == ((0.575, false)) && out(6L) == ((0.575, true)))
    // the adaptive point: doc 5 (score .5) outscores EVERYTHING source A
    // keeps, yet is dropped by B's own bar
    assert(out(3L)._2 && out(4L)._2 && out(7L)._2 && out(8L)._2)
  }

  test("q77: surprisal is exact for a hand-computed unigram model and ranks " +
    "rare-token docs above common-token docs") {
    import graft.functions.TextOps
    val dir = fixture(
      1L -> "common common common", // 3 tokens of the dominant type
      2L -> "common rare") // the rare token appears once in the corpus
    val out = TextOps.q77Surprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus: 5 tokens; p(common)=4/5, p(rare)=1/5
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == ((3L, r6(-math.log(0.8)))))
    assert(out(2L) == ((2L, r6((-math.log(0.8) - math.log(0.2)) / 2.0))))
    assert(out(2L)._2 > out(1L)._2) // the rare-token doc is more surprising
  }

  test("q78: PMI ranks the exclusive pair above the background pair with exact scores") {
    import graft.functions.TextOps
    val dir = fixture(
      1L -> "a b",
      2L -> "a b",
      3L -> "c d")
    val out = TextOps.q78Collocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // df: a=2 b=2 c=1 d=1; pmi(c,d)=ln(1*3/1)=ln 3 beats pmi(a,b)=ln(2*3/4)=ln 1.5
    assert(out == Seq(
      ("c", "d", 1L, r6(math.log(3.0))),
      ("a", "b", 2L, r6(math.log(1.5)))))
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

  test("q84: curriculum quartiles match hand-computed ntile(4) semantics, " +
    "including the uneven-remainder split and an all-tied language") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-curric").toString
    def doc(k: Int) = List.fill(k)("w").mkString(" ")
    val en = (1 to 10).map(k => (k.toLong, doc(k), "en"))        // lengths 1..10
    val fr = (11 to 14).map(i => (i.toLong, doc(5), "fr"))       // 4 tied docs
    (en ++ fr).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.q84Curriculum(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    // n=10 -> ntile sizes 3,3,2,2 over lengths 1..10
    assert(out(("en", 1L)) == ((3L, 2.0, 1L, 3L)))
    assert(out(("en", 2L)) == ((3L, 5.0, 4L, 6L)))
    assert(out(("en", 3L)) == ((2L, 7.5, 7L, 8L)))
    assert(out(("en", 4L)) == ((2L, 9.5, 9L, 10L)))
    // 4 tied docs: one per quartile, stats identical
    (1L to 4L).foreach(q => assert(out(("fr", q)) == ((1L, 5.0, 5L, 5L))))
    assert(out.size == 8)
  }

  test("q85: pack-efficiency buckets — width 32, overflow clamps to bucket 7 and " +
    "pads to the doc's own length when it exceeds the cap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pack").toString
    def doc(k: Int) = List.fill(k)("w").mkString(" ")
    Seq((1L, doc(10)), (2L, doc(40)), (3L, doc(300)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.q85PackEfficiency(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(0L) == ((32L, 1L, 10L, 0.3125)))
    assert(out(1L) == ((64L, 1L, 40L, 0.625)))
    assert(out(7L) == ((256L, 1L, 300L, 1.0))) // padded to max(cap, n) = 300
    assert(out.size == 3)
  }

  test("q89: water-filling — small sources keep everything, big sources cap at " +
    "one shared level, kept tokens sum to the budget when it binds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mix").toString
    def doc(id: Long, k: Int, src: String) = (id, List.fill(k)("w").mkString(" "), src)
    // totals: a=100, b=200, c=10000 -> budget = floor(0.5*10300) = 5150
    // a, b unsaturated; c capped at (5150-300)/1 = 4850
    (Seq(doc(1L, 100, "a"), doc(2L, 200, "b")) ++
      (0 until 10).map(i => doc(10L + i, 1000, "c")))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.q89CorpusMix(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a") == ((100L, 100.0, 1.0)))
    assert(out("b") == ((200L, 200.0, 1.0)))
    assert(out("c") == ((10000L, 4850.0, 0.485)))
    assert(out.values.map(_._2).sum == 5150.0, "kept tokens must exhaust the binding budget")
  }

  test("q89: the degenerate single-source corpus caps at exactly half its tokens") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mix2").toString
    // budget floor(0.5*100)=50 < 100 -> the lone source saturates at level
    // (50-0)/1 = 50. (A genuinely non-binding budget is impossible with
    // B = total/2 < total by construction; the coalesce(level, toks) null
    // path is still exercised through the oracle-free branch analysis.)
    Seq((1L, List.fill(100)("w").mkString(" "), "solo"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationOps.q89CorpusMix(spark, dir).collect().head
    assert(r.getString(0) == "solo" && r.getLong(1) == 100L)
    assert(r.getDouble(2) == 50.0 && r.getDouble(3) == 0.5)
  }

  test("q96: temperature keep-rates are exact on a hand mix, the tail source " +
    "is up-weighted, rates cap at 1.0, and the doc filter is deterministic") {
    import spark.implicits._
    def mixFixture(rows: (Long, String, String)*): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-tempmix").toString
      rows.toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    def toks(n: Int) = Seq.fill(n)("w").mkString(" ")
    // big = 400 tokens, small = 100: sw = 20 + 10, budget = 0.5·500 = 250
    //   rate(big)   = (20/30)·250/400 = 5/12  = 0.416667
    //   rate(small) = (10/30)·250/100 = 5/6   = 0.833333
    val dir = mixFixture(
      (1L, toks(100), "big"), (2L, toks(100), "big"),
      (3L, toks(100), "big"), (4L, toks(100), "big"),
      (5L, toks(100), "small"))
    val out = CurationOps.q96TemperatureMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("big")._3 == 0.416667 && out("small")._3 == 0.833333)
    assert(out("big")._1 == 4L && out("big")._2 == 400L)
    out.values.foreach { case (nDocs, srcTok, rate, nKept, keptTok) =>
      assert(nKept <= nDocs && keptTok <= srcTok && rate <= 1.0)
      assert(keptTok == nKept * 100, "every fixture doc is 100 tokens")
    }
    // determinism: the md5-bucket filter gives the same sample every run
    val again = CurationOps.q96TemperatureMix(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out.map { case (k, v) => k -> v._4 } == again)

    // a tiny tail source whose fair share exceeds its size caps at 1.0
    // and keeps its doc with certainty (u < 1 always)
    val dir2 = mixFixture((1L, toks(400), "bulk"), (2L, toks(4), "tail"))
    val out2 = CurationOps.q96TemperatureMix(spark, dir2).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
    assert(out2("tail") == ((1.0, 1L)))
    assert(out2("bulk")._1 == 0.459091)
  }

  test("q98 bloom: inserted keys always probe true (no false negatives), " +
    "absent keys mostly probe false (the prefilter actually prunes)") {
    import graft.functions.CurationOps._
    val rng = new scala.util.Random(7)
    val members = Array.fill(2000)(rng.nextLong())
    val (words, nBits) = bloomBitset(members)
    assert(java.lang.Long.bitCount(nBits) == 1 && nBits >= members.length * 16L)
    import spark.implicits._
    val hit = members.toSeq.toDF("h")
      .where(bloomProbe(words, nBits, org.apache.spark.sql.functions.col("h")))
      .count()
    assert(hit == members.length, "bloom must never drop a member")
    val memberSet = members.toSet
    val absent = Array.fill(20000)(rng.nextLong()).filterNot(memberSet)
    val fp = absent.toSeq.toDF("h")
      .where(bloomProbe(words, nBits, org.apache.spark.sql.functions.col("h")))
      .count()
    assert(fp < absent.length * 0.05,
      s"fpp should be ~1% at 16 bits/key k=3; got $fp/${absent.length}")
  }

  test("q98: bloom prefilter + exact rescore equals the plain exact join " +
    "(decontamination answer is independent of the filter)") {
    import spark.implicits._
    val dir = fixture(
      19L -> "secret eval trigram plus context words",  // eval doc (19 % 19 == 0)
      1L  -> "contains the secret eval trigram here",   // overlaps eval
      2L  -> "totally clean training text no overlap",
      3L  -> "eval trigram plus more shared span here") // overlaps eval
    val out = CurationOps.q98BloomDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact expectation: doc1 shares "secret eval trigram" + "eval trigram plus"?
    // doc1 3-grams: [contains the secret, the secret eval, secret eval trigram,
    //                eval trigram here] -> matches {secret eval trigram}
    // doc3 3-grams: [eval trigram plus, trigram plus more, ...] -> {eval trigram plus}
    assert(out == Map(1L -> 1L, 3L -> 1L))
  }

  test("q98: an eval set larger than the driver-side cap fails LOUDLY before " +
    "collecting it (the limit bounds the collect by construction), and answers " +
    "below the cap are unchanged") {
    import spark.implicits._
    val dir = fixture(
      19L -> "secret eval trigram plus context words",
      1L  -> "contains the secret eval trigram here",
      2L  -> "totally clean training text no overlap",
      3L  -> "eval trigram plus more shared span here")
    // the eval doc yields 5 distinct 3-grams > cap of 2 → guard trips
    val e = intercept[IllegalArgumentException] {
      CurationOps.bloomDecontaminate(spark, dir, maxHashes = 2).collect()
    }
    assert(e.getMessage.contains("bloom_filter_agg"), e.getMessage)
    // one above the real count → same answer as the default-capped query
    val capped = CurationOps.bloomDecontaminate(spark, dir, maxHashes = 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 1L, 3L -> 1L))
  }

  test("q105: weighted sample is a proper without-replacement top-k — 20 " +
    "distinct docs, keys strictly decreasing, heavy docs dominate") {
    import graft.functions.CurationOps
    // 5 heavy docs (200 tokens) vs 20 light docs (3 tokens): exponential
    // keys ln(u)/w concentrate heavy docs near 0, so they dominate the
    // sample unless their u is astronomically unlucky
    val heavy = (1L to 5L).map(i => i -> (1 to 200).map(j => s"h$j").mkString(" "))
    val light = (6L to 25L).map(i => i -> "a b c")
    val dir = fixture((heavy ++ light): _*)
    val rows = CurationOps.q105WeightedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    assert(rows.map(_._1).distinct.length == 20, "without replacement = distinct docs")
    val keys = rows.map(_._3)
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b }, "ordered by key desc")
    val heavyIn = rows.count(_._2 == 200L)
    assert(heavyIn >= 4, s"expected most heavy docs in the sample, got $heavyIn")
  }

  test("q67: a benchmark entry that is not a word-3-gram is rejected at the " +
    "boundary (both match paths only agree on 3-token shingles), and the " +
    "error names the offending entries") {
    import graft.functions.CurationOps._
    val dir = fixture(1L -> "alpha beta gamma delta")
    val e1 = intercept[IllegalArgumentException] {
      contamination(spark, dir, Seq("alpha beta", "ok three gram"))
    }
    assert(e1.getMessage.contains("'alpha beta'"), s"must name the offender: ${e1.getMessage}")
    assert(!e1.getMessage.contains("'ok three gram'"), "must not name valid entries")
    val e2 = intercept[IllegalArgumentException] {
      contamination(spark, dir, Seq("alpha beta gamma delta"))
    }
    assert(e2.getMessage.contains("'alpha beta gamma delta'"))
  }

  test("q134 DSIR: target-source docs score higher per-token than the rest " +
    "(the importance weights discriminate), and totals are consistent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = CurationOps.q134DsirWeights(spark, sf0001)
      .join(Tables(spark, sf0001, "documents").select($"doc_id", $"source"), "doc_id")
    val Array(tgt, rest) = w
      .groupBy(($"source" === "src0").as("is_target"))
      .agg(avg($"avg_lw").as("m"))
      .orderBy($"is_target".desc)
      .as[(Boolean, Double)].collect().map(_._2)
    // the estimated importance model must rate its own estimation slice
    // above the raw mix — the DSIR selection property
    assert(tgt > rest,
      s"src0 docs should score higher under their own target model: $tgt <= $rest")
    // avg_lw is logw/n_tokens (same rounding discipline both columns)
    val bad = CurationOps.q134DsirWeights(spark, sf0001)
      .where(abs($"avg_lw" - $"logw" / $"n_tokens") > 2e-6).count()
    assert(bad == 0L)
  }
}
