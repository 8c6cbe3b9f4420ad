package graft

import graft.functions.TextOps

/** Functional guards for the near-dup operators' scale levers. */
class TextDedupSpec extends SparkSpec {

  test("q111: each Gopher rule trips on exactly its engineered doc and the " +
    "clean doc keeps (hand-computed signals)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    Seq(
      1L -> "the quick brown fox jumps over that lazy dog", // all rules pass
      2L -> "a bb",                                         // too short + mean wordlen 1.5
      3L -> "the spam spam spam spam spam spam spam spam spam", // ttr 0.2 < 0.3
      4L -> "zebra yak xylophone walrus vulture",            // no stopword
      5L -> ("the extraordinarily incomprehensibilities overqualification " +
        "hippopotomonstrosesquipedalian"))                   // mean wordlen 17.2 > 10
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q111GopherRules(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1L, 1L)), s"clean doc: ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 1L, 1L, 0L)), s"short doc: ${out(2L)}")
    assert(out(3L) == ((1L, 1L, 0L, 1L, 0L)), s"repetitive doc: ${out(3L)}")
    assert(out(4L) == ((1L, 1L, 1L, 0L, 0L)), s"stopword-free doc: ${out(4L)}")
    assert(out(5L) == ((1L, 0L, 1L, 1L, 0L)), s"long-word doc: ${out(5L)}")
    // hand-check one signal column: doc 1 mean word length = 36/9 = 4.0
    val m = TextOps.q111GopherRules(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(1L) == 4.0 && m(2L) == 1.5, m.toString)
  }

  test("q114: the classifier score is sigmoid of the mean bucket weight — " +
    "exact on a hand-computed doc, and identical token MULTISETS score " +
    "identically (binary bag-of-words)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-clf").toString
    Seq(1L -> "join join join", 2L -> "join", 3L -> "join filter")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q114QualityClassifier(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // md5("join") starts "73" = bucket 115 → ((115*37+11)%256-127.5)/512 =
    // 42.5/512; sigmoid(0.083008) = 0.520740 (hand math)
    assert(out(1L) == out(2L), "duplicate tokens are ONE binary feature")
    assert(out(2L)._1 == 1L && out(2L)._2 == 0.083008 && out(2L)._3 == 0.520740, out(2L).toString)
    // doc 3 averages join (42.5/512) and filter ("b2"=178 → 69.5/512):
    // logit = 56/512 = 0.109375, sigmoid = 0.527317
    assert(out(3L) == ((2L, 0.109375, 0.527317)), out(3L).toString)
  }

  test("q115: a source matching the corpus length mix scores PSI near zero; a " +
    "shifted source scores higher, and all PSI values are non-negative") {
    import spark.implicits._
    // balanced: two sources with the SAME digit-count mix (10 one-digit,
    // 10 two-digit chars); drifted: all docs in a third bin
    val dir = java.nio.file.Files.createTempDirectory("graft-psi").toString
    val mk = (src: String, n1: Int, n2: Int, n3: Int) =>
      (1 to n1).map(i => (s"$src-a$i", src, 5L)) ++
        (1 to n2).map(i => (s"$src-b$i", src, 50L)) ++
        (1 to n3).map(i => (s"$src-c$i", src, 500L))
    (mk("even1", 10, 10, 0) ++ mk("even2", 10, 10, 0) ++ mk("drift", 0, 0, 20))
      .zipWithIndex.map { case ((_, src, nc), i) => (i.toLong, "x", src, nc) }
      .toSeq.toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val psi = TextOps.q115PsiDrift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(psi.values.forall(_ >= 0.0), psi.toString)
    assert(psi("even1") == psi("even2"), "identical mixes must score identically")
    assert(psi("drift") > psi("even1") + 0.5,
      s"fully-shifted source must dominate: $psi")
  }

  test("q112: leakage pairs equal an independent per-fingerprint recomputation " +
    "from the actual split assignment (engineered shared prefixes)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-leak").toString
    val prefixA = "alpha beta gamma delta epsilon zeta eta theta"
    val prefixB = "iota kappa lambda mu nu xi omicron pi"
    // doc_ids chosen so the md5 buckets SPAN splits (1=train, 3=test,
    // 5=val, 2=train, 10=val); the recomputation below still derives the
    // expected pairs from the ACTUAL assignment, so the test would catch
    // a split-formula drift rather than silently go vacuous
    val docsRows = Seq(
      1L -> s"$prefixA one", 3L -> s"$prefixA two", 5L -> s"$prefixA three",
      2L -> s"$prefixB tail", 10L -> s"$prefixB other",
      600000L -> "totally different words with no shared prefix here now")
    docsRows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val split = TextOps.q55HashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // independent recomputation: group docs by engineered prefix, count
    // distinct ordered split pairs per group
    val groups = Seq(Seq(1L, 3L, 5L), Seq(2L, 10L))
    val expected = groups
      .flatMap { g =>
        val ss = g.map(split).distinct.sorted
        for (a <- ss; b <- ss if a < b) yield (a, b)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = TextOps.q112SplitLeakage(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == expected, s"q112 $out vs recomputed $expected (splits: $split)")
    assert(out.size == 3 && out(("train", "val")) == 2L,
      s"fixture must exercise multiple pair types: $out") // guards vacuity
  }

  test("q75: source signatures — identical sources agree on all 8 slices, " +
    "disjoint sources on none") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-srcsim").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon", "srcA"),
      (2L, "alpha beta gamma delta epsilon", "srcB"), // identical shingles as srcA
      (3L, "zeta eta theta iota kappa", "srcC")) // fully disjoint shingles
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.functions.TextOps.q75SourceSimilarity(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("srcA", "srcB")) == ((8L, 1.0)))
    assert(out(("srcA", "srcC")) == ((0L, 0.0)))
    assert(out(("srcB", "srcC")) == ((0L, 0.0)))
    assert(out.size == 3) // each unordered pair exactly once
  }

  test("q99: bigram perplexity is exact on a hand corpus (MLE conditional " +
    "with prefix-count denominator)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bigram").toString
    // doc1 bigrams: (a,b),(b,a),(a,b); doc2: (a,c)
    // c2: (a,b)=2 (b,a)=1 (a,c)=1; prefix c1: a=3, b=1
    // doc1 nll = avg(ln(3/2), ln(1/1), ln(3/2)) -> ppl = 1.5^(2/3)
    // doc2 nll = ln(3/1)                        -> ppl = 3.0
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q99BigramPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, BigDecimal(math.pow(1.5, 2.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(2L) == ((1L, 3.0)))
  }

  test("q99: out-of-vocab tokens fold into <unk> — a doc of only rare tokens " +
    "scores ppl exactly 1.0 (the unk-degeneracy artifact, pinned)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bigram-unk").toString
    // vocab cap is 500: 'hot' (count 3) + f001..f499 make the vocab
    // (count-1 ties break token-asc; f-tokens sort before z-tokens).
    // Out-of-vocab: f500..f510, z01..z21. Every bigram whose tokens are
    // both out-of-vocab is (unk,unk); the only unk-prefixed bigrams in
    // this corpus ARE (unk,unk), so P(unk|unk)=1 and the all-rare doc
    // scores ppl = 1.0 exactly.
    val filler = (1 to 510).map(i => f"f$i%03d").mkString(" ")
    val rare = (1 to 21).map(i => f"z$i%02d").mkString(" ")
    Seq((1L, filler), (2L, rare), (3L, "hot hot hot")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q99BigramPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(2L) == ((20L, 1.0)), s"all-rare doc must be unk-degenerate: $out")
    assert(out(3L) == ((2L, 1.0)), "hot-hot bigram is also deterministic")
  }

  test("q100: PageRank on a hand graph — one duplicate pair + two isolated " +
    "docs; exact 5-iteration values, mass conserved") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pagerank").toString
    // identical docs 1,2 -> the only candidate edge; 3,4 isolated (dangling)
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"),
      (4L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q100PageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand-rolled: r_a tracks the linked pair, r_c the dangling docs;
    // dm = 2*r_c each step; after 5 iterations r*N = 1.728882 / 0.271118
    assert(out(1L) == 1.728882 && out(2L) == 1.728882, s"linked pair: $out")
    assert(out(3L) == 0.271118 && out(4L) == 0.271118, s"dangling: $out")
    assert(math.abs(out.values.sum - 4.0) < 1e-4, "PageRank mass must sum to N")
  }

  test("q103: triangles — a 3-clique of identical docs scores lcc 1.0, a " +
    "plain duplicate pair has no triangle, and no triangle is double-counted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),   // 1-2-3 triangle
      (4L, "one two three four five six"),
      (5L, "one two three four five six"))           // 4-5 edge only
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q103Triangles(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id) == ((2L, 1L, 1.0)), s"clique node $id: $out")
    }
    Seq(4L, 5L).foreach { id =>
      assert(out(id) == ((1L, 0L, 0.0)), s"pair node $id: $out")
    }
  }

  test("q32: the codegen simhash expression equals the declarative " +
    "explode+vote form on the corpus and on dup/unicode fixtures") {
    import spark.implicits._
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nativeOut = asMap(TextOps.q32SimHash(spark, sf0001))
    val declOut = asMap(TextOps.simHashDeclarative(spark, sf0001))
    assert(nativeOut == declOut, "corpus equivalence")
    assert(nativeOut.nonEmpty && nativeOut.values.forall(_.matches("[01]{16}")))
    val dir = java.nio.file.Files.createTempDirectory("graft-simhash").toString
    Seq(
      (1L, "alpha alpha alpha beta"),   // duplicate tokens vote once
      (2L, "alpha beta"),               // same distinct set as doc 1
      (3L, "naïve café 日本語"))          // non-ASCII md5 paths agree
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val n2 = asMap(TextOps.q32SimHash(spark, dir))
    assert(n2 == asMap(TextOps.simHashDeclarative(spark, dir)))
    assert(n2(1L) == n2(2L), "distinct-token sets equal -> sketches equal")
  }

  test("q116: containment catches a short doc EMBEDDED in a long one that " +
    "Jaccard-threshold dedup misses, and names the contained side") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-containment").toString
    val quote = "alpha beta gamma delta epsilon zeta"       // 4 shingles
    val host = (1 to 60).map(i => s"w$i").mkString(" ")      // 58 shingles of filler
    Seq(
      1L -> quote,                         // the short doc
      2L -> s"$host $quote end marker x",  // contains every shingle of doc 1
      3L -> "totally unrelated words here")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextOps.q116ContainmentPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_contained"), r.getAs[Long]("doc_container"),
        r.getAs[Double]("containment"), r.getAs[Double]("jaccard")))
    val hit = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(hit.nonEmpty, s"doc 1 must be detected inside doc 2: ${pairs.toSeq}")
    assert(hit.get._3 == 1.0, s"full containment expected: $hit")
    assert(hit.get._4 < 0.10,
      s"the pair must sit BELOW q31's Jaccard threshold (that's the point): $hit")
    // and q31 indeed does not report it
    val jac = TextOps.q31JaccardPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!jac.contains((1L, 2L)), jac.toString)
  }

  test("q118: winnowed span fingerprints catch an 11-token shared run at ANY " +
    "alignment; a 7-token overlap and sub-minimum docs never fire") {
    import spark.implicits._
    val run = (1 to 11).map(i => s"r$i").mkString(" ") // the shared verbatim run
    val short = (1 to 7).map(i => s"r$i").mkString(" ") // below one 8-window
    // the winnowing guarantee is alignment-free: shift the run's offset in
    // doc 2 across every residue of the old stride-4 trap
    (0 to 4).foreach { shift =>
      val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
      val pad = (1 to (3 + shift)).map(i => s"p$i").mkString(" ")
      Seq(
        1L -> s"$run ${(1 to 9).map(i => s"a$i").mkString(" ")}",
        2L -> s"$pad $run ${(1 to 6).map(i => s"b$i").mkString(" ")}",
        3L -> s"$short ${(1 to 10).map(i => s"c$i").mkString(" ")}",
        4L -> (1 to 10).map(i => s"d$i").mkString(" ")) // < 11 tokens: no winnow window
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = TextOps.q118RepeatedSpans(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_spans")).toMap
      assert(out.getOrElse(1L, 0L) >= 1L && out.getOrElse(2L, 0L) >= 1L,
        s"shift=$shift: the 11-token run must be detected in both docs: $out")
      assert(out(3L) == 0L,
        s"shift=$shift: a 7-token overlap spans no full 8-window: $out")
      assert(!out.contains(4L), s"shift=$shift: 10-token doc has no winnow window: $out")
    }
  }

  test("q148: a 20-token shared run reconstructs as EXACTLY one merged span " +
    "per doc with exact token boundaries (windows straddling unique padding " +
    "never fire)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-exsub").toString
    val run = (1 to 20).map(i => s"R$i").mkString(" ")
    Seq(
      1L -> s"${(1 to 10).map(i => s"u$i").mkString(" ")} $run ${(1 to 10).map(i => s"v$i").mkString(" ")}",
      2L -> s"${(1 to 5).map(i => s"w$i").mkString(" ")} $run ${(1 to 8).map(i => s"x$i").mkString(" ")}")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q148ExactSubstrSpans(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(out(1L) == Seq((11L, 30L, 20L)), s"doc 1 spans: ${out(1L)}")
    assert(out(2L) == Seq((6L, 25L, 20L)), s"doc 2 spans: ${out(2L)}")
  }

  test("q148 catches SELF-repetition (the same 8-gram twice in ONE doc) that " +
    "q118's cross-doc countDistinct deliberately ignores, and a 1-token gap " +
    "between duplicated runs keeps the spans separate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-exsub2").toString
    val s8 = (1 to 8).map(i => s"S$i").mkString(" ")
    val r8 = (1 to 8).map(i => s"Q$i").mkString(" ")
    Seq(
      // doc 3: S8 twice internally, nowhere else in the corpus
      3L -> s"y1 y2 y3 y4 $s8 z1 z2 z3 z4 $s8 e1 e2 e3 e4",
      // docs 4/5: two shared 8-runs with DIFFERENT 1-token gaps, so the
      // gap-straddling windows are unique per doc
      4L -> s"$s8 gapA $r8 ${(1 to 8).map(i => s"f$i").mkString(" ")}",
      5L -> s"$s8 gapB $r8 ${(1 to 8).map(i => s"g$i").mkString(" ")}")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q148ExactSubstrSpans(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    // doc 3: both occurrences of S8 are flagged (positions 5..12 and 17..24)
    assert(out(3L) == Seq((5L, 12L, 8L), (17L, 24L, 8L)), s"doc 3: ${out(3L)}")
    // doc 3 shares nothing with another doc — q118 reports zero shared spans
    val q118 = TextOps.q118RepeatedSpans(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_spans")).toMap
    assert(q118(3L) == 0L, s"q118 must not see self-repetition as shared: $q118")
    // docs 4/5: two separate 8-token spans each — never merged across the gap
    assert(out(4L) == Seq((1L, 8L, 8L), (10L, 17L, 8L)), s"doc 4: ${out(4L)}")
    assert(out(5L) == Seq((1L, 8L, 8L), (10L, 17L, 8L)), s"doc 5: ${out(5L)}")
  }

  test("q152: the width-16 detector fires only on runs >= 16 tokens (the " +
    "width-8 hits shorter runs q152 must skip), its spans sit inside q148's, " +
    "and a 20-token run reconstructs at the same exact boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-exsub16").toString
    val run20 = (1 to 20).map(i => s"R$i").mkString(" ")
    val run10 = (1 to 10).map(i => s"T$i").mkString(" ")
    Seq(
      // 20-token shared run: both widths must find it, same boundaries
      1L -> s"${(1 to 10).map(i => s"u$i").mkString(" ")} $run20 ${(1 to 10).map(i => s"v$i").mkString(" ")}",
      2L -> s"${(1 to 5).map(i => s"w$i").mkString(" ")} $run20 ${(1 to 8).map(i => s"x$i").mkString(" ")}",
      // 10-token shared run: width 8 fires, width 16 must NOT
      3L -> s"${(1 to 16).map(i => s"a$i").mkString(" ")} $run10 ${(1 to 16).map(i => s"b$i").mkString(" ")}",
      4L -> s"${(1 to 16).map(i => s"c$i").mkString(" ")} $run10 ${(1 to 16).map(i => s"d$i").mkString(" ")}")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def spans(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long, Long)]] =
      df.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val w16 = spans(TextOps.q152ExactSubstrSpans16(spark, dir))
    val w8 = spans(TextOps.q148ExactSubstrSpans(spark, dir))
    assert(w16(1L) == Seq((11L, 30L, 20L)), s"doc 1: ${w16.get(1L)}")
    assert(w16(2L) == Seq((6L, 25L, 20L)), s"doc 2: ${w16.get(2L)}")
    assert(!w16.contains(3L) && !w16.contains(4L),
      s"width 16 fired on a 10-token run: $w16")
    assert(w8.contains(3L) && w8.contains(4L), s"width 8 must see the 10-run: $w8")
    // containment: any duplicated 16-run is a duplicated 8-run, so every
    // width-16 span lies inside some width-8 span of the same doc
    w16.foreach { case (doc, ss) => ss.foreach { case (a, b, _) =>
      assert(w8(doc).exists { case (a8, b8, _) => a8 <= a && b <= b8 },
        s"doc $doc: width-16 span ($a,$b) escapes the width-8 cover ${w8(doc)}")
    } }
  }

  test("q150: a leaked eval passage is cut at exact boundaries from TRAIN " +
    "docs only; train-train duplication never fires it (contrast with q148) " +
    "and sub-window overlap stays clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scrub").toString
    val leak = (1 to 12).map(i => s"L$i").mkString(" ") // the benchmark passage
    val dup = (1 to 10).map(i => s"D$i").mkString(" ")  // train-train duplicate
    Seq(
      // doc 19 is the eval doc (19 % 19 == 0) carrying the passage
      19L -> s"e1 e2 e3 $leak e4 e5 e6",
      // train doc 1 leaks the passage at tokens 6..17
      1L -> s"a1 a2 a3 a4 a5 $leak a6 a7 a8",
      // train docs 2/3 share a 10-token run with EACH OTHER, not with eval
      2L -> s"$dup b1 b2 b3 b4 b5 b6 b7 b8",
      3L -> s"c1 c2 c3 $dup c4 c5",
      // train doc 4 shares only 7 eval tokens — below one full window
      4L -> s"${(1 to 7).map(i => s"L$i").mkString(" ")} x1 x2 x3 x4 x5 x6 x7 x8")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q150EvalSpanScrub(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(out == Map(1L -> Seq((6L, 17L, 12L))),
      s"only doc 1's leaked passage, at exact boundaries: $out")
    // sanity: q148 DOES see the train-train duplicate q150 must ignore
    val q148 = TextOps.q148ExactSubstrSpans(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(q148.contains(2L) && q148.contains(3L), s"q148 sees 2/3: $q148")
  }

  test("q151: applying the cuts yields the hand-computed clean text hash — " +
    "a partially-leaked doc keeps exactly its non-leaked tokens, a FULLY " +
    "leaked doc comes back empty (md5 of ''), untouched docs pass through " +
    "whole, and eval docs never appear") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scrubapply").toString
    val leak = (1 to 12).map(i => s"L$i").mkString(" ")
    val clean2 = (1 to 15).map(i => s"k$i").mkString(" ")
    Seq(
      19L -> s"e1 e2 e3 $leak e4 e5 e6",          // eval doc
      1L -> s"a1 a2 a3 a4 a5 $leak a6 a7 a8",     // partial leak
      2L -> clean2,                               // untouched
      6L -> leak)                                 // FULLY leaked
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = TextOps.q151ScrubApply(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 6L), s"train docs only: ${out.keySet}")
    assert(out(1L) == ((1L, 8L, md5("a1 a2 a3 a4 a5 a6 a7 a8"))), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((0L, 15L, md5(clean2))), s"doc 2: ${out(2L)}")
    assert(out(6L) == ((1L, 0L, md5(""))), s"doc 6: ${out(6L)}")
  }

  test("q149: per-source savings are exact on a hand-built corpus and a " +
    "source with no duplicated span reports zero with full token mass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-exsav").toString
    val run = (1 to 20).map(i => s"R$i").mkString(" ")
    Seq(
      (1L, s"${(1 to 10).map(i => s"u$i").mkString(" ")} $run ${(1 to 10).map(i => s"v$i").mkString(" ")}", "web"),
      (2L, s"${(1 to 5).map(i => s"w$i").mkString(" ")} $run ${(1 to 8).map(i => s"x$i").mkString(" ")}", "books"),
      (3L, (1 to 30).map(i => s"c$i").mkString(" "), "code"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q149ExactSubstrSavings(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out("web") == ((1L, 40L, 20L, 0.5)), s"web: ${out("web")}")
    assert(out("books") == ((1L, 33L, 20L, 0.606061)), s"books: ${out("books")}")
    assert(out("code") == ((0L, 30L, 0L, 0.0)), s"code: ${out("code")}")
  }

  test("winnow density: selection keeps ~2/(w+1) of span positions on " +
    "hash-random text (the ~2.5x reduction the README claims)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-density").toString
    // deterministic pseudo-random tokens: md5 spans behave as random
    // hashes, which is all the winnowing density theorem needs
    val text = (1 to 2000).map(i => s"t${(i * 2654435761L) % 100000}").mkString(" ")
    Seq(1L -> text).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val selected = TextOps.winnowedSpans(
      spark.read.parquet(s"$dir/documents.parquet")).count()
    val positions = 2000 - 7
    val density = selected.toDouble / positions
    // E[density] = 2/(w+1) = 0.4 for w=4; wide tolerance for variance
    assert(density > 0.30 && density < 0.50,
      f"winnow density $density%.3f should be near 0.4")
  }

  test("q119: removable tokens charge exactly one keeper even on length " +
    "ties, and singletons report zero savings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-savings").toString
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      1L -> dup, 2L -> dup, // a 2-cluster of EQUAL lengths (8 tokens each)
      3L -> "totally different words in this one here now")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q119DedupSavings(spark, dir).collect()
      .map(r => r.getAs[Long]("component_size") ->
        ((r.getAs[Long]("n_components"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("removable_tokens")))).toMap
    // sum - max = 16 - 8: the tie still keeps exactly one doc
    assert(out(2L) == ((1L, 2L, 8L)), out.toString)
    assert(out(1L)._3 == 0L, s"singletons must report zero savings: $out")
  }

  test("q31: document-frequency cap bounds pair expansion from hot shingles") {
    import spark.implicits._
    // A boilerplate shingle shared by M docs yields O(M²) candidate pairs;
    // the df-cap must drop it before the self-join. 40 identical docs
    // (every shingle at df=40 > cap=30) would contribute C(40,2)=780
    // pairs uncapped; 2 docs sharing a rare text (df=2) survive.
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap").toString
    val hot = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon"))
    val rare = Seq((101L, "zeta eta theta iota kappa"), (102L, "zeta eta theta iota kappa"))
    (hot ++ rare).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = TextOps.q31JaccardPairs(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((101L, 102L)),
      s"expected only the rare-shingle pair, got ${pairs.mkString(", ")}")
  }

  test("q54: local union-find and iterative propagation produce identical component labels") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(40, for {
      a <- Gen.choose(1L, 25L); b <- Gen.choose(1L, 25L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    (0 until 4).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(11L + i)).get
        .distinct.toDF("doc_a", "doc_b")
      val local = TextOps.componentLabelsLocal(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val iter = TextOps.componentLabelsIterative(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local == iter, s"seed ${11 + i}")
      // labels are the component minimum: every label labels itself
      assert(local.filter(p => p._1 == p._2).map(_._1) == local.map(_._2))
    }
  }

  test("q31: no UNBOUNDED collect_set — doc sets go through capped_collect_set " +
    "whose buffers stop at cap+1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap3").toString
    Seq((1L, "one two three four")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = TextOps.q31JaccardPairs(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert("(?<!capped_)collect_set".r.findFirstIn(plan).isEmpty,
      "a hot shingle must never materialize an unbounded doc set on one row:\n" + plan)
    assert(plan.contains("capped_collect_set"), plan)
  }

  test("capped_collect_set: equals collect_set under the cap, NULL (poisoned) over it, " +
    "across many partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    graft.expressions.CappedCollectSet.register(spark)
    // key 1: 40 distinct values (> cap 30, spread over 16 partitions, with
    // duplicates) -> NULL; key 2: 30 distinct (= cap) -> the exact set;
    // key 3: duplicates of one value -> size-1 set
    val rows = (1L to 40L).map(v => (1L, v)) ++ (1L to 40L).map(v => (1L, v)) ++
      (1L to 30L).map(v => (2L, v)) ++ Seq.fill(50)((3L, 7L))
    val out = rows.toDF("k", "v").repartition(16)
      .groupBy($"k").agg(expr("capped_collect_set(v, 30)").as("ids"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toSet)).toMap
    assert(out(1L).isEmpty) // poisoned
    assert(out(2L).contains((1L to 30L).toSet))
    assert(out(3L).contains(Set(7L)))
  }

  test("q54 local solver: a 1M-edge graph solves in the single-task path " +
    "with primitive-array state") {
    // 100k chains of 10 edges / 11 nodes each; component label = chain min
    val edges = spark.range(1000000).selectExpr(
      "(id div 10) * 11 + id % 10 AS doc_a",
      "(id div 10) * 11 + id % 10 + 1 AS doc_b")
    val labels = TextOps.componentLabelsLocal(edges)
    assert(labels.count() == 1100000L)
    import org.apache.spark.sql.functions.expr
    assert(labels.filter(expr("lbl != (doc_id div 11) * 11")).count() == 0L)
  }

  test("q31: df-cap keeps answers unchanged when no shingle exceeds it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap2").toString
    Seq((1L, "one two three four"), (2L, "one two three five"), (3L, "six seven eight nine"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.q31JaccardPairs(spark, dir).collect()
    // docs 1,2 share shingles {one two three} (df=2 ≤ cap): jaccard 1/3
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)), rows.mkString(", "))
    assert(math.abs(rows.head.getDouble(3) - 1.0 / 3.0) < 1e-12)
  }

  test("q86: cross-source prefix dups — shared 8-token prefix pairs sources once; " +
    "short docs fingerprint their full text; no within-source pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xsrc").toString
    Seq(
      (1L, "p q r s t u v w extra one", "src1"),   // same 8-prefix as doc 2
      (2L, "p q r s t u v w different tail", "src2"),
      (3L, "p q r s t u v w third copy", "src1"),  // same prefix, SAME source as 1
      (4L, "totally unrelated text body here now ok", "src3"),
      (5L, "short text", "src4"),                  // < 8 tokens: full-text prefix
      (6L, "short text", "src5"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.functions.TextOps.q86CrossSourceDup(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("src1", "src2") -> 1L, ("src4", "src5") -> 1L),
      s"got $out")
  }

  test("q87: an exactly-Zipfian vocabulary (cnt = 12/rank) regresses to slope -1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    // counts 12, 6, 4, 3 at ranks 1..4: ln(cnt) = ln(12) - ln(rank)
    val text = (List.fill(12)("t1") ++ List.fill(6)("t2") ++
      List.fill(4)("t3") ++ List.fill(3)("t4")).mkString(" ")
    Seq((1L, text, "en", "src1")).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.functions.TextOps.q87ZipfSlope(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_ranks") == 4L)
    assert(rows.head.getAs[Double]("zipf_slope") == -1.0)
  }

  test("q88: funnel stages are monotone - each curation stage can only drop docs") {
    val out = graft.functions.TextOps.q88DedupFunnel(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("1_raw", "2_exact", "3_near_dup", "4_decontaminated", "5_quality"))
    val seq = Seq("1_raw", "2_exact", "3_near_dup", "4_decontaminated", "5_quality").map(out)
    assert(seq.zip(seq.tail).forall { case (a, b) => a >= b }, s"not monotone: $out")
    assert(out("1_raw") > 0 && out("5_quality") > 0)
  }

  test("q91: novelty — shingles shared by >= 5 docs count as corpus-common; a " +
    "unique doc scores 1.0, verbatim copies score 0.0, short docs are absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    val boiler = "terms of service apply to all users"
    ((1L to 5L).map(i => (i, boiler, "s")) ++ Seq(
      (6L, "completely original text with rare words", "s"),
      (7L, "too short", "s")))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.functions.TextOps.q91Novelty(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    (1L to 5L).foreach(i => assert(out(i)._3 == 0.0, s"copy $i should be all-common"))
    assert(out(6L)._2 == 0L && out(6L)._3 == 1.0)
    assert(!out.contains(7L), "2-token doc has no shingles and must be absent")
  }

  test("q90: KL drift is exact on a hand corpus — every source concentrates its " +
    "share by a constant factor, so KL reduces to ln of that factor") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // srcA = srcB (identical distributions), srcC vocabulary-disjoint with
    // the same SHAPE. Every source holds 1/3 of the tokens, so each of its
    // tokens is exactly k-times likelier in-source than in-corpus:
    //   A/B: p_s(t)/p_c(t) = 3/2 for every t  -> KL = ln 1.5
    //   C:   p_s(t)/p_c(t) = 3   for every t  -> KL = ln 3
    val common = "alpha beta gamma alpha beta alpha"
    Seq((1L, common, "srcA"), (2L, common, "srcB"),
        (3L, "delta epsilon zeta delta epsilon delta", "srcC"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.functions.TextOps.q90SourceDrift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("srcA") == out("srcB"))
    assert(math.abs(out("srcA") - math.log(1.5)) < 1e-6, s"srcA ${out("srcA")}")
    assert(math.abs(out("srcC") - math.log(3)) < 1e-6, s"srcC ${out("srcC")}")
  }

  test("q95: calibration on a hand pair — exact Jaccard 0.8 lands in the 0.8 " +
    "bucket, the estimate is a valid eighth, and mae is |est - exact|") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-calib").toString
    // doc1/doc2 share 8 of 10 distinct shingles (one trailing token
    // differs): exact J = 8/10. doc3 is vocabulary-disjoint — no shared
    // band, so exactly one candidate pair exists.
    Seq(
      (1L, "a b c d e f g h i j k"),
      (2L, "a b c d e f g h i j z"),
      (3L, "p q r s t u v w x y o"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.functions.TextOps.q95MinhashCalibration(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 1, s"expected one bucket, got ${rows.mkString(";")}")
    val (bucket, nPairs, meanExact, meanEst, mae) = rows.head
    assert(bucket == 0.8 && nPairs == 1L && meanExact == 0.8)
    assert(meanEst >= 0.0 && meanEst <= 1.0 && (meanEst * 8).round == meanEst * 8)
    assert(math.abs(mae - math.abs(meanEst - meanExact)) < 2e-6,
      s"single-pair bucket must have mae == |est - exact| ($mae vs $meanEst/$meanExact)")
  }
}
