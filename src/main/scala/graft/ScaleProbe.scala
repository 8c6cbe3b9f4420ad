package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** Scale-up experiment (dev tool): run the heavy relational shapes at
  * 1× and N× the sf0.1 row count (fact tables unioned with shifted
  * keys — same distributions, N× the data) and report the runtime
  * ratio. The 100 TB claim is that these plans scale with data size,
  * not super-linearly: partial aggs stay map-side, broadcasts stay
  * broadcasts, shuffles stay key-partitioned.
  *
  *   sbt "runMain graft.ScaleProbe [N]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // N copies with disjoint key spaces: same key cardinality growth as
    // a bigger SF (keys scale with data), same value distributions
    def scaled(name: String, keyCols: Seq[String]): DataFrame = {
      val base = Tables(spark, sfDir, name)
      val shift = 100000000L
      (0 until factor).map { i =>
        keyCols.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * shift)))
      }.reduce(_ union _)
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val li1 = Tables(spark, sfDir, "lineitem")
    val liN = scaled("lineitem", Seq("l_orderkey"))
    val ord1 = Tables(spark, sfDir, "orders")
    val ordN = scaled("orders", Seq("o_orderkey", "o_custkey"))

    def q1(li: DataFrame): Long = li
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity"), sum($"l_extendedprice"), count(lit(1))).count()

    def joinAgg(li: DataFrame, o: DataFrame): Long = li
      .join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(sum($"l_extendedprice")).count()

    def topk(o: DataFrame): Long =
      graft.plans.TopK.perGroup(
        o.select($"o_custkey", $"o_orderkey", $"o_totalprice"),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3).count()

    // warm codegen on the small side first
    q1(li1); joinAgg(li1, ord1); topk(ord1)
    time("q1_agg_1x")(q1(li1))
    time(s"q1_agg_${factor}x")(q1(liN))
    time("join_agg_1x")(joinAgg(li1, ord1))
    time(s"join_agg_${factor}x")(joinAgg(liN, ordN))
    time("topk_custom_1x")(topk(ord1))
    time(s"topk_custom_${factor}x")(topk(ordN))

    // The text-dedup chain (q30 → q31 → q54) — where the 100 TB claims
    // are most load-bearing. N textually-DISJOINT copies (every token
    // gets a per-copy suffix, so shingle spaces never collide across
    // copies): the duplicate-cluster structure per copy is identical to
    // the original — a bigger crawl at the same dup rate — and candidate
    // pairs grow linearly, which is exactly the property the probe must
    // confirm the PLANS preserve (LSH bands / df-cap / union-find, not
    // an all-pairs blowup).
    val docsNDir = {
      val base = Tables(spark, sfDir, "documents")
      val dir = java.nio.file.Files.createTempDirectory("graft-scale-docs").toString
      val shift = 100000000L
      (0 until factor).map { i =>
        base.withColumn("doc_id", $"doc_id" + lit(i * shift))
          .withColumn("text", regexp_replace($"text", "(\\S+)", s"$$1c$i"))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    import graft.functions.TextOps
    def lsh(d: String): Long = TextOps.q30MinHashLsh(spark, d).count()
    def jaccard(d: String): Long = TextOps.q31JaccardPairs(spark, d).count()
    def components(d: String): Long = TextOps.q54NearDupComponents(spark, d).count()
    lsh(sfDir); jaccard(sfDir); components(sfDir) // warm
    time("minhash_lsh_1x")(lsh(sfDir))
    time(s"minhash_lsh_${factor}x")(lsh(docsNDir))
    time("jaccard_1x")(jaccard(sfDir))
    time(s"jaccard_${factor}x")(jaccard(docsNDir))
    time("components_1x")(components(sfDir))
    time(s"components_${factor}x")(components(docsNDir))

    // The curation additions with corpus-sized intermediates: q70's
    // line-frequency join, q71's distributed prefix sum, and q77's
    // token×unigram join — each must grow linearly, not by join blowup
    // or single-partition collapse.
    import graft.functions.CurationOps
    def lines(d: String): Long = CurationOps.q70BoilerplateLines(spark, d).count()
    def pack(d: String): Long = CurationOps.q71SequencePack(spark, d).count()
    def surprisal(d: String): Long = TextOps.q77Surprisal(spark, d).count()
    lines(sfDir); pack(sfDir); surprisal(sfDir) // warm
    time("boilerplate_1x")(lines(sfDir))
    time(s"boilerplate_${factor}x")(lines(docsNDir))
    time("seqpack_1x")(pack(sfDir))
    time(s"seqpack_${factor}x")(pack(docsNDir))
    time("surprisal_1x")(surprisal(sfDir))
    time(s"surprisal_${factor}x")(surprisal(docsNDir))

    // Embedding pruning (q83): labels shift per copy so CELLS scale with
    // the data while per-cell population stays constant — the real-corpus
    // contract (k-means k grows with the corpus; cell size is bounded by
    // design). Σ|cell|² then grows linearly; a probe that kept 10 labels
    // over N× vectors would instead measure the quadratic blowup the
    // operator is explicitly not supposed to have at fixed cell size.
    val embNDir = {
      val base = Tables(spark, sfDir, "embeddings")
      val dir = java.nio.file.Files.createTempDirectory("graft-scale-emb").toString
      val shift = 100000000L
      (0 until factor).map { i =>
        base.withColumn("vec_id", $"vec_id" + lit(i * shift))
          .withColumn("label", $"label" + lit(i * 1000))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    import graft.functions.VectorOps
    def semdedup(d: String): Long = VectorOps.q83SemDedup(spark, d).count()
    def xsrc(d: String): Long = TextOps.q86CrossSourceDup(spark, d).count()
    semdedup(sfDir); xsrc(sfDir) // warm
    time("semdedup_1x")(semdedup(sfDir))
    time(s"semdedup_${factor}x")(semdedup(embNDir))
    time("xsrc_dup_1x")(xsrc(sfDir))
    time(s"xsrc_dup_${factor}x")(xsrc(docsNDir))

    // KL drift (q90): the per-copy token suffixing grows the VOCABULARY
    // ~10x, so this probes the vocab-sized broadcast model path — the
    // operator's scale-sensitive half (the tf shuffle is combiner-bound).
    def drift(d: String): Long = TextOps.q90SourceDrift(spark, d).count()
    def novelty(d: String): Long = TextOps.q91Novelty(spark, d).count()
    drift(sfDir); novelty(sfDir) // warm
    time("kl_drift_1x")(drift(sfDir))
    time(s"kl_drift_${factor}x")(drift(docsNDir))
    time("novelty_1x")(novelty(sfDir))
    time(s"novelty_${factor}x")(novelty(docsNDir))

    // Round-7 additions. q93: the columnar-moments aggregate — the whole
    // point is that N× vectors cost N× scan and STILL one row through
    // the exchange. q95: candidate-bounded calibration — the disjoint
    // copies keep candidates linear, so the intersection joins must
    // too. q96: two corpus scans + a broadcast rate table.
    def dimstats(d: String): Long = VectorOps.q93DimStats(spark, d).count()
    def calib(d: String): Long = TextOps.q95MinhashCalibration(spark, d).count()
    def tempmix(d: String): Long = CurationOps.q96TemperatureMix(spark, d).count()
    dimstats(sfDir); calib(sfDir); tempmix(sfDir) // warm
    time("dim_stats_1x")(dimstats(sfDir))
    time(s"dim_stats_${factor}x")(dimstats(embNDir))
    time("minhash_calib_1x")(calib(sfDir))
    time(s"minhash_calib_${factor}x")(calib(docsNDir))
    time("temp_mix_1x")(tempmix(sfDir))
    time(s"temp_mix_${factor}x")(tempmix(docsNDir))

    // Round-7 batch 2. q98: the bloom prefilter path — disjoint copies
    // grow BOTH the eval shingle set (bigger bitset, still KB-scale) and
    // the probed corpus linearly; the rescore join stays
    // survivor-bounded. q99: vocab stays capped at 500 (<unk> absorbs
    // the suffixed tokens), so the model join must stay broadcast-sized
    // while the corpus side grows. q100: candidate edges grow linearly
    // with the copies, and 5 iterations of rank⋈edges must too.
    def bloom(d: String): Long = CurationOps.q98BloomDecontaminate(spark, d).count()
    def bigram(d: String): Long = TextOps.q99BigramPerplexity(spark, d).count()
    def pagerank(d: String): Long = TextOps.q100PageRank(spark, d).count()
    bloom(sfDir); bigram(sfDir); pagerank(sfDir) // warm
    time("bloom_decon_1x")(bloom(sfDir))
    time(s"bloom_decon_${factor}x")(bloom(docsNDir))
    time("bigram_ppl_1x")(bigram(sfDir))
    time(s"bigram_ppl_${factor}x")(bigram(docsNDir))
    time("pagerank_1x")(pagerank(sfDir))
    time(s"pagerank_${factor}x")(pagerank(docsNDir))

    // q103: triangle join bounded by the candidate graph — disjoint
    // copies grow cliques linearly, so wedges and triangles must too.
    def triangles(d: String): Long = TextOps.q103Triangles(spark, d).count()
    triangles(sfDir) // warm
    time("triangles_1x")(triangles(sfDir))
    time(s"triangles_${factor}x")(triangles(docsNDir))

    // Event-stream analytics: N user-disjoint copies (user_id and
    // event_id shift; timestamps unchanged, read/written as raw nanos
    // longs so Tables' ns→µs conversion applies to the copy too). Users
    // scale WITH the data, so per-user window partitions keep constant
    // width — the property the per-user window ops must preserve
    // (more partitions, never wider ones).
    val eventsNDir = {
      val base = spark.read.parquet(s"$sfDir/events.parquet")
      val dir = java.nio.file.Files.createTempDirectory("graft-scale-events").toString
      val shift = 100000000L
      (0 until factor).map { i =>
        base.withColumn("event_id", $"event_id" + lit(i * shift))
          .withColumn("user_id", $"user_id" + lit(i * shift))
      }.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def trigramsEv(d: String): Long = TimeSeries.q104BehaviorTrigrams(spark, d).count()
    def attribution(d: String): Long = TimeSeries.q109Attribution(spark, d).count()
    trigramsEv(sfDir); attribution(sfDir) // warm
    time("behavior_trigrams_1x")(trigramsEv(sfDir))
    time(s"behavior_trigrams_${factor}x")(trigramsEv(eventsNDir))
    time("attribution_1x")(attribution(sfDir))
    time(s"attribution_${factor}x")(attribution(eventsNDir))
    spark.stop()
  }
}
