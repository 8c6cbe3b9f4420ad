package graft

import graft.operators.{Relational, TimeSeries}
import graft.functions.VectorOps

/** Physical-plan assertions — the 100 TB design contract: filters reach
  * the parquet scan, projections prune columns, dimension joins
  * broadcast, top-k never globally sorts. These pin the properties
  * `.explain("formatted")` review established (SURVEY §4). */
class PlanSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: predicates are pushed to the parquet scan") {
    val plan = physical(Relational.q2FilterProject(spark, sf0001))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull(l_shipdate)") || plan.contains("GreaterThan"), plan)
  }

  test("q2: scan reads only the referenced columns (pruning)") {
    val plan = physical(Relational.q2FilterProject(spark, sf0001))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag"), readSchema) // untouched column stays unread
    assert(readSchema.contains("l_orderkey"), readSchema)
  }

  test("q3: nation/region dimension joins are broadcast, not shuffled") {
    val plan = physical(Relational.q3RevenueByNation(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q1: aggregation is partial (map-side) before the shuffle") {
    val plan = physical(Relational.q1PricingSummary(spark, sf0001))
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan)
  }

  test("q6: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = physical(Relational.q6TopCustomers(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q1/q2: hot path stays inside whole-stage codegen") {
    // codegen spans appear in the FINAL adaptive plan, so execute first
    val df = Relational.q1PricingSummary(spark, sf0001)
    df.collect() // count() would plan a separate query; collect finalizes THIS one
    val plan = df.queryExecution.executedPlan.toString
    // codegen nodes print as "*(n) HashAggregate" in the final plan
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }

  test("q33: query side of kNN is broadcast — candidates never shuffle") {
    val plan = physical(VectorOps.q33KnnBruteForce(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("q30: the minhash self-join reuses one shuffled signature build") {
    import graft.functions.TextOps
    val df = TextOps.q30MinHashLsh(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
  }

  test("q63: grouping sets — ONE events scan feeds both grouping levels via Expand") {
    val plan = physical(TimeSeries.q63GroupingSets(spark, sf0001))
    assert(plan.contains("Expand"), plan)
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events"))
    assert(scans == 1, s"expected exactly one events scan, got $scans:\n$plan")
  }

  test("q64/q65: redaction and chunking plan NO shuffle — per-row maps at scan speed") {
    import graft.functions.CurationOps
    Seq(CurationOps.q64PiiRedaction(spark, sf0001),
        CurationOps.q65Chunking(spark, sf0001)).foreach { df =>
      val plan = physical(df)
      assert(!plan.contains("Exchange"), plan)
    }
  }

  test("q66: stratified sample is ONE shuffle (the per-stratum rank), nothing else") {
    val plan = physical(graft.functions.CurationOps.q66StratifiedSample(spark, sf0001))
    assert(plan.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange") || l.trim.startsWith(": +- Exchange") ||
        l.contains("Exchange hashpartitioning")) == 1, plan)
  }

  test("q67: small benchmark list compiles into the scan — zero joins, zero " +
    "exchanges; large list broadcasts, the corpus still never shuffles") {
    import graft.functions.CurationOps._
    val compiled = physical(q67Contamination(spark, sf0001))
    assert(!compiled.contains("Exchange") && !compiled.contains("Join"), compiled)
    val big = BenchmarkShingles ++
      (1 to CompiledContaminationMaxNgrams).map(i => s"pad$i x y")
    val joined = physical(contamination(spark, sf0001, big))
    assert(joined.contains("BroadcastHashJoin"), joined)
  }

  test("q148: exact-substring spans — no pair expansion; the dup-hash count " +
    "aggregates partially before its shuffle; only ONE doc-keyed exchange " +
    "feeds the island window") {
    val plan = physical(graft.functions.TextOps.q148ExactSubstrSpans(spark, sf0001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // two-phase count(*) on the span hash: partial_count on the map side
    assert(plan.contains("partial_count"), plan)
    // the gaps-and-islands window and the final (doc_id, gid) groupBy both
    // ride a single doc_id exchange — dup positions shuffle once, and the
    // position table itself is never repartitioned by doc
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(doc_id")) == 1, plan)
  }

  test("q150: eval span scrub — a LEFT SEMI against the distinct eval windows " +
    "(never a row-multiplying inner), no hint (AQE decides), one doc-keyed " +
    "exchange for the islands") {
    val df = graft.functions.TextOps.q150EvalSpanScrub(spark, sf0001)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, "q150 must not force-broadcast the eval side: " +
      df.queryExecution.analyzed.toString)
    val plan = physical(df)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(doc_id")) == 1, plan)
  }

  test("q151: scrub apply — the token cut is a per-row higher-order filter " +
    "(no explode of the corpus back out), cut lists aggregate partially, " +
    "and nothing goes cartesian") {
    val df = graft.functions.TextOps.q151ScrubApply(spark, sf0001)
    val plan = physical(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // collect_list partials merge map-side before the doc_id exchange
    assert(plan.contains("partial_collect_list") || plan.contains("ObjectHashAggregate"), plan)
    // exactly one Generate (the window posexplode feeding ev/dp) per scan —
    // the corpus-side cut never re-explodes tokens into rows
    assert(plan.linesIterator.count(_.trim.startsWith("Generate")) <= 2, plan)
  }

  test("q70: boilerplate strip — no cartesian; per-doc reassembly aggregates " +
    "partially before its shuffle") {
    val plan = physical(graft.functions.CurationOps.q70BoilerplateLines(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    // final per-doc agg is two-phase: a map-side ObjectHashAggregate feeds the Exchange
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2, plan)
  }

  test("q71: sequence packing — the corpus-sized cumsum window is bucket-partitioned") {
    val plan = physical(graft.functions.CurationOps.q71SequencePack(spark, sf0001))
    assert(plan.linesIterator.exists(l =>
      l.contains("Window [") && l.contains("[bucket")), plan)
  }

  test("q72: the vocabulary-sized df table carries NO forced broadcast hint " +
    "(only the 1-row scalar is hinted) — AQE still broadcasts it at this SF") {
    val df = graft.functions.TextOps.q72TfIdf(spark, sf0001)
    // exactly one ResolvedHint in the logical plan: the bounded 1-row
    // count scalar. A second hint would mean the unbounded vocab table
    // is force-broadcast again (the 100 TB OOM the hint-drop removed).
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1, df.queryExecution.analyzed.toString)
    df.collect() // AQE's runtime choice lands in the final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q73: anomaly window reads the DAILY aggregate from ONE events scan") {
    val plan = physical(TimeSeries.q73DailyAnomaly(spark, sf0001))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
    assert(plan.contains("Window"), plan)
  }

  test("q74: quality sampling is a pure per-row map — zero shuffles") {
    val plan = physical(graft.functions.CurationOps.q74QualitySample(spark, sf0001))
    assert(!plan.contains("Exchange"), plan)
  }

  test("q75: source similarity — the signature build's exchange is REUSED " +
    "(one corpus scan) and the pair join broadcasts the sources-sized table") {
    val df = graft.functions.TextOps.q75SourceSimilarity(spark, sf0001)
    df.collect() // reuse is visible in the final adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q76: histogram — bounds broadcast; ONE combiner-friendly shuffle " +
    "of (type, bin) partials") {
    val plan = physical(operators.Extended.q76Histogram(spark, sf0001))
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
  }

  test("q77: the unigram model carries NO forced broadcast hint (only the " +
    "1-row total) — AQE still joins token rows map-side at this SF") {
    val df = graft.functions.TextOps.q77Surprisal(spark, sf0001)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1, df.queryExecution.analyzed.toString)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q78: collocations — per-row pair expansion (no doc-keyed self-join); " +
    "df lookups carry NO forced broadcast hint; top-20 is TakeOrdered") {
    val df = graft.functions.TextOps.q78Collocations(spark, sf0001)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1, df.queryExecution.analyzed.toString) // the 1-row n_docs only
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan) // pairs never self-join on doc
    assert(plan.contains("BroadcastHashJoin"), plan) // AQE's choice at this SF
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q79: transitions — ONE events scan; the probability window runs on " +
    "the aggregated grid, not raw events") {
    val plan = physical(TimeSeries.q79Transitions(spark, sf0001))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
  }

  test("q12: calendar side of densification is broadcast") {
    val plan = physical(TimeSeries.q12CalendarDensify(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q55/q56: per-row corpus ops plan no shuffle at all") {
    import graft.functions.TextOps
    Seq(TextOps.q55HashSplit(spark, sf0001), TextOps.q56Repetition(spark, sf0001))
      .foreach { df =>
        val plan = physical(df)
        assert(!plan.contains("Exchange"), plan)
      }
  }

  test("q10: one-pass set ops — no joins, one wide shuffle + trivial final agg") {
    val plan = physical(Relational.q10SetOps(spark, sf0001))
    // the old intersect/except form planned semi/anti joins over repeated
    // scans; the conditional-agg form must plan none
    assert(!plan.contains("Join"), plan)
    val wide = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val single = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(wide == 1 && single <= 1, s"wide=$wide single=$single\n$plan")
  }

  test("q84: curriculum quartiles plan NO per-doc ntile window — the windows run " +
    "on the (lang, n_tokens) aggregate, after the corpus collapses") {
    val plan = physical(graft.functions.CurationOps.q84Curriculum(spark, sf0001))
    assert(!plan.contains("ntile"), plan)
    // corpus-sized work is exactly one combiner-friendly aggregate shuffle +
    // the lang-keyed window/final shuffle on the collapsed table
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
  }

  test("q86: cross-source dups — ONE corpus scan, zero joins: pairs expand off " +
    "grouped per-fingerprint source sets") {
    val plan = physical(graft.functions.TextOps.q86CrossSourceDup(spark, sf0001))
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
  }

  test("q87: zipf ranking goes through the TopKPerGroup plan, not a sort window") {
    val plan = physical(graft.functions.TextOps.q87ZipfSlope(spark, sf0001))
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q89: corpus-mix windows run on the per-source aggregate (catalog-sized), " +
    "after ONE corpus scan collapses to source totals") {
    val plan = physical(graft.functions.CurationOps.q89CorpusMix(spark, sf0001))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
    // the single-partition window is fed by the aggregated source table,
    // never the corpus: the corpus-side aggregate must appear beneath it
    assert(plan.contains("Window"), plan)
  }

  test("q90: source drift — the (source, token) term-frequency exchange is built " +
    "once and REUSED by the totals/model/scalar branches: one corpus scan") {
    val df = graft.functions.TextOps.q90SourceDrift(spark, sf0001)
    df.collect() // reuse materializes in the final adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.linesIterator.count(_.contains("FileScan parquet")) == 1, finalPlan)
    assert(finalPlan.linesIterator.count(_.contains("ReusedExchange")) >= 2, finalPlan)
  }

  test("q94: EWMA runs ONE window pass over the daily aggregate — 14 lag terms " +
    "compile into a single Window operator, not 14") {
    val plan = physical(TimeSeries.q94Ewma(spark, sf0001))
    assert(plan.linesIterator.count(_.trim.startsWith("Window")) <= 2, plan)
    // the window input is the (type, day) aggregate, never raw events:
    // an aggregate must sit beneath the window
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q96: temperature mix — the rate table BROADCASTS back to the doc filter " +
    "(corpus rows meet it map-side), and the doc-level predicate is applied " +
    "inside that broadcast join, not after a shuffle") {
    val plan = physical(graft.functions.CurationOps.q96TemperatureMix(spark, sf0001))
    val filterJoin = plan.linesIterator.find(l =>
      l.contains("BroadcastHashJoin") && l.contains("keep_rate"))
    assert(filterJoin.nonEmpty, plan)
    // the only corpus-wide shuffles are combiner-friendly per-source
    // aggregates: every corpus-feeding exchange sits above a partial agg
    // (the catalog-sized rates⋈kept join may shuffle its 20 rows freely)
    assert(plan.contains("partial_sum"), plan)
  }

  test("q97: rolling distinct — both dedups are combiner-friendly aggregates " +
    "and the span side broadcasts (no corpus-to-corpus join)") {
    val plan = physical(TimeSeries.q97RollingDistinct(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q98: the bloom probe is a scan-side Filter BENEATH the rescore join " +
    "(corpus rows die before any exchange), and the eval side broadcasts") {
    val plan = physical(graft.functions.CurationOps.q98BloomDecontaminate(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the probe's bit test (element_at over the bitset literal) must
    // appear in a Filter, i.e. before the join, not as a post-join
    // predicate
    val probeFilter = plan.linesIterator.exists(l =>
      l.replaceFirst("^\\[info\\]", "").trim.matches("[:+\\- ]*Filter .*") &&
        l.contains("element_at("))
    assert(probeFilter, plan.linesIterator.filterNot(_.contains("element_at"))
      .mkString("\n"))
  }

  test("q99: the bigram model meets the corpus through BROADCAST joins only — " +
    "corpus-wide exchanges are all partial-agg'd (vocab top-K via " +
    "TakeOrderedAndProject, never a global sort)") {
    val plan = physical(graft.functions.TextOps.q99BigramPerplexity(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
  }

  test("q103: the ordered-wedge triangle join has no cartesian product and " +
    "counts aggregate with map-side partials") {
    val plan = physical(graft.functions.TextOps.q103Triangles(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
  }

  test("q104: both lead() terms ride ONE window pass and top-20 compiles to " +
    "TakeOrderedAndProject, never a global sort") {
    val plan = physical(TimeSeries.q104BehaviorTrigrams(spark, sf0001))
    assert(plan.linesIterator.count(_.trim.matches("[:+\\- ]*Window .*")) <= 1, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q32: the native simhash plans ZERO exchanges — the sketch is " +
    "computed inside the scan") {
    val plan = physical(graft.functions.TextOps.q32SimHash(spark, sf0001))
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("simhash_native"), plan)
  }

  test("q108: the column profiler is ONE aggregate pass — a single scan " +
    "feeding a partial agg; the per-column melt happens after it") {
    val plan = physical(graft.operators.Extended.q108ColumnProfile(spark, sf0001))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
    assert(plan.contains("partial"), plan)
  }

  test("q107: Q5-shape — date and region predicates push to their scans, " +
    "dimensions broadcast, revenue aggregates with map-side partials") {
    val plan = physical(Relational.q107LocalSupplierRevenue(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)") ||
      plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan)
  }

  test("q105: weighted sample compiles to TakeOrderedAndProject over a " +
    "per-row key projection — no shuffle, no window, no global sort") {
    val plan = physical(graft.functions.CurationOps.q105WeightedSample(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q106: correlation runs on the daily aggregate (events reduce first), " +
    "and the self-join side is broadcast") {
    val plan = physical(TimeSeries.q106MetricCorrelation(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // corr() must aggregate the joined DAILY table, not raw events: a
    // partial day-level aggregate sits beneath the join
    assert(plan.contains("partial_sum"), plan)
  }

  test("q111: the Gopher rule battery is pure per-row math — zero exchanges, " +
    "scan-speed at any corpus size") {
    val plan = physical(graft.functions.TextOps.q111GopherRules(spark, sf0001))
    assert(!plan.contains("Exchange"), plan)
  }

  test("q112: split leakage — ONE corpus scan, zero joins: pairs expand off " +
    "per-fingerprint split sets (q86's shape)") {
    val plan = physical(graft.functions.TextOps.q112SplitLeakage(spark, sf0001))
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
  }

  test("q114: classifier inference is pure per-row math — the 256-weight model " +
    "lives inside the row expression, zero exchanges") {
    val plan = physical(graft.functions.TextOps.q114QualityClassifier(spark, sf0001))
    assert(!plan.contains("Exchange"), plan)
  }

  test("q115: PSI — the corpus collapses ONCE to persisted (source × digit-bin) " +
    "counts; every downstream branch reads the in-memory table and the " +
    "grid/marginal/scalar joins all broadcast") {
    val plan = physical(graft.functions.TextOps.q115PsiDrift(spark, sf0001))
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("q113: hard negatives broadcast the query side — candidates never " +
    "shuffle; only k rows per query reach the rank window") {
    val plan = physical(graft.functions.VectorOps.q113HardNegatives(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("q100: each PageRank iteration is localCheckpoint-truncated (r21, " +
    "guide §5) — the FINAL plan joins the corpus to the checkpointed " +
    "last-iteration rank RDD and is ITERATION-DEPTH-FREE: no shingle/band " +
    "re-derivation, and its size stays bounded (the old per-iteration " +
    "persist nested 5 unrolled iterations into an ~11k-line plan whose " +
    "planning cost was its own tax)") {
    val df = graft.functions.TextOps.q100PageRank(spark, sf0001)
    val plan = physical(df)
    // the last iteration's output is a checkpointed RDD scan
    assert(plan.contains("Scan ExistingRDD"), plan)
    // lineage truncation removed the candidate chain from the final plan
    assert(!plan.contains("Generate"), plan)
    assert(plan.linesIterator.size < 500,
      s"q100 final plan grew past the r21 bound: ${plan.linesIterator.size} lines")
  }

  test("q121: the interval join keys on user_id equality — an equi join with " +
    "the time bound as post-filter, never a nested-loop over pure ranges") {
    val plan = physical(graft.operators.TimeSeries.q121IntervalJoin(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(plan.contains("Join"), plan)
  }

  test("q124: BPE pair counts run over the vocab (two combiner aggregations: " +
    "word freq, then pair freq) and the top-50 is TakeOrdered, not a global sort") {
    val plan = physical(graft.functions.TextOps.q124BpePairs(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected <=2 shuffles (word agg, pair agg):\n$plan")
    assert(plan.contains("partial"), plan) // map-side combine on both aggs
  }

  test("q125: the corpus fingerprint index probe is an equi join on fp — " +
    "no nested loop, and the md5 projection reaches both sides as scans") {
    val plan = physical(graft.functions.TextOps.q125IncrementalDedup(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("q126: the band-bucket index probe is an UNHINTED equi join — never a " +
    "nested loop, and free for AQE to broadcast a tiny arriving batch " +
    "(the previous merge hint forbade exactly that production shape)") {
    val plan = physical(graft.functions.TextOps.q126IncrementalNeardup(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    // equi-join strategies only: broadcast-hash, shuffled-hash or sort-merge
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
  }

  test("q128: both hybrid-retrieval candidate lists are TakeOrderedAndProject " +
    "top-50s (map-side partial top-k) — the corpus is never globally sorted, " +
    "and the query-term join side is broadcast") {
    val plan = physical(graft.functions.VectorOps.q128HybridRrf(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("q129: the frozen quantizer is BROADCAST to both the assignment and the " +
    "probe sides (k rows), and the cell join is an equi join — never a " +
    "cartesian of corpus × batch") {
    val plan = physical(graft.functions.VectorOps.q129IncrementalIvf(spark, sf0001))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q131: the perceptual-hash candidate join is an EQUI join on " +
    "(band, value) — never a nested-loop/cartesian all-pairs scan — and " +
    "the Hamming rescore filters BEFORE the distinct exchange") {
    val df = graft.multimodal.Multimodal.q131ImageNeardup(spark, sf0001)
    val plan = physical(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    // the distinct aggregate must sit above the hamming filter, so the
    // exchange only carries surviving pairs: optimized plan has the
    // Filter below the Aggregate (no Filter parent of Aggregate).
    val optimized = df.queryExecution.optimizedPlan.toString
    val aggIdx = optimized.indexOf("Aggregate")
    val filterIdx = optimized.indexOf("Filter")
    assert(aggIdx >= 0 && filterIdx > aggIdx,
      s"expected hamming Filter below the distinct Aggregate:\n$optimized")
  }

  test("probeExact: the maintained fp index is only ever SEMI-joined against " +
    "a broadcast batch — it never shuffles and is never the stream side of " +
    "an outer join (VERDICT r10 #1)") {
    import graft.sources.{DedupIndex, ManifestTable}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-probeplan").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val v1 = ManifestTable.merge(
      Seq(1L -> "alpha beta gamma delta", 2L -> "one two three four")
        .toDF("doc_id", "text"), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, s"$work/band", 0, v1)
    val probe = DedupIndex.probeExact(
      Seq(10L -> "alpha beta gamma delta", 11L -> "novel text here now")
        .toDF("doc_id", "text"), spark, fpIdx)
    val plan = physical(probe)
    // both joins broadcast the batch-bounded side; the index side never
    // plans a sort-merge join or a hash-partition exchange
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    // and the answer is still right
    val got = probe.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(10L -> true, 11L -> false), got.toString)
  }

  test("maintainedSplitLeakage (q200): the report never re-shingles the " +
    "corpus — its plan reads ONLY stored band rows (zero Generate/explode " +
    "operators; the shingle path is structurally absent) and both splits " +
    "are per-row hash math, never a corpus join") {
    import graft.sources.{DedupIndex, ManifestTable}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-leakplan").toString
    val corpus = s"$work/corpus"
    val band = s"$work/band"
    // two near-dup docs (shared shingles -> shared band bucket) plus an
    // unrelated one
    val v1 = ManifestTable.merge(
      Seq(1L -> "alpha beta gamma delta epsilon",
        2L -> "alpha beta gamma delta zeta",
        9L -> "one two three four five")
        .toDF("doc_id", "text"), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, s"$work/fp", band, 0, v1)
    val report = DedupIndex.maintainedSplitLeakage(spark, band)
    report.collect()
    val plan = physical(report)
    // Generate is the physical explode: any re-shingle would need one
    assert(!plan.contains("Generate"), plan)
    // the only scans are the band index's parquet, never the corpus
    assert(!plan.contains(corpus), plan)
  }

  test("maintainedKeySpaces (q202): the recall-cost report never touches " +
    "the corpus — its plan scans ONLY the two stored index tables (no " +
    "corpus path, no Generate: the fact generators are structurally " +
    "absent), so it is schedulable after every commit at index-read " +
    "cost") {
    import graft.sources.{DedupIndexFixtures, GainWindowIndex,
      ManifestTable, ReencodeIndex}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ksplan").toString
    val corpus = s"$work/corpus"
    // ids picked so both generators fire: 8/11 are the re-encode quad's
    // video pair (gid 2), 4/7 a gain-dup audio pair (gid 1)
    val v1 = ManifestTable.merge(
      Seq(8L -> 40L, 11L -> 40L, 4L -> 33L, 7L -> 33L)
        .toDF("doc_id", "n_chars")
        .selectExpr("doc_id", "repeat('x', CAST(n_chars AS INT)) AS text"),
      corpus, Seq("doc_id"))
    ReencodeIndex.refresh(spark, corpus, s"$work/reenc", 0, v1)
    GainWindowIndex.refresh(spark, corpus, s"$work/gwin", 0, v1)
    val report = DedupIndexFixtures.maintainedKeySpaces(
      spark, s"$work/reenc", s"$work/gwin")
    val rows = report.collect()
    assert(rows.length == 2 && rows.forall(_.getLong(2) > 0), rows.mkString)
    val plan = physical(report)
    assert(!plan.contains("Generate"), plan)
    assert(!plan.contains(corpus), plan)
    assert(plan.contains(s"$work/reenc") && plan.contains(s"$work/gwin"), plan)
  }

  test("probeModality: the maintained band index joins the batch-sized " +
    "probe by BROADCAST — the index side never sort-merges and never " +
    "plans a hash-partition exchange (at 100 TB the index is the big " +
    "side; a shuffle there is a full-index rewrite per probe)") {
    import graft.sources.{ManifestTable, ModalityIndex}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-modplan").toString
    val corpus = s"$work/corpus"
    val idx = s"$work/media"
    // doc 0/6: images; 4/16: audio (distinct gids)
    val v1 = ManifestTable.merge(
      Seq(0L -> 10L, 4L -> 12L, 6L -> 25L, 16L -> 9L)
        .toDF("doc_id", "n_chars")
        .selectExpr("doc_id", "repeat('x', CAST(n_chars AS INT)) AS text"),
      corpus, Seq("doc_id"))
    ModalityIndex.refresh(spark, corpus, idx, 0, v1)
    val probe = ModalityIndex.probeModality(
      Seq(30L -> 10L, 31L -> 12L).toDF("doc_id", "n_chars"), spark, idx)
    // assert on the FINAL adaptive plan (execute first): the hot-band
    // cap's hot-list anti-join sizes only at runtime — forcing a
    // broadcast hint there would be the q83 OOM trap on an adversarial
    // corpus, so the claim is "AQE lands every join broadcast", not a
    // static hint
    probe.collect()
    val plan = physical(probe)
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("probeScenes / probeTrims: the maintained scene and audio-window " +
    "indexes join their batch-sized probes by BROADCAST in the final " +
    "adaptive plan — the index side never sort-merges (at 100 TB the " +
    "index is the big side; a shuffle there is a full-index rewrite " +
    "per probe)") {
    import graft.sources.{AudioWindowIndex, ManifestTable, SceneIndex}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-sceneplan").toString
    val corpus = s"$work/corpus"
    // docs 2/8/11: videos (8 and 11 share gid 2); 4/7: audio (gid 1)
    val v1 = ManifestTable.merge(
      Seq(2L -> 10L, 8L -> 9L, 11L -> 12L, 4L -> 12L, 7L -> 20L)
        .toDF("doc_id", "n_chars")
        .selectExpr("doc_id", "repeat('x', CAST(n_chars AS INT)) AS text"),
      corpus, Seq("doc_id"))
    val (sceneIdx, awinIdx) = (s"$work/scene", s"$work/awin")
    SceneIndex.refresh(spark, corpus, sceneIdx, 0, v1)
    AudioWindowIndex.refresh(spark, corpus, awinIdx, 0, v1)
    val sp = SceneIndex.probeScenes(
      Seq(20L -> 10L).toDF("doc_id", "n_chars"), spark, sceneIdx)
    sp.collect()
    val splan = physical(sp)
    assert(splan.contains("isFinalPlan=true"), splan)
    assert(!splan.contains("SortMergeJoin"), splan)
    val tp = AudioWindowIndex.probeTrims(
      Seq(19L -> 10L).toDF("doc_id", "n_chars"), spark, awinIdx)
    tp.collect()
    val tplan = physical(tp)
    assert(tplan.contains("isFinalPlan=true"), tplan)
    assert(!tplan.contains("SortMergeJoin"), tplan)
  }

  test("probeReencodes / probeGains: the maintained ROBUST indexes join " +
    "their batch-sized probes by BROADCAST in the final adaptive plan — " +
    "the index side never sort-merges (the same 100 TB claim as the " +
    "exact faces)") {
    import graft.sources.{GainWindowIndex, ManifestTable, ReencodeIndex}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-robustplan").toString
    val corpus = s"$work/corpus"
    // docs 8/11: re-encode pair (gid 2); 4/7: gain pair (gid 1)
    val v1 = ManifestTable.merge(
      Seq(8L -> 9L, 11L -> 12L, 4L -> 12L, 7L -> 20L)
        .toDF("doc_id", "n_chars")
        .selectExpr("doc_id", "repeat('x', CAST(n_chars AS INT)) AS text"),
      corpus, Seq("doc_id"))
    val (reencIdx, gwinIdx) = (s"$work/reenc", s"$work/gwin")
    ReencodeIndex.refresh(spark, corpus, reencIdx, 0, v1)
    GainWindowIndex.refresh(spark, corpus, gwinIdx, 0, v1)
    val rp = ReencodeIndex.probeReencodes(
      Seq(20L -> 10L).toDF("doc_id", "n_chars"), spark, reencIdx)
    rp.collect()
    val rplan = physical(rp)
    assert(rplan.contains("isFinalPlan=true"), rplan)
    assert(!rplan.contains("SortMergeJoin"), rplan)
    val gp = GainWindowIndex.probeGains(
      Seq(19L -> 10L).toDF("doc_id", "n_chars"), spark, gwinIdx)
    gp.collect()
    val gplan = physical(gp)
    assert(gplan.contains("isFinalPlan=true"), gplan)
    assert(!gplan.contains("SortMergeJoin"), gplan)
  }

  test("q146 probe: the vocab-table side never plans a hash-partition " +
    "exchange or sort-merge join — batch tf broadcasts into the pruned " +
    "df read, and the 1-row corpus size broadcasts") {
    import graft.sources.{DfIndex, ManifestTable}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-dfplan").toString
    val corpus = s"$work/corpus"
    val idx = s"$work/df"
    val v1 = ManifestTable.merge(
      Seq(1L -> "alpha beta gamma delta", 2L -> "one two three four")
        .toDF("doc_id", "text"), corpus, Seq("doc_id"))
    DfIndex.refresh(spark, corpus, idx, 0, v1)
    val probe = DfIndex.probeTfIdf(
      Seq(10L -> "alpha beta unseen").toDF("doc_id", "text"), spark, idx)
    val plan = physical(probe)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // every hash exchange is BATCH-sized: the tf aggregation, the
    // top-k per-doc regroup, and the prune-key collection — the vocab
    // scan itself feeds the broadcast join directly and contributes
    // none (an index-side exchange would show up as a 4th)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 3, s"unexpected extra exchange (index side?), got $hashEx:\n$plan")
    // correctness: unseen token dropped, shared tokens scored
    val got = probe.collect().map(r => (r.getString(1), r.getLong(4))).toSet
    assert(got.nonEmpty && got.forall(_._1 != "unseen"), got.toString)
  }

  test("bucketed index layout is PLANNER-VISIBLE (VERDICT r10 #3): a " +
    "groupBy(fp) over the stored fp index plans ZERO exchanges (bucketed " +
    "scan), and auditFpIndex's full-outer join shuffles ONLY the recomputed " +
    "side — the index side consumes its stored HashPartitioning") {
    import graft.sources.{DedupIndex, ManifestTable}
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-bucketplan").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val docs = (1L to 40L).map(i => (i, s"doc number $i alpha beta gamma"))
      .toDF("doc_id", "text")
    val v1 = ManifestTable.merge(docs, corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, s"$work/band", 0, v1)
    // second merge: multi-generation files must STAY bucket-named
    val v2 = ManifestTable.merge(
      Seq((100L, "late arrival delta epsilon zeta")).toDF("doc_id", "text"),
      corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, s"$work/band", v1, v2)

    val stored = DedupIndex.readFpIndexStored(spark, fpIdx)
    // parity first: the bucketed relation returns exactly the plain read
    assert(stored.collect().map(_.toSeq.toVector).toSet ==
      DedupIndex.readFpIndex(spark, fpIdx).collect().map(_.toSeq.toVector).toSet)

    val agg = stored.groupBy($"fp").count()
    val aggPlan = physical(agg)
    assert(aggPlan.contains("Bucketed: true"), aggPlan)
    assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan)

    // bucket PRUNING rides the same spec: a point lookup on fp hashes
    // the literal to its bucket and opens 1/16 of the index. Spark's
    // autoBucketedScan turns bucketing OFF for plans with no exchange
    // to save, so the pruning pin sets it explicitly (what a production
    // point-lookup job does)
    withSQLConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val one = stored.where($"fp" === org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.lit("doc number 7 alpha beta gamma")))
      val onePlan = physical(one)
      assert(onePlan.contains("SelectedBucketsCount: 1 out of 16"), onePlan)
      assert(one.count() == 1L)
    }

    // the audit join: force SMJ (no broadcast) so the exchange count is
    // deterministic — exactly ONE, on the recomputed side
    // shuffle.partitions = bucket count, or the recomputed side pays a
    // second exchange just to re-split 4 → 16 (layout-irrelevant noise)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "16") {
      val audit = DedupIndex.auditFpIndex(
        ManifestTable.read(spark, corpus), spark, fpIdx)
      val plan = physical(audit)
      assert(plan.contains("Bucketed: true"), plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected ONE exchange (recomputed side only), got $exchanges:\n$plan")
      assert(audit.count() == 0L, "a freshly maintained index must audit clean")
    }
  }

  test("q134: the DSIR importance model meets the token matrix ONLY through " +
    "broadcast joins (256 rows + 1 scalar, bounded by construction) — no " +
    "vocabulary-sized shuffle join, no cartesian") {
    val plan = physical(graft.functions.CurationOps.q134DsirWeights(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // scoring join (tokens ⋈ model) must be broadcast-hash, never a
    // sort-merge over the exploded token matrix
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q139: the covariance is ONE aggregation pass — a single Exchange " +
    "(the singleton gather of ~17 KB partial buffers), no join of any kind") {
    val plan = physical(VectorOps.q139EmbeddingCovariance(spark, sf0001))
    // the typed Aggregator plans as a two-phase ObjectHashAggregate
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected ONE exchange (partial → final), got $exchanges:\n$plan")
    assert(!plan.contains("Join"), plan) // d² rides the buffer, not a dims join
  }

  test("q143: the projection pass is MAP-ONLY — the direction and means " +
    "ride as broadcast literals, so the whitening plan has no exchange, " +
    "no join, and no aggregation at all") {
    val plan = physical(VectorOps.q143WhitenTopComponent(spark, sf0001))
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Aggregate"), plan)
    // the dot-product projections stay in codegen stages (the `*(n)`
    // markers); only the zip_with centering is a non-codegen Project
    // (higher-order functions don't codegen — a single map, not a hot agg)
    assert(plan.contains("*("), plan)
  }

  test("q140: the pair match is an EQUI join on the derived pair key — " +
    "never a nested-loop/cartesian — and the width aggregation is partial " +
    "before its exchange") {
    val plan = physical(VectorOps.q140MatryoshkaFidelity(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial"), plan) // 3-group collapse starts map-side
  }

  test("q153: the eval side rides a BROADCAST into the train crossJoin and " +
    "the per-train argmax is partial — the one exchange carries one row per " +
    "train vector, never the x|eval| pair expansion") {
    val plan = physical(VectorOps.q153SemanticDecon(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_max") || plan.contains("partial"), plan)
    // exactly one hash exchange: the final per-train-vec aggregation
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
  }
}
