package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's stdout contract (VERDICT r12 #3): the FINAL line the
  * driver parses from its ~2,048-byte tail buffer must stay comfortably
  * inside it AT THE LIVE QUERY COUNT — BENCH_r12 was lost ("parsed:
  * null") when the per-query map grew the line to 2,115 bytes at 151
  * queries. The per-query detail now rides its own PRECEDING line; this
  * spec fails if anyone moves it back or grows the totals line. */
class BenchLineSpec extends AnyFunSuite {

  private val liveNames = SparkEntry.queries.keys.toSeq.sorted
  private val sequential = liveNames.map(n => (n, 888.888, true))
  private val views = Seq("tokens_x", "shingles_raw", "shingles_capped",
    "shingles_distinct", "candidates", "components", "winnowed",
    "normed_embeddings", "window_positions", "doc_freq")
    .map(v => (v, 888.888))

  test("the FINAL stdout line stays under 1,900 bytes at the live query " +
    "count (it must not scale with the suite)") {
    val line = Bench.finalLine(9999.999, 99999.999, 9.999, 9.999, Nil,
      "/root/testdata/sf0.1", Seq(9.999, 9.999, 9.999))
    assert(line.length < 1900, s"final line is ${line.length} bytes")
    // and it is one valid-looking JSON object on one line
    assert(!line.contains("\n") && line.startsWith("{") && line.endsWith("}"))
    // the driver's contract fields are all present
    Seq("\"metric\":", "\"value\":", "\"unit\":", "\"seq_total\":",
      "\"views_total\":", "\"wall_plus_views\":",
      "\"cal\":", "\"cal_io\":", "\"cal_io_basis\":", "\"basis_source\":",
      "\"attempts\":", "\"contended\":", "\"wall_per_cal\":",
      "\"failures\":", "\"sf\":", "\"method\":").foreach(k =>
      assert(line.contains(k), s"final line missing $k"))
    // the attempts array is bounded (max attempts, default 3), so the
    // line cannot grow with retries beyond it
    assert(line.contains("\"attempts\":[9.999,9.999,9.999]"))
  }

  test("the auto-retry keeps the FIRST clean attempt, else the " +
    "least-contended one (VERDICT r18 #2), and the basis provenance " +
    "rides the line") {
    val basis = Bench.CalIoCleanBasis
    // first attempt clean: kept (the loop would not even retry)
    assert(Bench.chosenAttempt(Seq(basis)) == 0)
    // contended, then clean: the clean one is kept
    assert(Bench.chosenAttempt(Seq(basis * 1.5, basis * 1.05)) == 1)
    // never clean: the lowest-cal_io attempt is kept
    assert(Bench.chosenAttempt(Seq(basis * 1.5, basis * 1.9, basis * 1.3)) == 2)
    // without an env override the basis is the pinned per-box floor
    assert(Bench.CalIoBasisSource == "pinned" || sys.env.contains("SPARK_GRAFT_CAL_IO_BASIS"))
    val line = Bench.finalLine(1.0, 2.0, 0.8, basis, Nil, "sf", Seq(basis))
    assert(line.contains(s""""cal_io_basis":$basis"""))
    assert(line.contains(s""""basis_source":"${Bench.CalIoBasisSource}""""))
  }

  test("a malformed SPARK_GRAFT_CAL_IO_BASIS falls back to the pin " +
    "instead of killing the run at object init (ADVICE r19): only a " +
    "positive number is accepted as an override") {
    assert(Bench.parseCalIoBasis(None).isEmpty)
    assert(Bench.parseCalIoBasis(Some("")).isEmpty)
    assert(Bench.parseCalIoBasis(Some("1,2")).isEmpty)
    assert(Bench.parseCalIoBasis(Some("abc")).isEmpty)
    assert(Bench.parseCalIoBasis(Some("-1.5")).isEmpty)
    assert(Bench.parseCalIoBasis(Some("0")).isEmpty)
    assert(Bench.parseCalIoBasis(Some("NaN")).isEmpty)
    assert(Bench.parseCalIoBasis(Some(" 1.25 ")).contains(1.25))
    assert(Bench.parseCalIoBasis(Some("1.126")).contains(1.126))
  }

  test("the contended flag classifies the window from the line alone " +
    "(VERDICT r17 #2): cal_io at the pinned clean basis reads false, " +
    "cal_io >15% over it reads true") {
    val clean = Bench.finalLine(1.0, 2.0, 0.8, Bench.CalIoCleanBasis, Nil, "sf")
    assert(clean.contains("\"contended\":false"))
    val hot = Bench.finalLine(1.0, 2.0, 0.8,
      Bench.CalIoCleanBasis * Bench.ContendedTolerance * 1.01, Nil, "sf")
    assert(hot.contains("\"contended\":true"))
    // every contended window recorded in rounds 16-17 clears the gate;
    // the round's cleaner records stay under it
    Seq(1.391, 1.421, 1.578).foreach(v => assert(Bench.contended(v), s"$v"))
    Seq(1.126, 1.194, 1.268, 1.282).foreach(v =>
      assert(!Bench.contended(v), s"$v"))
  }

  test("the final line does not carry the per-query map (that detail " +
    "lives on the preceding line, which covers every live query)") {
    val fin = Bench.finalLine(1.0, 2.0, 1.0, 1.0, Nil, "sf")
    assert(!fin.contains("\"queries\""))
    val detail = Bench.detailLine(sequential, views)
    assert(!detail.contains("\n") && detail.startsWith("{") && detail.endsWith("}"))
    // every live query appears under its shortened (or full) key
    val shortKeys = liveNames.map(_.takeWhile(_ != '_'))
    val keys = if (shortKeys.distinct.size == shortKeys.size) shortKeys else liveNames
    keys.foreach(k => assert(detail.contains("\"" + k + "\":"),
      s"detail line missing $k"))
  }

  test("the final line stays under 1,900 bytes even when EVERY live query " +
    "fails — the mass-failure case is exactly when parsing it matters " +
    "(ADVICE r13: the failures array must not scale with the suite)") {
    val line = Bench.finalLine(9999.999, 99999.999, 9.999, 9.999, liveNames,
      "/root/testdata/sf0.1")
    assert(line.length < 1900, s"mass-failure final line is ${line.length} bytes")
    assert(line.contains(s"+${liveNames.size - Bench.MaxFailureNames} more"),
      "capped failures field missing its +N-more marker")
    // the first capped names are present verbatim
    liveNames.take(Bench.MaxFailureNames).foreach(n =>
      assert(line.contains("\"" + n + "\""), s"missing failure name $n"))
  }

  test("the PRECEDING detail line always carries the queries AND views " +
    "maps (VERDICT r20 #7: round 19's record lost its per-query map to a " +
    "format drift and PERF recorded n_common: 0 — this pin keeps the " +
    "driver's round-over-round comparison fed), and the FINAL line " +
    "charges the views honestly (VERDICT r20 #8: views_total + " +
    "wall_plus_views = value + views_total, so the headline cannot " +
    "silently improve by relocating query work into the untimed views)") {
    val detail = Bench.detailLine(sequential, views)
    assert(detail.contains("\"queries\":{"), "detail line lost its queries map")
    assert(detail.contains("\"views\":{"), "detail line lost its views map")
    // each map is non-empty at the live suite shape
    views.foreach { case (v, _) =>
      assert(detail.contains("\"" + v + "\":"), s"detail line missing view $v") }
    val fin = Bench.finalLine(10.0, 50.0, 1.0, 1.0, Nil, "sf",
      Seq(1.0), viewsTotal = 21.5)
    assert(fin.contains("\"views_total\":21.500"))
    assert(fin.contains("\"wall_plus_views\":31.500"))
  }

  test("qNN key shortening is injective over the live suite (a collision " +
    "would silently merge two queries' timings)") {
    val shortKeys = liveNames.map(_.takeWhile(_ != '_'))
    assert(shortKeys.distinct.size == shortKeys.size,
      s"colliding short keys: ${shortKeys.diff(shortKeys.distinct).distinct.mkString(",")}")
  }
}
