package graft

import graft.operators.Extended
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Extended operator semantics: approx-agg error bounds, pivot/melt
  * round-trip, mapGroupsWithState running state. */
class ExtendedSpec extends SparkSpec {

  test("q158 SCD2 history: per customer the version chain is gap-free " +
    "(valid_to(i) = valid_from(i+1), contiguous version numbers, exactly " +
    "one open current version), consecutive versions always CHANGE the " +
    "attribute, and the change points equal a driver-side recompute") {
    import spark.implicits._
    val hist = operators.TimeSeries.q158Scd2History(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4), r.getBoolean(5)))
    val orders = Tables(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderpriority", $"o_orderdate".cast("string"),
        $"o_orderkey")
      .as[(Long, String, String, Long)].collect()
    val expected = orders.groupBy(_._1).flatMap { case (cust, os) =>
      val seq = os.sortBy(o => (o._3, o._4))
      val chg = seq.zipWithIndex.filter { case (o, i) =>
        i == 0 || o._2 != seq(i - 1)._2 }.map(_._1)
      chg.zipWithIndex.toSeq.map { case (o, i) =>
        val to = if (i + 1 < chg.length) Some(chg(i + 1)._3) else None
        (cust, o._2, o._3, to, (i + 1).toLong, to.isEmpty)
      }
    }.toSet
    assert(hist.toSet == expected,
      s"got-only: ${(hist.toSet -- expected).take(3)}; " +
        s"expected-only: ${(expected -- hist.toSet).take(3)}")
    hist.groupBy(_._1).foreach { case (cust, vs) =>
      val chain = vs.sortBy(_._5)
      assert(chain.map(_._5).toSeq == (1L to chain.length).toSeq, s"$cust versions")
      assert(chain.count(_._6) == 1, s"$cust currents")
      assert(chain.last._6 && chain.last._4.isEmpty, s"$cust open tail")
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"$cust gap: ${a._4} vs ${b._3}")
          assert(a._2 != b._2, s"$cust consecutive versions share priority")
        case _ =>
      }
    }
  }

  test("q159 FD audit: key FDs hold with zero violations, dirty FDs are " +
    "flagged with a positive rate, and one FD's numbers equal a driver-side " +
    "recompute") {
    import spark.implicits._
    val rows = Extended.q159FdAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.length == Extended.FdCandidates.length)
    val byFd = rows.map(t => (t._1, t._2, t._3) -> t).toMap
    Seq(("orders", "o_orderkey", "o_custkey"), ("part", "p_partkey", "p_name"))
      .foreach { fd =>
        val r = byFd(fd)
        assert(r._8 && r._5 == 0L && r._6 == 1L && r._7 == 0.0, s"$fd should hold: $r")
      }
    Seq(("orders", "o_custkey", "o_orderpriority"), ("part", "p_name", "p_brand"))
      .foreach { fd =>
        val r = byFd(fd)
        assert(!r._8 && r._5 > 0L && r._6 > 1L && r._7 > 0.0, s"$fd should break: $r")
      }
    val nameBrand = Tables(spark, sf0001, "part")
      .select($"p_name", $"p_brand").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length).toMap
    val r = byFd(("part", "p_name", "p_brand"))
    assert(r._4 == nameBrand.size)
    assert(r._5 == nameBrand.values.count(_ > 1))
    assert(r._6 == nameBrand.values.max.toLong)
  }

  test("q160 RI audit: the shipped fixture is referentially intact on every " +
    "declared FK (zero orphans), a deliberately-dirty pair is counted " +
    "exactly (rows, distinct keys, rate, verdict), and each FK costs ONE " +
    "child pass (single equi-join, never a nested loop)") {
    import spark.implicits._
    val rows = Extended.q160RiAudit(spark, sf0001).collect()
    assert(rows.length == Extended.FkCandidates.length)
    rows.foreach { r =>
      assert(r.getBoolean(8), s"fixture FK broken: $r")
      assert(r.getLong(5) == 0L && r.getLong(6) == 0L && r.getDouble(7) == 0.0)
      assert(r.getLong(4) > 0L)
    }
    // dirty pair: 10 child rows, 4 orphan rows over 2 orphan key values
    val child = Seq(1L, 1L, 2L, 3L, 3L, 3L, 7L, 7L, 8L, 8L).toDF("ck")
    val parent = Seq(1L, 2L, 3L, 9L).toDF("pk")
    val dirty = Extended.riAuditOne(child, "ck", parent, "pk", "c", "p").collect().head
    assert(dirty.getLong(4) == 10L && dirty.getLong(5) == 4L && dirty.getLong(6) == 2L)
    assert(dirty.getDouble(7) == 0.4 && !dirty.getBoolean(8))
    val plan = Extended.q160RiAudit(spark, sf0001)
      .queryExecution.executedPlan.toString
    // r20: the orphan probe is a LEFT join + one conditional aggregate
    // (one child pass per FK — the old anti-join shape scanned the child
    // twice for the separate totals count); still an equi join, never a
    // nested loop, and exactly one join per declared FK.
    // match the JOIN OPERATOR line, not the bare word (ADVICE r20: any
    // other operator mentioning LeftOuter — a nested-loop fallback, a
    // condition rendering — must not satisfy or break this count)
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) [^\\n]*LeftOuter".r
      .findAllIn(plan).length == Extended.FkCandidates.length, plan.take(1500))
    assert(!plan.contains("LeftAnti"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("q158's two window passes share ONE natural-key shuffle: the physical " +
    "plan has exactly one Exchange over the orders scan (change-point filter " +
    "and versioning reuse the same (custkey; date, orderkey) ordering)") {
    val plan = operators.TimeSeries.q158Scd2History(spark, sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, plan.take(2000))
    // and the second window adds no second sort — same ordering reused
    assert("\\+- Sort ".r.findAllIn(plan).length == 1, plan.take(2000))
  }

  test("q41 approx_count_distinct stays within 5% of exact at sf0.001") {
    import spark.implicits._
    val approx = Extended.q41ApproxAggs(spark, sf0001)
      .select($"l_returnflag", $"approx_orders").as[(String, Long)].collect().toMap
    val exact = Tables(spark, sf0001, "lineitem")
      .groupBy($"l_returnflag").agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("pivot is the inverse of melt: unpivoting q38's output restores daily totals") {
    import spark.implicits._
    val wide = Extended.q38Pivot(spark, sf0001)
    val long = wide.selectExpr("day",
      """stack(5, 'click', click, 'error', error, 'purchase', purchase,
               'signup', signup, 'view', view) AS (event_type, total)""")
      .where($"total".isNotNull)
    val direct = Tables(spark, sf0001, "events")
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(sum($"value").as("total"))
    assert(long.except(direct).count() === 0)
    assert(direct.except(long).count() === 0)
  }

  test("mapGroupsWithState accumulates per-user stats across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stats = EventStream.runningUserStats(
      mem.toDF().toDF("user_id", "ts", "value"))
    val q = stats.toDF().writeStream.format("memory")
      .queryName("user_stats").outputMode("update").start()
    mem.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 5.0))
    q.processAllAvailable()
    mem.addData(
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), 7.0),
      (2L, Timestamp.valueOf("2024-01-01 11:30:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends each update; take the LAST per user
    val last = spark.table("user_stats")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"total_value", $"last_seen_epoch")).as("s"))
      .select($"user_id", $"s.n_events", $"s.total_value")
      .as[(Long, Long, Double)].collect().map { case (k, n, v) => k -> ((n, v)) }.toMap
    assert(last(1L) === ((2L, 12.0)))
    assert(last(2L) === ((1L, 1.0)))
  }

  test("q73: z-scores match a hand-computed per-type distribution and the " +
    "anomaly flag is exactly |z| > 2") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = operators.TimeSeries.q73DailyAnomaly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty)
    // flag is a pure function of z
    assert(out.forall { case (_, _, _, z, f) => (math.abs(z) > 2.0) == (f == 1L) })
    // recompute one event_type's stats from the raw daily totals
    val et = out.head._1
    val daily = Tables(spark, sf0001, "events")
      .where($"event_type" === et)
      .groupBy(to_date($"ts").as("day")).agg(sum($"value").as("total"))
      .collect().map(r => r.getDate(0) -> r.getDouble(1)).toMap
    val mu = daily.values.sum / daily.size
    val sd = math.sqrt(daily.values.map(v => (v - mu) * (v - mu)).sum / (daily.size - 1))
    out.filter(_._1 == et).foreach { case (_, day, _, z, _) =>
      val expected = (daily(day) - mu) / sd
      assert(math.abs(z - expected) < 5e-4, s"$day: $z vs $expected")
    }
  }

  test("q76: histogram bins partition all events — counts sum to the table " +
    "size, bins stay in [0,19], widths are uniform") {
    val out = operators.Extended.q76Histogram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val total = Tables(spark, sf0001, "events").count()
    assert(out.map(_._5).sum == total)
    assert(out.forall { case (_, bin, lo, hi, n) => bin >= 0 && bin <= 19 && hi > lo && n > 0 })
    val widths = out.map(t => math.rint((t._4 - t._3) * 1e4) / 1e4).distinct
    assert(widths.size == 1, widths.mkString(","))
  }

  test("q76: degenerate input (all values equal, hi == lo) lands every row in " +
    "bin 0 instead of diverging on floor(NaN)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hist").toString
    Seq(("a", 5.0, 1L), ("a", 5.0, 2L), ("b", 5.0, 3L))
      .toDF("event_type", "value", "ts")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.Extended.q76Histogram(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(out.toSet == Set(("a", 0L, 5.0, 5.0, 2L), ("b", 0L, 5.0, 5.0, 1L)))
  }

  test("q101: median/MAD outliers — hand values; MAD=0 (constant group) " +
    "flags nothing instead of dividing by the degenerate scale") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    // type a: med 3.5, adev sorted [.5,.5,1.5,1.5,2.5,96.5] -> mad 1.5,
    //         threshold 4.4478*1.5 = 6.6717 -> only 100 is an outlier
    // type b: constant -> mad 0 -> |v-med| > 0 never true
    ((1 to 5).map(i => ("a", i.toDouble, i.toLong)) ++ Seq(("a", 100.0, 6L)) ++
      Seq(("b", 7.0, 7L), ("b", 7.0, 8L), ("b", 7.0, 9L)))
      .toDF("event_type", "value", "ts")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.TimeSeries.q101MadOutliers(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("a") == ((6L, 3.5, 1.5, 1L, 0.166667)), s"got $out")
    assert(out("b") == ((3L, 7.0, 0.0, 0L, 0.0)), s"got $out")
  }

  test("q106: correlation matrix — hand series give r = +1 / -1, each " +
    "unordered type pair appears once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corr").toString
    // daily totals: A = [1,2,3], B = [2,4,6] (r=1), C = [3,2,1] (r=-1 vs both)
    val day = (d: Int) => d * 86400000000000L // distinct days (ns)
    Seq(
      ("A", 1.0, day(1)), ("A", 2.0, day(2)), ("A", 3.0, day(3)),
      ("B", 2.0, day(1)), ("B", 4.0, day(2)), ("B", 6.0, day(3)),
      ("C", 3.0, day(1)), ("C", 2.0, day(2)), ("C", 1.0, day(3)))
      .toDF("event_type", "value", "ts")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.TimeSeries.q106MetricCorrelation(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("A", "B") -> ((3L, 1.0)),
      ("A", "C") -> ((3L, -1.0)),
      ("B", "C") -> ((3L, -1.0))), s"got $out")
  }

  test("q109: last-touch attribution — credits the latest preceding " +
    "non-purchase within 1h, stale and absent touches fall to 'direct'") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    def t(hm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00").getTime * 1000000L
    Seq(
      (1L, "view",     t("10:00"), 1L),
      (1L, "purchase", t("10:30"), 2L),  // within 1h of view -> view
      (1L, "purchase", t("12:30"), 3L),  // last touch 2.5h stale -> direct
      (2L, "purchase", t("09:00"), 4L),  // nothing precedes -> direct
      (2L, "click",    t("09:30"), 5L),
      (2L, "purchase", t("09:45"), 6L))  // click
      .toDF("user_id", "event_type", "ts", "event_id")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.TimeSeries.q109Attribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(
      "view" -> ((1L, 0.25)), "click" -> ((1L, 0.25)), "direct" -> ((2L, 0.5))),
      s"got $out")
  }

  test("q104: behavior trigrams — overlapping windows per user, no " +
    "cross-user trigrams, counts exact on a hand timeline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-trigram").toString
    // user 1: A B C D -> ABC, BCD; user 2: A B C -> ABC; user 3: X Y (none)
    Seq(
      (1L, "A", 1L, 10L), (1L, "B", 2L, 11L), (1L, "C", 3L, 12L), (1L, "D", 4L, 13L),
      (2L, "A", 5L, 20L), (2L, "B", 6L, 21L), (2L, "C", 7L, 22L),
      (3L, "X", 8L, 30L), (3L, "Y", 9L, 31L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.TimeSeries.q104BehaviorTrigrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(out == Map(("A", "B", "C") -> 2L, ("B", "C", "D") -> 1L), s"got $out")
  }

  test("q79: transition probabilities sum to 1 per from_type and counts " +
    "cover every consecutive pair") {
    val out = operators.TimeSeries.q79Transitions(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (from, rows) =>
      val psum = rows.map(_._4).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$from: $psum")
    }
    // total transitions = total events - number of users (one less pair per user)
    val ev = Tables(spark, sf0001, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(out.map(_._3).sum == expected)
  }

  test("geometric mean Aggregator matches exp(avg(ln)) and skips non-positives") {
    import spark.implicits._
    val df = Seq(1.0, 10.0, 100.0, -5.0, 0.0).toDF("x")
    val got = df.agg(graft.functions.TypedAggregators.geometricMean($"x")).collect().head.getDouble(0)
    assert(math.abs(got - 10.0) < 1e-9) // geo-mean of 1,10,100; -5 and 0 skipped
  }

  test("q92: event-type entropy — single-type users score 0, a uniform two-type " +
    "mix scores ln 2, skewed mixes land strictly between") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-entropy").toString
    (Seq((1L, "click"), (1L, "click"), (1L, "click"),
         (2L, "click"), (2L, "view"),
         (3L, "click"), (3L, "click"), (3L, "click"), (3L, "view")))
      .map { case (u, t) => (u, t, 1.0, 1L) }
      .toDF("user_id", "event_type", "value", "ts")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.TimeSeries.q92UserEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 0.0)))
    assert(out(2L)._1 == 2L && math.abs(out(2L)._2 - math.log(2)) < 1e-6)
    assert(out(3L)._1 == 4L && out(3L)._2 > 0.0 && out(3L)._2 < math.log(2))
  }

  test("q97: rolling 7-day distinct users — same-day and within-window repeats " +
    "count once, gap days served by earlier activity appear, days beyond the " +
    "span don't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rolling").toString
    def nanos(day: Int): Long = {
      val d = java.time.LocalDate.of(2024, 1, day)
      d.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L
    }
    // u1: d1 + d10; u2: d1 (twice — same day dedups); u3: d1 + d3
    // (overlapping windows dedup)
    Seq((1L, nanos(1)), (1L, nanos(10)), (2L, nanos(1)), (2L, nanos(1)),
        (3L, nanos(1)), (3L, nanos(3)))
      .map { case (u, t) => (u, t, "click", 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.TimeSeries.q97RollingDistinct(spark, dir).collect()
      .map(r => r.getDate(0).toLocalDate.getDayOfMonth -> r.getLong(1)).toMap
    val expected = Map(
      1 -> 3L, 2 -> 3L,            // u1,u2,u3 from d1
      3 -> 3L, 4 -> 3L, 5 -> 3L, 6 -> 3L, 7 -> 3L, // u3's d3 window overlaps, dedups
      8 -> 1L, 9 -> 1L,            // only u3's d3 activity still serves
      10 -> 1L)                    // u1's d10; d11+ outside the span
    assert(out == expected, s"got $out")
  }

  test("q94: EWMA matches an independent reimplementation of the truncated " +
    "normalized kernel, stays inside the window's value range, and equals " +
    "the raw value on each series' first point") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = operators.TimeSeries.q94Ewma(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val byType = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    byType.foreach { case (et, series) =>
      // independent kernel: plain Scala over the collected daily series
      val xs = series.map(_._3)
      series.zipWithIndex.foreach { case ((_, day, _, ewma), i) =>
        val window = xs.slice(math.max(0, i - 13), i + 1).reverse // x_i, x_{i-1}, ...
        val num = window.zipWithIndex.map { case (x, k) => x * math.pow(0.5, k) }.sum
        val den = window.indices.map(k => math.pow(0.5, k)).sum
        val expected = num / den
        assert(math.abs(ewma - expected) < 5e-4, s"$et $day: $ewma vs $expected")
        assert(ewma >= window.min - 1e-9 && ewma <= window.max + 1e-9,
          s"$et $day: ewma outside the window's range")
      }
      // first observed point: no history, so the smoother is the identity
      assert(math.abs(series.head._4 - series.head._3) < 1e-6)
    }
  }
}
