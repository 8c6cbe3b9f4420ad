package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics surface — the reference's four report queries
  * (calorista/streamlit_app.py) re-expressed over the `events` table:
  * latest-day metrics (:225-265), date-range totals with calendar
  * densification (:267-376), ISO-weekly summaries (:378-508), monthly
  * summaries (:510-602) — plus sessionization and tumbling windows for the
  * streaming-shaped workloads (§2.10).
  *
  * All plans aggregate BEFORE joining the calendar dimension, so the join
  * input is one row per day regardless of raw-event volume, and the
  * generated calendar side is broadcast.
  */
object TimeSeries {

  private def daily(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .select(to_date($"ts").as("day"), $"value")
      .groupBy($"day")
      .agg(sum($"value").as("total_value"), count(lit(1)).as("n_events"))
  }

  /** J1 — calendar densification (streamlit_app.py:326-332): left-join
    * daily totals onto the full generated date range; unlogged days keep
    * NULL (the reference's explicit "keep NaN" gap semantics). The
    * calendar is generated from the data's own min/max via a scalar
    * cross-join (1 row) then exploded — tiny, broadcast side. */
  def q12CalendarDensify(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dt = daily(s, d)
    val bounds = Tables(s, d, "events")
      .agg(min(to_date($"ts")).as("lo"), max(to_date($"ts")).as("hi"))
    val calendar = bounds
      .select(explode(sequence($"lo", $"hi", expr("interval 1 day"))).as("day"))
    calendar.join(dt, Seq("day"), "left")
      .select($"day", $"total_value", $"n_events")
  }

  val q12Sql: String =
    """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
      |     cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
      |     daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
      |                      count(*) AS n_events
      |               FROM events GROUP BY 1)
      |SELECT cal.day, daily.total_value, daily.n_events
      |FROM cal LEFT JOIN daily ON cal.day = daily.day""".stripMargin

  /** A2/A3/A4 — date-range totals and per-calendar-day averages
    * (streamlit_app.py:306-372). The denominator is CALENDAR days in the
    * range including unlogged days (datediff+1), not logged days — the
    * reference's semantic trap #1 (SURVEY §7.4). */
  def q13RangeTotals(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lo = "2024-01-05"
    val hi = "2024-01-20"
    val nDays = lit(16.0) // datediff(hi, lo) + 1, fixed range
    Tables(s, d, "events")
      .where(to_date($"ts").between(lit(lo).cast("date"), lit(hi).cast("date")))
      .groupBy($"event_type")
      .agg(sum($"value").as("total_value"), count(lit(1)).as("n_events"))
      .withColumn("avg_per_calendar_day", $"total_value" / nDays)
  }

  val q13Sql: String =
    """SELECT event_type, sum(value) AS total_value, count(*) AS n_events,
      |       sum(value) / 16.0 AS avg_per_calendar_day
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-20'
      |GROUP BY event_type""".stripMargin

  /** A5/A6/A7 — ISO-weekly summary (streamlit_app.py:378-508): group on
    * (ISO week-year, ISO week) — YEAROFWEEK, not year(), the classic Dec
    * 29–Jan 3 trap (SURVEY §7.4 #2); week_start = min(day), days_logged =
    * countDistinct(day), averages over a FIXED 7-day denominator, and the
    * macro-ratio percentage shape (:459-468). */
  def q14WeeklySummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    daily(s, d)
      .groupBy(expr("extract(YEAROFWEEK FROM day)").cast("long").as("iso_year"),
               weekofyear($"day").cast("long").as("iso_week"))
      .agg(min($"day").as("week_start"),
           countDistinct($"day").as("days_logged"),
           // display-round the money sum at 2 (its true value is exact
           // cents; each engine's own summation order perturbs the raw
           // double by ~1e-8, visible to a full-precision compare), and
           // derive the average FROM the rounded total so both engines
           // divide bit-identical doubles
           round(sum($"total_value"), 2).as("total_value"),
           sum($"n_events").as("n_events"))
      .withColumn("avg_per_day_fixed7", round($"total_value" / 7.0, 6))
      .withColumn("n_events", $"n_events".cast("long"))
  }

  val q14Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
      |                      count(*) AS n_events
      |               FROM events GROUP BY 1)
      |SELECT CAST(isoyear(day) AS BIGINT) AS iso_year,
      |       CAST(weekofyear(day) AS BIGINT) AS iso_week,
      |       min(day) AS week_start,
      |       count(DISTINCT day) AS days_logged,
      |       round(sum(total_value), 2) AS total_value,
      |       CAST(sum(n_events) AS BIGINT) AS n_events,
      |       round(round(sum(total_value), 2) / 7.0, 6) AS avg_per_day_fixed7
      |FROM daily
      |GROUP BY 1, 2""".stripMargin

  /** A8/A9/F9/F10 — monthly summary (streamlit_app.py:510-602): month
    * truncation, totals, days-logged, and averages over the DAYS IN THE
    * MONTH (last_day) — the third distinct average denominator. */
  def q15MonthlySummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    daily(s, d)
      .groupBy(to_date(date_trunc("month", $"day")).as("month_start"))
      .agg(round(sum($"total_value"), 2).as("total_value"),
           countDistinct($"day").as("days_logged"),
           sum($"n_events").cast("long").as("n_events"))
      .withColumn("month_label", date_format($"month_start", "MMM yyyy"))
      // rounded-total division: q14's bit-identical-display argument
      .withColumn("avg_per_month_day",
        round($"total_value" / dayofmonth(last_day($"month_start")), 6))
  }

  val q15Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
      |                      count(*) AS n_events
      |               FROM events GROUP BY 1)
      |SELECT CAST(date_trunc('month', day) AS DATE) AS month_start,
      |       round(sum(total_value), 2) AS total_value,
      |       count(DISTINCT day) AS days_logged,
      |       CAST(sum(n_events) AS BIGINT) AS n_events,
      |       strftime(CAST(date_trunc('month', day) AS DATE), '%b %Y') AS month_label,
      |       round(round(sum(total_value), 2) / day(last_day(CAST(date_trunc('month', day) AS DATE))), 6) AS avg_per_month_day
      |FROM daily
      |GROUP BY 1""".stripMargin

  /** SURVEY §2.5's optional unification: the weekly (q14) and monthly
    * (q15) grouping levels in ONE pass via GROUPING SETS — a single
    * scan + daily pre-aggregate feeds an Expand into both levels, so
    * the 100 TB report suite reads the fact table once instead of once
    * per granularity. `level` disambiguates the output rows (the
    * grouping-set keys of the other level are null). */
  def q63GroupingSets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val keyed = daily(s, d)
      .withColumn("iso_year", expr("extract(YEAROFWEEK FROM day)").cast("long"))
      .withColumn("iso_week", weekofyear($"day").cast("long"))
      .withColumn("month_start", to_date(date_trunc("month", $"day")))
    keyed.groupingSets(
        Seq(Seq($"iso_year", $"iso_week"), Seq($"month_start")),
        $"iso_year", $"iso_week", $"month_start")
      .agg(round(sum($"total_value"), 2).as("total_value"),
           sum($"n_events").cast("long").as("n_events"),
           countDistinct($"day").as("days_logged"))
      .withColumn("level", when($"month_start".isNull, "week").otherwise("month"))
      // string, not date: the other level's key is NULL on every row, and
      // a nullable date column hashes asymmetrically across engines in
      // the driver's compare (NaT vs None); text is portable
      .withColumn("month_start", $"month_start".cast("string"))
  }

  val q63Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
      |                      count(*) AS n_events
      |               FROM events GROUP BY 1),
      |keyed AS (SELECT day, total_value, n_events,
      |                 CAST(isoyear(day) AS BIGINT) AS iso_year,
      |                 CAST(weekofyear(day) AS BIGINT) AS iso_week,
      |                 CAST(date_trunc('month', day) AS DATE) AS month_start
      |          FROM daily)
      |SELECT iso_year, iso_week, CAST(month_start AS STRING) AS month_start,
      |       round(sum(total_value), 2) AS total_value,
      |       CAST(sum(n_events) AS BIGINT) AS n_events,
      |       count(DISTINCT day) AS days_logged,
      |       CASE WHEN month_start IS NULL THEN 'week' ELSE 'month' END AS level
      |FROM keyed
      |GROUP BY GROUPING SETS ((iso_year, iso_week), (month_start))""".stripMargin

  /** A11/A1/P4 — latest-day metrics (streamlit_app.py:225-265): argmax of
    * the date column (max, not distinct+sort), equality filter on it,
    * global sums by type. The max-date is a scalar subquery so the filter
    * can still prune partitions on a date-partitioned table. */
  def q21LatestDay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, d, "events").withColumn("day", to_date($"ts"))
    val latest = ev.agg(max($"day").as("latest_day"))
    ev.join(broadcast(latest), $"day" === $"latest_day")
      .groupBy($"event_type")
      .agg(sum($"value").as("total_value"), count(lit(1)).as("n_events"))
  }

  val q21Sql: String =
    """SELECT event_type, sum(value) AS total_value, count(*) AS n_events
      |FROM events
      |WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
      |GROUP BY event_type""".stripMargin

  /** Sessionization via lag window: a session break is a >30 min gap per
    * user. Gap math on fractional epoch seconds; ordering tie-broken by
    * event_id so the survivor is engine-independent. At scale this is one
    * shuffle on user_id and a per-partition sort — no driver state. */
  def q22Sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(s, d, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("is_new_session",
        when($"prev_ts".isNull ||
             ($"ts".cast("double") - $"prev_ts".cast("double")) > 1800.0, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"is_new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("session_value"))
      .groupBy($"user_id")
      .agg(max($"session_id").as("n_sessions"),
           avg($"n_events").as("avg_events_per_session"),
           // round(2): the true per-user money total is exact cents;
           // summation-order noise (~1e-12) is display-invisible at 2
           round(sum($"session_value"), 2).as("total_value"))
  }

  val q22Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, value,
      |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800.0
      |              THEN 1 ELSE 0 END AS is_new_session,
      |         ts
      |  FROM seq),
      |sessions AS (
      |  SELECT user_id, value,
      |         CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged),
      |per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events, sum(value) AS session_value
      |  FROM sessions GROUP BY 1, 2)
      |SELECT user_id, max(session_id) AS n_sessions,
      |       avg(n_events) AS avg_events_per_session,
      |       round(sum(session_value), 2) AS total_value
      |FROM per_session GROUP BY user_id""".stripMargin

  /** Tumbling-window aggregation (§2.10): 1-hour windows over events — the
    * batch-parity form of the Structured Streaming windowed agg in
    * graft.streaming.EventStream (same grouping expression). */
  def q23TumblingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n_events", $"total_value")
  }

  val q23Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       count(*) AS n_events, sum(value) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Rolling 7-day mean (trend-line extension, streamlit_app.py:334-360):
    * average daily total over the trailing week, per day.
    *
    * The unpartitioned window is DELIBERATE and bounded: its input is
    * the per-day aggregate — one row per calendar day (≤ ~36k rows per
    * century), already reduced from the raw events by [[daily]]. A
    * single-task window over a calendar axis is the correct plan at any
    * corpus scale; if the calendar axis itself ever sharded (multi-
    * tenant), key the window by tenant. */
  def q24RollingMean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"day").rowsBetween(-6, 0)
    daily(s, d)
      .withColumn("rolling_7d_avg", avg($"total_value").over(w))
      .select($"day", $"total_value", $"rolling_7d_avg")
  }

  val q24Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value
      |               FROM events GROUP BY 1)
      |SELECT day, total_value,
      |       avg(total_value) OVER (ORDER BY day
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_7d_avg
      |FROM daily""".stripMargin

  /** Built-in session windows (the declarative form of q22's lag-based
    * sessionization — same 30-minute gap semantics, one expression):
    * per-user sessions close after 30 idle minutes. Works identically
    * under Structured Streaming with a watermark. */
  def q48SessionWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("session_value"))
      .select($"user_id", $"w.start".as("session_start"),
              $"n_events", $"session_value")
  }

  /** Oracle reproduces session_window semantics with lag + cumulative
    * flag: a session's window starts at its first event. */
  val q48Sql: String =
    """WITH seq AS (
      |  SELECT user_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
      |         event_id
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts, value, event_id,
      |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) >= 1800.0
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM seq),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |       count(*) AS n_events, sum(value) AS session_value
      |FROM sessions GROUP BY user_id, sid""".stripMargin

  /** As-of join — the canonical "operator Spark lacks" (build brief,
    * preference (a): compose built-ins). Each purchase event is matched
    * to the same user's most recent click at-or-before it.
    *
    * Implementation is the union + carry-forward trick, NOT a range
    * join: tag both sides, union, sort per user by (ts, side) with the
    * reference side first on ties, and carry the last reference row
    * forward with last(..., ignoreNulls). One shuffle on user_id and a
    * per-partition sort — linear in input, no quadratic candidate
    * explosion, which is why it survives 100 TB where a theta join
    * (`b.ts <= a.ts` nested loop) cannot. */
  def q49AsofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, d, "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts", lit(0).as("side"),
        $"event_id".as("click_id"), $"value".as("click_value"),
        lit(null).cast("long").as("purchase_id"),
        lit(null).cast("double").as("purchase_value"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1).as("side"),
        lit(null).cast("long").as("click_id"),
        lit(null).cast("double").as("click_value"),
        $"event_id".as("purchase_id"), $"value".as("purchase_value"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"side", coalesce($"click_id", $"purchase_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click_id", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("asof_click_value", last($"click_value", ignoreNulls = true).over(w))
      .where($"side" === 1)
      .select($"user_id", $"purchase_id", $"purchase_value",
              $"asof_click_id", $"asof_click_value")
  }

  /** DuckDB has native ASOF JOIN — the oracle exercises the real
    * semantics rather than mirroring our implementation trick. */
  val q49Sql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_id, value AS click_value
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.purchase_id, p.purchase_value,
      |       c.click_id AS asof_click_id, c.click_value AS asof_click_value
      |FROM purchases p
      |ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** Sliding windows: 1-hour windows every 15 minutes — each event
    * contributes to 4 overlapping windows (Spark expands this
    * internally; the oracle expands it explicitly with generate_series).
    * The streaming twin adds a watermark; grouping is identical. */
  def q50SlidingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 6).as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n_events", $"total_value")
  }

  val q50Sql: String =
    """WITH expanded AS (
      |  SELECT event_type, value,
      |         unnest(generate_series(
      |           date_trunc('hour', ts) - INTERVAL 45 MINUTE
      |             + CAST(floor(minute(ts) / 15) AS INTEGER) * INTERVAL 15 MINUTE,
      |           date_trunc('hour', ts)
      |             + CAST(floor(minute(ts) / 15) AS INTEGER) * INTERVAL 15 MINUTE,
      |           INTERVAL 15 MINUTE)) AS window_start
      |  FROM events)
      |SELECT window_start, event_type,
      |       count(*) AS n_events, round(sum(value), 6) AS total_value
      |FROM expanded
      |GROUP BY 1, 2""".stripMargin

  /** Ordered funnel analysis over the event stream: users reaching
    * view → click-after-view → purchase-after-click, counted per stage.
    * Three chained conditional-min aggregations, ALL keyed on user_id —
    * one logical shuffle key throughout, so at scale the stages reuse a
    * single partitioning instead of re-shuffling the raw events. The
    * strict `>` ordering makes the stage definition unambiguous (a
    * same-timestamp click does not satisfy click-after-view). */
  def q60Funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, d, "events").select($"user_id", $"event_type", $"ts")
    val v = ev.where($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("v_ts"))
    val c = ev.join(v, "user_id")
      .where($"event_type" === "click" && $"ts" > $"v_ts")
      .groupBy($"user_id").agg(min($"ts").as("c_ts"))
    val p = ev.join(c, "user_id")
      .where($"event_type" === "purchase" && $"ts" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    val counts = v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    counts.selectExpr(
      "stack(3, 'view', n_view, 'view_click', n_click, 'view_click_purchase', n_purchase) AS (stage, n_users)")
  }

  val q60Sql: String =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts
      |      FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts
      |      FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
      |SELECT 'view' AS stage, (SELECT count(*) FROM v) AS n_users
      |UNION ALL SELECT 'view_click', (SELECT count(*) FROM c)
      |UNION ALL SELECT 'view_click_purchase', (SELECT count(*) FROM p)""".stripMargin

  /** Retention cohorts: users grouped by first-active day, counted at
    * each day offset they return. The (user, day) activity set is
    * deduped FIRST — the cohort aggregation then works on ≤ users×days
    * rows no matter how many raw events exist, which is what makes
    * retention computable at full event volume. */
  def q61Retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val act = Tables(s, d, "events")
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val first = act.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    act.join(first, "user_id")
      .select($"cohort_day",
        datediff($"day", $"cohort_day").cast("long").as("day_offset"))
      .groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  val q61Sql: String =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
      |SELECT f.cohort_day,
      |       CAST(date_diff('day', f.cohort_day, act.day) AS BIGINT) AS day_offset,
      |       count(*) AS n_users
      |FROM act JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Daily-anomaly detection: each (event_type, day) total scored
    * against that type's own distribution as a z-score, flagged at
    * |z| > 2 — the monitoring query every ingestion pipeline runs over
    * its volume metrics. The window input is the DAILY aggregate
    * (types × days rows), so the per-type stats window is tiny no
    * matter how many raw events exist — same pre-aggregate-first shape
    * as retention (q61). z is rounded to 4dp in both engines (a
    * division by stddev amplifies last-bit summation wobble past 6dp). */
  def q73DailyAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dailyTotals = Tables(s, d, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value").as("total"))
    val byType = Window.partitionBy($"event_type")
    dailyTotals
      .withColumn("mu", avg($"total").over(byType))
      .withColumn("sd", stddev_samp($"total").over(byType))
      .withColumn("z", round(($"total" - $"mu") / $"sd", 4))
      .select($"event_type", $"day", round($"total", 6).as("total"), $"z",
        when(abs($"z") > 2.0, 1L).otherwise(0L).as("is_anomaly"))
  }

  val q73Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS total
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, day, total,
      |         round((total - avg(total) OVER (PARTITION BY event_type))
      |               / stddev_samp(total) OVER (PARTITION BY event_type), 4) AS z
      |  FROM daily)
      |SELECT event_type, day, round(total, 6) AS total, z,
      |       CAST(CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM scored""".stripMargin

  /** q101 — robust outlier detection with median/MAD, the q73 z-score's
    * outlier-resistant sibling (a mean/stddev gate is itself dragged by
    * the outliers it hunts; the 1.4826·MAD scale estimator is consistent
    * for σ under normality and breaks down only at 50% contamination).
    * Exact medians via Spark's `percentile` (interpolating, matching
    * DuckDB's `median` on doubles); the threshold literal 4.4478 =
    * 3·1.4826 is written identically in both engines so no cross-engine
    * multiplication-order wobble exists.
    *
    * Shape: two tiny per-type aggregates (med, then MAD over the
    * med-joined deviations), broadcast back, one counting pass — three
    * scans, each combiner-friendly, nothing corpus-sized shuffles except
    * the per-type sort inside exact percentile. At 100 TB exact
    * per-group medians mean per-group sorts; the documented scale fallback
    * is `approx_percentile` (q40/q41 cover that family) — the exact form
    * here IS the contract for a calibration-grade robust stat. */
  def q101MadOutliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, d, "events").select($"event_type", $"value")
    val med = ev.groupBy($"event_type").agg(expr("percentile(value, 0.5D)").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
    ev.join(broadcast(med.join(mad, "event_type")), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(first($"med"), 6).as("med"),
        round(first($"mad"), 6).as("mad"),
        sum(when(abs($"value" - $"med") > lit(4.4478) * $"mad", 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_frac", round($"n_outliers" / $"n_events", 6))
  }

  val q101Sql: String =
    """WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
      |mad AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad
      |        FROM events e JOIN med m USING (event_type) GROUP BY 1)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       round(any_value(m.med), 6) AS med,
      |       round(any_value(d.mad), 6) AS mad,
      |       CAST(sum(CASE WHEN abs(e.value - m.med) > 4.4478 * d.mad
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       round(sum(CASE WHEN abs(e.value - m.med) > 4.4478 * d.mad
      |                      THEN 1 ELSE 0 END) / count(*), 6) AS outlier_frac
      |FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
      |GROUP BY 1""".stripMargin

  /** EWMA weights: half-life decay r = 0.5, truncated at 14 observed
    * points. 0.5^k is an exact binary double, so the Spark plan and the
    * DuckDB oracle compute bit-identical kernels — no cross-engine pow()
    * wobble (the reason the decay is a half-life and not, say, 0.7). */
  private val EwmaTerms = 14
  private val EwmaDecay = 0.5

  /** q94 — exponentially weighted moving average of the per-type daily
    * totals: the dashboard smoother (the low-lag companion to q24's flat
    * 7-day window). Normalized truncated kernel (pandas `adjust=True`
    * semantics): ewma_i = Σ_k r^k·x_{i-k} / Σ_k r^k over the terms that
    * exist, so the series start is unbiased instead of damped toward 0.
    * The kernel is truncated at 14 observed points (weight 0.5^14 ≈
    * 6e-5 — below the output rounding), which keeps the whole smoother
    * a FIXED composition of lag() windows: one shuffle+sort per
    * event_type over the DAILY AGGREGATE — a calendar-bounded table, so
    * the window input is bounded by time, not data, exactly like q80.
    * Operates on observed rows (dashboard semantics); densify with q12
    * first if calendar-gap-aware decay is wanted. */
  def q94Ewma(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dailyByType = Tables(s, d, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value").as("total_value"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    def decayK(k: Int) = lit(math.pow(EwmaDecay, k))
    val num = (0 until EwmaTerms).map { k =>
      decayK(k) * coalesce(lag($"total_value", k).over(w), lit(0.0))
    }.reduce(_ + _)
    val den = (0 until EwmaTerms).map { k =>
      decayK(k) * when(lag($"day", k).over(w).isNotNull, lit(1.0)).otherwise(lit(0.0))
    }.reduce(_ + _)
    dailyByType
      .withColumn("ewma", round(num / den, 6))
      .select($"event_type", $"day", round($"total_value", 6).as("total_value"), $"ewma")
  }

  val q94Sql: String = {
    // identical kernel, generated from the same constants: left-to-right
    // addition order and exact 0.5^k literals keep both engines on the
    // same doubles
    val over = "OVER (PARTITION BY event_type ORDER BY day)"
    val num = (0 until EwmaTerms).map { k =>
      s"${math.pow(EwmaDecay, k)} * coalesce(lag(total_value, $k) $over, 0.0)"
    }.mkString(" + ")
    val den = (0 until EwmaTerms).map { k =>
      s"${math.pow(EwmaDecay, k)} * (CASE WHEN lag(day, $k) $over IS NOT NULL THEN 1.0 ELSE 0.0 END)"
    }.mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS total_value
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, day, round(total_value, 6) AS total_value,
       |       round(($num) / ($den), 6) AS ewma
       |FROM daily""".stripMargin
  }

  /** q97 — EXACT rolling 7-day distinct users per day (the DAU/WAU
    * family): for each calendar day with activity, how many distinct
    * users were active in the trailing 7-day window. Exact sliding
    * distinct does NOT decompose into a window aggregate (distinct is
    * not subtractable), so the scalable form is the contribution-range
    * expansion: dedup to (user, day) first — the only corpus-sized
    * shuffle, combiner-friendly — then each activity day contributes
    * the user to the ≤7 window days it can serve, and a second
    * (user, window_day) dedup + count finishes. Work is bounded by
    * 7·|user-days|, never events×days; compare q41's HLL sketch for
    * the approximate O(1)-state alternative. Window days with no
    * activity of their own are kept when an earlier day serves them —
    * only days inside the data's span qualify. */
  def q97RollingDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val userDays = Tables(s, d, "events")
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val span = userDays.agg(min($"day").as("lo"), max($"day").as("hi"))
    val contributions = userDays
      .select($"user_id",
        explode(sequence($"day", date_add($"day", 6), expr("interval 1 day")))
          .as("window_day"))
      .distinct()
    contributions
      .join(broadcast(span), $"window_day".between($"lo", $"hi"))
      .groupBy($"window_day")
      .agg(count(lit(1)).as("rolling_7d_users"))
  }

  val q97Sql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |span AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
      |contrib AS (
      |  SELECT DISTINCT user_id,
      |         CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS window_day
      |  FROM ud)
      |SELECT window_day, count(*) AS rolling_7d_users
      |FROM contrib, span
      |WHERE window_day BETWEEN lo AND hi
      |GROUP BY 1""".stripMargin

  /** Event-type transition matrix (first-order Markov view of user
    * behavior): for each consecutive event pair on a user's timeline,
    * count from→to transitions and the per-from transition probability.
    * One shuffle+sort on user_id feeds the `lead`; everything after runs
    * on the types×types grid — constant-sized however many events exist.
    * Ordering ties break on event_id (same convention as q22), so the
    * matrix is engine- and topology-independent. */
  def q79Transitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(s, d, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(byUser))
      .where($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round($"n" / sum($"n").over(Window.partitionBy($"from_type")), 6))
  }

  val q79Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |       round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM c""".stripMargin

  /** q104 — behavioral trigram mining: the top-20 3-step event-type
    * sequences across user timelines (q79's transition matrix extended
    * one step — the "what do users actually DO" patterns funnels are
    * designed from). Both lead() terms ride ONE window pass over the
    * (user, time) ordering; pattern counting is a combiner-friendly
    * aggregate on a key space bounded by |event_types|³, and top-20 is
    * orderBy+limit = TakeOrderedAndProject (map-side partial top-k),
    * never a global sort. Deterministic total order (n desc, then the
    * pattern lexicographically) keeps the cut engine-portable. */
  def q104BehaviorTrigrams(s: SparkSession, d: String): DataFrame =
    behaviorTrigrams(Tables(s, d, "events"))

  /** q104's core on any events-shaped DataFrame — shared with the
    * streaming twin's parity spec ([[graft.streaming.EventStream
    * .trigramStream]] emits the same pattern multiset incrementally). */
  def behaviorTrigrams(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("t2", lead($"event_type", 1).over(byUser))
      .withColumn("t3", lead($"event_type", 2).over(byUser))
      .where($"t3".isNotNull)
      .groupBy($"event_type".as("t1"), $"t2", $"t3")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"t1", $"t2", $"t3")
      .limit(20)
  }

  val q104Sql: String =
    """WITH seq AS (
      |  SELECT event_type AS t1,
      |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
      |         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
      |  FROM events)
      |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
      |FROM seq WHERE t3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, t1, t2, t3
      |LIMIT 20""".stripMargin

  /** q106 — cross-metric correlation matrix: pairwise Pearson
    * correlation of the per-type DAILY total series (do signups move
    * with purchases?), the dashboard's metric-relationship panel. The
    * raw events reduce to a (day × type) aggregate FIRST — the pair
    * join and corr() run on a calendar-bounded table (days × |types|),
    * so the self-join is broadcast and event volume only affects the
    * one combiner-friendly daily aggregate. Inner join on day = corr
    * over days where BOTH series have data (identical semantics both
    * engines); pairs are ordered t1 < t2, each emitted once. */
  def q106MetricCorrelation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dailyByType = Tables(s, d, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value").as("total"))
    val a = dailyByType.select($"event_type".as("type_a"), $"day", $"total".as("ta"))
    val b = dailyByType.select($"event_type".as("type_b"), $"day", $"total".as("tb"))
    a.join(broadcast(b), Seq("day"))
      .where($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_days"),
        round(corr($"ta", $"tb"), 6).as("pearson_r"))
  }

  val q106Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS total
      |  FROM events GROUP BY 1, 2)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       round(corr(a.total, b.total), 6) AS pearson_r
      |FROM daily a JOIN daily b
      |  ON a.day = b.day AND a.event_type < b.event_type
      |GROUP BY 1, 2""".stripMargin

  /** q109 — last-touch conversion attribution: each purchase credits
    * the user's most recent preceding NON-purchase event within 1 hour
    * (else 'direct') — the analytics query funnels (q60) summarize.
    * One window pass per user timeline computes both the touch type and
    * its timestamp with `last(..., ignoreNulls)` over the same frame
    * (both expressions are non-null on exactly the same rows, so they
    * always read the same touch row); attribution shares are a
    * 5-row-by-construction final aggregate, so its global-share window
    * is bounded by |event_types|, never data. */
  def q109Attribution(s: SparkSession, d: String): DataFrame =
    attribution(Tables(s, d, "events"))

  /** q109's core on any events-shaped DataFrame — shared with the
    * streaming twin's parity spec ([[graft.streaming.EventStream
    * .attributionStream]] emits the same per-purchase credits
    * incrementally). */
  def attribution(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when($"event_type" =!= "purchase", $"event_type")
    val touchTs = when($"event_type" =!= "purchase", $"ts")
    val attributed = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("ptype", last(touch, ignoreNulls = true).over(byUser))
      .withColumn("pts", last(touchTs, ignoreNulls = true).over(byUser))
      .where($"event_type" === "purchase")
      .select(
        when($"pts".isNotNull && $"pts" >= $"ts" - expr("INTERVAL 1 HOUR"), $"ptype")
          .otherwise(lit("direct")).as("touch_type"))
    attributed.groupBy($"touch_type")
      .agg(count(lit(1)).as("n_purchases"))
      .withColumn("share",
        round($"n_purchases" / sum($"n_purchases").over(Window.partitionBy()), 6))
  }

  val q109Sql: String =
    """WITH w AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ptype,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pts
      |  FROM events),
      |p AS (SELECT CASE WHEN pts IS NOT NULL AND pts >= ts - INTERVAL 1 HOUR
      |                  THEN ptype ELSE 'direct' END AS touch_type
      |      FROM w WHERE event_type = 'purchase')
      |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_purchases,
      |       round(count(*) / sum(count(*)) OVER (), 6) AS share
      |FROM p GROUP BY 1""".stripMargin

  /** Cumulative user-growth curve: users bucketed by their first-active
    * day, daily new-user counts, and the running total. The raw events
    * reduce to one row per user FIRST (min day), then to one row per
    * day — the final unpartitioned cumsum window runs on a
    * calendar-days-sized input, which is bounded by time, not data, so
    * the single-partition window is safe at any event volume. */
  def q80UserGrowth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val first = Tables(s, d, "events")
      .groupBy($"user_id").agg(min(to_date($"ts")).as("day"))
    first.groupBy($"day").agg(count(lit(1)).as("new_users"))
      .withColumn("cumulative_users",
        sum($"new_users").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
  }

  val q80Sql: String =
    """WITH first AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
      |daily AS (SELECT day, count(*) AS new_users FROM first GROUP BY 1)
      |SELECT day, new_users,
      |       CAST(sum(new_users) OVER (ORDER BY day
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cumulative_users
      |FROM daily""".stripMargin

  /** Inter-event gap statistics per event type (the latency/cadence
    * profile): per-user consecutive gaps in seconds attributed to the
    * LATER event's type, then count / mean / exact p50 / p90 per type.
    * One shuffle+sort on user_id for the lag (shared shape with q22/q79)
    * and one combiner shuffle on type; exact percentiles run on the
    * per-type gap sets. Ties in ordering break on event_id. */
  def q81EventGaps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(s, d, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .where($"prev_ts".isNotNull)
      .withColumn("gap_s", $"ts".cast("double") - $"prev_ts".cast("double"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(avg($"gap_s"), 4).as("mean_gap_s"),
        round(expr("percentile(gap_s, 0.5)"), 4).as("p50_gap_s"),
        round(expr("percentile(gap_s, 0.9)"), 4).as("p90_gap_s"))
  }

  val q81Sql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id)) AS gap_s
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |       round(avg(gap_s), 4) AS mean_gap_s,
      |       round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
      |       round(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s
      |FROM seq WHERE gap_s IS NOT NULL
      |GROUP BY event_type""".stripMargin

  /** Per-user event-type entropy — the behavioral-diversity score (a
    * bot/script whose traffic is one event type scores 0; uniform mix
    * over k types scores ln k). Shape: one combiner shuffle builds the
    * (user, type) counts; the per-user total is a WINDOW over that
    * aggregated table (partitioned by user — no second pass, no join),
    * and the final per-user sum reuses the same partitioning. Entropy
    * terms sum over ≤|event types| rows per user, so the cross-engine
    * float-order wobble is far under the 6 dp round. */
  def q92UserEntropy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = Tables(s, d, "events")
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
    val byUser = Window.partitionBy($"user_id")
    st.withColumn("n", sum($"c").over(byUser))
      .groupBy($"user_id", $"n")
      .agg(round(sum(-($"c" / $"n") * log($"c" / $"n")), 6).as("type_entropy"))
      .select($"user_id", $"n".as("n_events"), $"type_entropy")
  }

  val q92Sql: String =
    """WITH st AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |       FROM events GROUP BY 1, 2),
      |w AS (SELECT user_id, c,
      |             CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
      |      FROM st)
      |SELECT user_id, n AS n_events,
      |       round(sum(-(c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))), 6)
      |         AS type_entropy
      |FROM w GROUP BY 1, 2""".stripMargin

  /** Interval (time-bounded) join — every view matched to the SAME
    * user's purchases inside the following hour. This is the batch twin
    * of [[graft.streaming.EventStream.intervalJoinStream]]'s
    * stream-stream join: identical predicate, so the spec can pin the
    * two surfaces to one answer. Unlike q109's last-touch attribution
    * (one credit per purchase) this keeps EVERY qualifying pair — the
    * click-through / conversion-candidate shape.
    *
    * Scale: the equality on `user_id` makes this a plain shuffle
    * hash/sort-merge join with the time bound as a cheap post-filter —
    * never a broadcast-nested-loop (the trap with pure range
    * conditions). State per key is bounded by a user's events in one
    * hour; in the streaming twin the same bound is what lets Spark
    * evict join state by watermark. */
  def q121IntervalJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, d, "events")
    val views = ev.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"), $"value".as("amount"))
    views.join(purchases,
        $"user_id" === $"p_user" &&
          $"purchase_ts" >= $"view_ts" &&
          $"purchase_ts" < $"view_ts" + expr("INTERVAL 1 HOUR"))
      .select($"user_id", $"view_id", $"purchase_id", $"amount")
  }

  val q121Sql: String =
    """SELECT v.user_id, v.event_id AS view_id,
      |       p.event_id AS purchase_id, p.value AS amount
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR""".stripMargin

  /** q158 — SCD Type-2 history construction (Kimball's slowly-changing
    * dimension, the warehouse op that turns an observation log into a
    * versioned dimension): per customer, the version history of the
    * order-priority attribute over order dates. Consecutive identical
    * observations collapse into one version (the SCD2 contract — a
    * version spans until the attribute CHANGES); each version carries
    * [valid_from, valid_to) with an open current version, its version
    * number, and the is_current flag. Deterministic total order per key
    * is (date, order key) — same tie convention as q22/q79 — so the
    * history is engine- and topology-independent. One shuffle+sort on
    * the natural key feeds both window passes; at 100 TB that is the
    * minimum any history build pays, and nothing downstream reshuffles
    * (change-point filter and versioning reuse the same ordering).
    * Nullable valid_to is CAST to string in both engines (the q63
    * NaT/None asymmetry). */
  def q158Scd2History(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byCust = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val chg = Tables(s, d, "orders")
      .select($"o_custkey", $"o_orderpriority", $"o_orderdate", $"o_orderkey")
      .withColumn("prev", lag($"o_orderpriority", 1).over(byCust))
      .where($"prev".isNull || $"o_orderpriority" =!= $"prev")
    val byVer = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    chg
      .withColumn("valid_to_d", lead($"o_orderdate", 1).over(byVer))
      .withColumn("version_no", row_number().over(byVer).cast("long"))
      .select(
        $"o_custkey",
        $"o_orderpriority".as("priority"),
        $"o_orderdate".cast("string").as("valid_from"),
        $"valid_to_d".cast("string").as("valid_to"),
        $"version_no",
        $"valid_to_d".isNull.as("is_current"))
  }

  val q158Sql: String =
    """WITH seq AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |         lag(o_orderpriority) OVER
      |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |chg AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      |  FROM seq WHERE prev IS NULL OR o_orderpriority <> prev),
      |ver AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate,
      |         lead(o_orderdate) OVER
      |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to_d,
      |         CAST(row_number() OVER
      |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
      |           AS version_no
      |  FROM chg)
      |SELECT o_custkey, o_orderpriority AS priority,
      |       CAST(o_orderdate AS VARCHAR(10)) AS valid_from,
      |       CAST(valid_to_d AS VARCHAR(10)) AS valid_to,
      |       version_no,
      |       valid_to_d IS NULL AS is_current
      |FROM ver""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_scd2_history" -> (q158Scd2History _),
    "q121_interval_join" -> (q121IntervalJoin _),
    "q92_user_entropy" -> (q92UserEntropy _),
    "q94_ewma" -> (q94Ewma _),
    "q97_rolling_distinct" -> (q97RollingDistinct _),
    "q48_session_window" -> (q48SessionWindow _),
    "q49_asof_join" -> (q49AsofJoin _),
    "q50_sliding_window" -> (q50SlidingWindow _),
    "q12_calendar_densify" -> (q12CalendarDensify _),
    "q13_range_totals" -> (q13RangeTotals _),
    "q14_weekly_summary" -> (q14WeeklySummary _),
    "q15_monthly_summary" -> (q15MonthlySummary _),
    "q21_latest_day" -> (q21LatestDay _),
    "q22_sessionize" -> (q22Sessionize _),
    "q23_tumbling_window" -> (q23TumblingWindow _),
    "q24_rolling_mean" -> (q24RollingMean _),
    "q60_funnel" -> (q60Funnel _),
    "q61_retention" -> (q61Retention _),
    "q63_grouping_sets" -> (q63GroupingSets _),
    "q73_daily_anomaly" -> (q73DailyAnomaly _),
    "q101_mad_outliers" -> (q101MadOutliers _),
    "q104_behavior_trigrams" -> (q104BehaviorTrigrams _),
    "q106_metric_correlation" -> (q106MetricCorrelation _),
    "q109_attribution" -> (q109Attribution _),
    "q79_transitions" -> (q79Transitions _),
    "q80_user_growth" -> (q80UserGrowth _),
    "q81_event_gaps" -> (q81EventGaps _))

  val oracleSql: Map[String, String] = Map(
    "q121_interval_join" -> q121Sql,
    "q92_user_entropy" -> q92Sql,
    "q94_ewma" -> q94Sql,
    "q97_rolling_distinct" -> q97Sql,
    "q48_session_window" -> q48Sql,
    "q49_asof_join" -> q49Sql,
    "q50_sliding_window" -> q50Sql,
    "q12_calendar_densify" -> q12Sql,
    "q13_range_totals" -> q13Sql,
    "q14_weekly_summary" -> q14Sql,
    "q15_monthly_summary" -> q15Sql,
    "q21_latest_day" -> q21Sql,
    "q22_sessionize" -> q22Sql,
    "q23_tumbling_window" -> q23Sql,
    "q24_rolling_mean" -> q24Sql,
    "q60_funnel" -> q60Sql,
    "q61_retention" -> q61Sql,
    "q63_grouping_sets" -> q63Sql,
    "q73_daily_anomaly" -> q73Sql,
    "q101_mad_outliers" -> q101Sql,
    "q104_behavior_trigrams" -> q104Sql,
    "q106_metric_correlation" -> q106Sql,
    "q109_attribution" -> q109Sql,
    "q79_transitions" -> q79Sql,
    "q80_user_growth" -> q80Sql,
    "q81_event_gaps" -> q81Sql,
    "q158_scd2_history" -> q158Sql)
}
