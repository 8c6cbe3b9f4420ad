package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface: projections/filters (SURVEY §2.2),
  * deduplication (§2.3), joins (§2.4), aggregations (§2.5), windows (§2.6),
  * sorts/limits (§2.7), set ops & unpivot (§2.8).
  *
  * The reference (coldshrine/calorista) exercises these shapes over pandas
  * frames (e.g. filters `streamlit_app.py:242,306-309`, group-sums
  * `streamlit_app.py:315-324`, dedup `main.py:96-105`); here each is
  * re-expressed as a declarative Spark plan over the driver's TPC-H-ish
  * testdata so Catalyst gets pushdown/pruning/partial-agg for free and the
  * same plan scales to a multi-executor cluster.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")

  /** TPC-H Q1-style pricing summary: filter + multi-aggregate group-by.
    * Mirrors the reference's "many sums in one pass" daily-totals shape
    * (calorista/streamlit_app.py:315-324). Scale: partial aggregation
    * map-side, 6 groups out — shuffle is tiny regardless of input size.
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    li(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        // aggregate floats rounded IN-QUERY on both engines: sums over
        // different partition orders differ in low bits, and the
        // driver's compare tolerance is not ours to choose
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(sum($"l_extendedprice"), 4).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 4).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + compound predicate; both reach the parquet scan
    * (PushedFilters + pruned ReadSchema). Reference filters post-materialize
    * in memory (streamlit_app.py:306-309) — the anti-pattern this fixes. */
  def q2FilterProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    li(s, d)
      .where($"l_shipdate".between(lit("1996-01-01").cast("timestamp"),
                                   lit("1997-12-31").cast("timestamp"))
        && $"l_discount" > 0.05 && $"l_quantity" < 25)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |  AND l_discount > 0.05 AND l_quantity < 25""".stripMargin

  /** Star-schema revenue by nation: fact ⋈ three dims. nation/region are
    * tiny → explicit broadcast; customer⋈orders⋈lineitem shuffle on keys
    * (sort-merge at 100 TB, AQE may demote to broadcast at small SF). */
  def q3RevenueByNation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val revenue = li(s, d)
      .join(ord(s, d), $"l_orderkey" === $"o_orderkey")
      .join(cust(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, d, "region")), $"n_regionkey" === $"r_regionkey")
    revenue.groupBy($"r_name", $"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q3Sql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** q107 — the TPC-H Q5 shape: local-supplier revenue per nation. Six
    * tables, two selective filters (one region, one order-date year) and
    * the LOCAL constraint c_nationkey = s_nationkey — the canonical
    * join-order stress query (q3's star plus a second fact-dimension arm
    * that must be reordered around the filters). The declarative form
    * leaves ordering to Catalyst/CBO: both date and region predicates
    * push to their scans, nation/region broadcast, and the
    * customer/supplier nation equality rides the supplier join
    * condition instead of a post-join filter. */
  def q107LocalSupplierRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    li(s, d)
      .join(ord(s, d).where($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(cust(s, d), $"o_custkey" === $"c_custkey")
      .join(Tables(s, d, "supplier"),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, d, "region").where($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q107Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  /** Semi-join (EXISTS): orders having a lineitem shipped after the order
    * date, counted by priority. left_semi never widens rows — at scale this
    * avoids materializing the join product. */
  def q4SemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = ord(s, d)
    val l = li(s, d)
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"),
           "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** Anti-join (NOT EXISTS): customers with no orders. */
  def q5AntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    cust(s, d)
      .join(ord(s, d), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  val q5Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Top-k by aggregate: top 10 customers by order revenue, deterministic
    * tie-break on key. TakeOrderedAndProject — no global sort at scale.
    * (Reference top-1: sort desc + take first, streamlit_app.py:233-234.) */
  def q6TopCustomers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    ord(s, d).groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 4).as("total_spent"), count(lit(1)).as("n_orders"))
      .orderBy($"total_spent".desc, $"o_custkey")
      .limit(10)
  }

  val q6Sql: String =
    """SELECT o_custkey, round(sum(o_totalprice), 4) AS total_spent, count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY total_spent DESC, o_custkey
      |LIMIT 10""".stripMargin

  /** Ranking window: top-3 orders per customer by price (SURVEY §2.6 —
    * the idiomatic form of the reference's newest-wins selection). */
  def q7TopOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    ord(s, d)
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn".cast("long").as("rn"))
  }

  val q7Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |             row_number() OVER (PARTITION BY o_custkey
      |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 3""".stripMargin

  /** q7's semantics through the CUSTOM physical operator
    * [[graft.plans.TopKPerGroup]] instead of window + filter: a map-side
    * bounded heap caps the shuffle at k rows per group per partition
    * (the window form shuffles every row). Same oracle SQL as q7 — the
    * correctness gate doubles as the operator-equivalence proof. */
  def q53TopKCustom(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.TopK.perGroup(
        ord(s, d).select($"o_custkey", $"o_orderkey", $"o_totalprice"),
        groupCols = Seq("o_custkey"),
        orderCols = Seq(("o_totalprice", false), ("o_orderkey", true)),
        k = 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn".cast("long").as("rn"))
  }

  val q53Sql: String = q7Sql

  /** Distinct aggregation per group (nunique ≙ countDistinct,
    * streamlit_app.py:397 `days_logged`). */
  def q8DistinctAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    cust(s, d)
      .join(broadcast(Tables(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(countDistinct($"c_mktsegment").as("n_segments"),
           count(lit(1)).as("n_customers"),
           round(avg($"c_acctbal"), 4).as("avg_acctbal"))
  }

  val q8Sql: String =
    """SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments,
      |       count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Melt / unpivot wide→long (R1, streamlit_app.py:346-351 et al.):
    * global measure sums reshaped to (measure, total) rows via stack. */
  def q9Unpivot(s: SparkSession, d: String): DataFrame = {
    li(s, d)
      .agg(round(sum(col("l_quantity")), 4).as("q"), round(sum(col("l_extendedprice")), 4).as("e"),
           round(sum(col("l_discount")), 4).as("disc"), round(sum(col("l_tax")), 4).as("t"))
      .selectExpr(
        "stack(4, 'quantity', q, 'extendedprice', e, 'discount', disc, 'tax', t) AS (measure, total)")
  }

  val q9Sql: String =
    """WITH s AS (SELECT round(sum(l_quantity), 4) q, round(sum(l_extendedprice), 4) e,
      |                  round(sum(l_discount), 4) disc, round(sum(l_tax), 4) t FROM lineitem)
      |SELECT 'quantity' AS measure, q AS total FROM s
      |UNION ALL SELECT 'extendedprice', e FROM s
      |UNION ALL SELECT 'discount', disc FROM s
      |UNION ALL SELECT 'tax', t FROM s""".stripMargin

  /** Set operations: union / intersect / except over customer-key sets
    * (implicit union in reference: main.py:100, streamlit_app.py:145).
    * Computed as ONE pass: intersect/except/union-distinct over the same
    * scan would cost ~6 shuffles; per-customer year flags + conditional
    * counts give identical answers with a single wide shuffle (the flag
    * groupBy) plus a trivial single-partition final agg. At 100 TB the
    * difference is 6 full-data shuffles vs 1. */
  def q10SetOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flags = ord(s, d)
      .select($"o_custkey", year($"o_orderdate").as("y"))
      .where($"y" === 1995 || $"y" === 1996)
      .groupBy($"o_custkey")
      .agg(max(when($"y" === 1995, 1).otherwise(0)).as("y95"),
           max(when($"y" === 1996, 1).otherwise(0)).as("y96"))
    flags.agg(
        sum(when($"y95" === 1 && $"y96" === 1, 1L).otherwise(0L)).as("n_both"),
        sum(when($"y95" === 1 && $"y96" === 0, 1L).otherwise(0L)).as("n_only95"),
        count(lit(1)).as("n_any"))
      .selectExpr("stack(3, 'both', n_both, 'only95', n_only95, 'any', n_any) AS (set_op, n_customers)")
  }

  val q10Sql: String =
    """WITH f AS (SELECT o_custkey,
      |                  max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS y95,
      |                  max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS y96
      |           FROM orders
      |           WHERE year(o_orderdate) IN (1995, 1996)
      |           GROUP BY o_custkey),
      |     c AS (SELECT
      |             CAST(sum(CASE WHEN y95 = 1 AND y96 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      |             CAST(sum(CASE WHEN y95 = 1 AND y96 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only95,
      |             CAST(count(*) AS BIGINT) AS n_any
      |           FROM f)
      |SELECT 'both' AS set_op, n_both AS n_customers FROM c
      |UNION ALL SELECT 'only95', n_only95 FROM c
      |UNION ALL SELECT 'any', n_any FROM c""".stripMargin

  /** Range (theta) join against a tiny in-line band dimension → broadcast
    * nested loop; the band table is broadcast so the fact side never
    * shuffles. */
  def q11RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = s.createDataFrame(Seq(
      ("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e18)))
      .toDF("band", "lo", "hi")
    ord(s, d)
      .join(broadcast(bands), $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 4).as("sum_price"))
  }

  val q11Sql: String =
    """SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
      |FROM orders
      |JOIN (VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
      |             ('high', 150000.0, 1e18)) AS b(band, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band""".stripMargin

  /** Exact deterministic dedup (D1/D3, main.py:54-60 + :96-105): keep one
    * row per (user_id, event_type) with an explicit newest/lowest-key
    * tie-break — row_number, not dropDuplicates, so the survivor is
    * deterministic across engines and cluster re-runs. */
  def q16DedupRowNumber(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"event_id")
    Tables(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"event_id", $"user_id", $"event_type", $"value")
  }

  val q16Sql: String =
    """SELECT event_id, user_id, event_type, value
      |FROM (SELECT event_id, user_id, event_type, value,
      |             row_number() OVER (PARTITION BY user_id, event_type
      |                                ORDER BY event_id) AS rn
      |      FROM events)
      |WHERE rn = 1""".stripMargin

  /** Change-detecting upsert (D2, main.py:140-161): MERGE semantics as a
    * full-outer join + incoming-wins coalesce. `existing` = even events,
    * `incoming` = every third event with a revised value; output is the
    * merged table. In production this runs inside foreachBatch against a
    * partitioned sink (see graft.streaming). */
  def q17MergeUpsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, d, "events").select($"event_id", $"user_id", $"event_type", $"value")
    val existing = ev.where($"event_id" % 2 === 0)
    val incoming = ev.where($"event_id" % 3 === 0)
      .withColumn("value", $"value" * 2.0)
    existing.alias("e")
      .join(incoming.alias("i"), $"e.event_id" === $"i.event_id", "full_outer")
      .select(
        coalesce($"i.event_id", $"e.event_id").as("event_id"),
        coalesce($"i.user_id", $"e.user_id").as("user_id"),
        coalesce($"i.event_type", $"e.event_type").as("event_type"),
        coalesce($"i.value", $"e.value").as("value"))
  }

  val q17Sql: String =
    """WITH existing AS (SELECT event_id, user_id, event_type, value
      |                  FROM events WHERE event_id % 2 = 0),
      |     incoming AS (SELECT event_id, user_id, event_type, value * 2.0 AS value
      |                  FROM events WHERE event_id % 3 = 0)
      |SELECT coalesce(i.event_id, e.event_id) AS event_id,
      |       coalesce(i.user_id, e.user_id) AS user_id,
      |       coalesce(i.event_type, e.event_type) AS event_type,
      |       coalesce(i.value, e.value) AS value
      |FROM existing e FULL OUTER JOIN incoming i ON e.event_id = i.event_id""".stripMargin

  /** Scalar function parity set (§2.9): epoch-day conversions (F1/F2,
    * main.py:34-39), strftime formats (F7), month truncation (F9), days in
    * month (F10), date arithmetic (F11), greatest (F14), lenient cast with
    * 0-fill (F12, streamlit_app.py:105-110). */
  def q18DatetimeFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    ord(s, d)
      .select($"o_orderkey", to_date($"o_orderdate").as("odate"), $"o_totalprice")
      .select(
        $"o_orderkey",
        $"odate",
        datediff($"odate", lit("1970-01-01").cast("date")).cast("long").as("epoch_day"),
        date_add(lit("1970-01-01").cast("date"),
                 datediff($"odate", lit("1970-01-01").cast("date"))).as("roundtrip_date"),
        date_format($"odate", "yyyy-MM-dd").as("fmt_iso"),
        date_format($"odate", "MMM yyyy").as("fmt_month_label"),
        to_date(date_trunc("month", $"odate")).as("month_start"),
        dayofmonth(last_day($"odate")).cast("long").as("days_in_month"),
        date_sub($"odate", 6).as("week_ago"),
        greatest(to_date(date_trunc("month", $"odate")), date_sub($"odate", 6)).as("clamped_start"),
        coalesce(lit(null).cast("double"), lit(0.0)).as("lenient_zero"),
        coalesce($"o_totalprice".cast("double"), lit(0.0)).as("price_coerced"))
  }

  val q18Sql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS odate,
      |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
      |  DATE '1970-01-01' + CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS roundtrip_date,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS fmt_iso,
      |  strftime(CAST(o_orderdate AS DATE), '%b %Y') AS fmt_month_label,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(day(last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_in_month,
      |  CAST(o_orderdate AS DATE) - 6 AS week_ago,
      |  greatest(CAST(date_trunc('month', o_orderdate) AS DATE),
      |           CAST(o_orderdate AS DATE) - 6) AS clamped_start,
      |  coalesce(CAST(NULL AS DOUBLE), 0.0) AS lenient_zero,
      |  coalesce(CAST(o_totalprice AS DOUBLE), 0.0) AS price_coerced
      |FROM orders""".stripMargin

  /** JSON parse (F15, main.py:138 / streamlit_app.py:139): extract typed
    * field from the events.props JSON string, aggregate. Malformed JSON →
    * null (PERMISSIVE), matching the reference's skip-on-parse-error. */
  def q19JsonExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .select($"event_type",
              get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"),
           count(when($"k" > 50, 1)).as("n_high"),
           round(avg($"k"), 6).as("avg_k"))
  }

  val q19Sql: String =
    """SELECT event_type,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  count(CASE WHEN k > 50 THEN 1 END) AS n_high,
      |  round(avg(k), 6) AS avg_k
      |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type""".stripMargin

  /** Rollup (grouping-sets extension of §2.5 — weekly+monthly as one pass):
    * revenue totals at (region, nation), (region), and grand-total levels. */
  def q20Rollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    cust(s, d)
      .join(broadcast(Tables(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, d, "region")), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(round(sum($"c_acctbal"), 4).as("sum_acctbal"), count(lit(1)).as("n_customers"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
              coalesce($"n_name", lit("ALL")).as("nation"),
              $"sum_acctbal", $"n_customers")
  }

  val q20Sql: String =
    """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
      |       round(sum(c_acctbal), 4) AS sum_acctbal, count(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** The salted skew join through the correctness gate: orders ⋈
    * customer, salted 8 ways, aggregated to revenue per market segment.
    * The oracle is the PLAIN join — salting is a physical rewrite and
    * must be answer-transparent, so the gate proves the transparency
    * (round-trip multiplicity, no dropped/duplicated rows), not just a
    * spec on toy data. */
  def q62SaltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    SkewJoin.saltedJoin(
        ord(s, d).select($"o_custkey", $"o_totalprice"),
        cust(s, d).select($"c_custkey".as("o_custkey"), $"c_mktsegment"),
        keys = Seq("o_custkey"), salt = 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           round(sum($"o_totalprice"), 4).as("revenue"))
  }

  val q62Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       round(sum(o_totalprice), 4) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_revenue_by_nation" -> (q3RevenueByNation _),
    "q107_local_supplier_revenue" -> (q107LocalSupplierRevenue _),
    "q4_semi_join" -> (q4SemiJoin _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_top_customers" -> (q6TopCustomers _),
    "q7_top_orders_per_customer" -> (q7TopOrdersPerCustomer _),
    "q8_distinct_agg" -> (q8DistinctAgg _),
    "q9_unpivot" -> (q9Unpivot _),
    "q10_set_ops" -> (q10SetOps _),
    "q11_range_join" -> (q11RangeJoin _),
    "q16_dedup_rownumber" -> (q16DedupRowNumber _),
    "q17_merge_upsert" -> (q17MergeUpsert _),
    "q18_datetime_funcs" -> (q18DatetimeFuncs _),
    "q19_json_extract" -> (q19JsonExtract _),
    "q20_rollup" -> (q20Rollup _),
    "q53_topk_custom" -> (q53TopKCustom _),
    "q62_salted_join" -> (q62SaltedJoin _))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_revenue_by_nation" -> q3Sql,
    "q107_local_supplier_revenue" -> q107Sql,
    "q4_semi_join" -> q4Sql,
    "q5_anti_join" -> q5Sql,
    "q6_top_customers" -> q6Sql,
    "q7_top_orders_per_customer" -> q7Sql,
    "q8_distinct_agg" -> q8Sql,
    "q9_unpivot" -> q9Sql,
    "q10_set_ops" -> q10Sql,
    "q11_range_join" -> q11Sql,
    "q16_dedup_rownumber" -> q16Sql,
    "q17_merge_upsert" -> q17Sql,
    "q18_datetime_funcs" -> q18Sql,
    "q19_json_extract" -> q19Sql,
    "q20_rollup" -> q20Sql,
    "q53_topk_custom" -> q53Sql,
    "q62_salted_join" -> q62Sql)
}
