package graft.operators

import graft.Tables
import graft.functions.TypedAggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extended operator coverage beyond the reference's direct surface:
  * pivot (the inverse of R1's melt), correlated subqueries, exact
  * percentiles/statistics, approximate aggregates for the 100 TB path,
  * string-function parity (F5/F6/F13 family), conditional aggregation,
  * and a typed custom Aggregator.
  */
object Extended {

  /** Pivot wide (inverse of R1's melt, §2.8): daily value totals per
    * event type as columns. The pivot value list is EXPLICIT — with it,
    * Spark needs no extra distinct-scan job and output columns are
    * deterministic for the oracle. */
  def q38Pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .select(to_date($"ts").as("day"), $"event_type", $"value")
      .groupBy($"day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(sum($"value"))
  }

  val q38Sql: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  sum(CASE WHEN event_type = 'click' THEN value END) AS click,
      |  sum(CASE WHEN event_type = 'error' THEN value END) AS error,
      |  sum(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
      |  sum(CASE WHEN event_type = 'signup' THEN value END) AS signup,
      |  sum(CASE WHEN event_type = 'view' THEN value END) AS view
      |FROM events GROUP BY 1""".stripMargin

  /** Correlated scalar subquery (decorrelated by Catalyst into the join
    * Spark would plan anyway): customers with above-nation-average
    * balance. */
  def q39CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, d, "customer")
    c.as("c").join(
        c.groupBy($"c_nationkey".as("nk")).agg(avg($"c_acctbal").as("nation_avg")),
        $"c.c_nationkey" === $"nk")
      .where($"c_acctbal" > $"nation_avg")
      .select($"c_custkey", $"c_name", $"c_acctbal", round($"nation_avg", 4).as("nation_avg"))
  }

  val q39Sql: String =
    """SELECT c_custkey, c_name, c_acctbal,
      |       round((SELECT avg(c2.c_acctbal) FROM customer c2
      |              WHERE c2.c_nationkey = c.c_nationkey), 4) AS nation_avg
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin

  /** Exact order statistics per group: interpolated percentiles, sample
    * stddev/variance, correlation. (The approximate 100 TB variants are
    * q41.) */
  def q40Percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(stddev($"o_totalprice"), 4).as("sd"),
        round(var_samp($"o_totalprice"), 2).as("variance"),
        round(corr($"o_totalprice", $"o_custkey"), 6).as("price_cust_corr"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"))
  }

  val q40Sql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  round(stddev(o_totalprice), 4) AS sd,
      |  round(var_samp(o_totalprice), 2) AS variance,
      |  round(corr(o_totalprice, o_custkey), 6) AS price_cust_corr,
      |  min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Approximate aggregates — the 100 TB path where exact distinct counts
    * and percentiles don't fit memory: HLL++ approx_count_distinct and
    * approx_percentile. NO oracle entry: sketch implementations differ
    * across engines by design; the driver's rows-only check applies, and
    * ApproxSpec bounds the error vs exact counts. */
  def q41ApproxAggs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        approx_count_distinct($"l_partkey", 0.01).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5)").as("approx_median_price"),
        count(lit(1)).as("n_rows"))
  }

  /** String-function parity (F5/F6/F13 family) over part names: case
    * mapping, padding, replace, split-part, translate, edit distance,
    * formatted labels. */
  def q42StringFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "part")
      .select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        lower($"p_type").as("ltype"),
        lpad($"p_partkey".cast("string"), 8, "0").as("padded_key"),
        regexp_replace($"p_name", " ", "_").as("snake_name"),
        substring_index($"p_brand", "#", -1).as("brand_num"),
        translate($"p_name", "aeiou", "AEIOU").as("vowels_up"),
        levenshtein($"p_name", lit("small widget")).as("edit_dist"),
        format_string("%s [%s]", $"p_name", $"p_brand").as("label"),
        reverse($"p_name").as("rname"),
        // F13: replace + capitalize (streamlit_app.py:452 et al.)
        initcap(regexp_replace($"p_type", "PROMO", "promoted")).as("type_label"),
        length($"p_name").cast("long").as("name_len"))
  }

  val q42Sql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS uname,
      |  lower(p_type) AS ltype,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
      |  replace(p_name, ' ', '_') AS snake_name,
      |  split_part(p_brand, '#', -1) AS brand_num,
      |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
      |  levenshtein(p_name, 'small widget') AS edit_dist,
      |  printf('%s [%s]', p_name, p_brand) AS label,
      |  reverse(p_name) AS rname,
      |  array_to_string([upper(left(w, 1)) || substr(w, 2)
      |                   FOR w IN string_split(lower(replace(p_type, 'PROMO', 'promoted')), ' ')],
      |                  ' ') AS type_label,
      |  CAST(length(p_name) AS BIGINT) AS name_len
      |FROM part""".stripMargin

  /** Conditional aggregation + argmax selection: count_if shapes (A12's
    * loaded/skipped counters) and max_by/min_by (A11's argmax as an
    * aggregate). */
  def q43ConditionalAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .groupBy($"event_type")
      .agg(
        count(when($"value" > 100, 1)).as("n_high"),
        count(when($"value" <= 100, 1)).as("n_low"),
        // argmax score is (value, event_id) composite — bare max_by on
        // value picks an ARBITRARY row among ties (real at sf0.1: value
        // has 2 decimals, 100k rows). value*1e9 + id stays exact in a
        // double (< 2^53) and is strictly monotonic in the pair.
        max_by($"event_id", $"value" * 1e9 + $"event_id").as("top_event_id"),
        min_by($"event_id", $"value" * 1e9 + $"event_id").as("bottom_event_id"),
        round(avg(when($"user_id" % 2 === 0, $"value")), 6).as("avg_even_users"))
  }

  val q43Sql: String =
    """SELECT event_type,
      |  count(CASE WHEN value > 100 THEN 1 END) AS n_high,
      |  count(CASE WHEN value <= 100 THEN 1 END) AS n_low,
      |  max_by(event_id, value * 1e9 + event_id) AS top_event_id,
      |  min_by(event_id, value * 1e9 + event_id) AS bottom_event_id,
      |  round(avg(CASE WHEN user_id % 2 = 0 THEN value END), 6) AS avg_even_users
      |FROM events GROUP BY event_type""".stripMargin

  /** Custom typed Aggregator (§2.11's reserve path): geometric mean of
    * order totals per priority via TypedAggregators.GeometricMean —
    * exercised through the untyped agg surface so it plugs into a
    * normal groupBy. */
  def q44GeometricMean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .groupBy($"o_orderpriority")
      .agg(round(TypedAggregators.geometricMean($"o_totalprice"), 4).as("geo_mean_price"),
           count(lit(1)).as("n_orders"))
  }

  val q44Sql: String =
    """SELECT o_orderpriority,
      |  round(exp(avg(ln(o_totalprice))), 4) AS geo_mean_price,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** CUBE — all 2^2 grouping combinations in one pass (SURVEY §2.5's
    * "weekly and monthly as one GROUPING SETS pass" idea, fully general):
    * revenue by (status, priority), by each alone, and grand total, with
    * grouping-level indicators. */
  def q51Cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(sum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        round($"revenue", 4).as("revenue"), $"n_orders")
  }

  val q51Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       round(sum(o_totalprice), 4) AS revenue,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Fixed-width histogram of event values per event type: 20 equal
    * bins over the GLOBAL [min, max] — the distribution profile behind
    * every data-quality dashboard. The bounds are a broadcast scalar, so
    * binning is a per-row map and the aggregate is one combiner-friendly
    * shuffle of (type, bin) — never a sort, never a per-type pass. The
    * bin index clamps the value == max edge into the last bin; both
    * engines compute bin and bounds from the same double arithmetic, so
    * results align bit-for-bit. Degenerate input (every value equal, so
    * hi == lo and w == 0) is special-cased to bin 0 in BOTH engines —
    * without it Spark's floor(NaN) and DuckDB's least(NaN, 19.0) paths
    * diverge (ADVICE r4). */
  def q76Histogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, d, "events").select($"event_type", $"value")
    val bounds = ev.agg(min($"value").as("lo"), max($"value").as("hi"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("w", ($"hi" - $"lo") / 20.0)
      .withColumn("bin",
        when($"w" === 0.0, lit(0L))
          .otherwise(least(floor(($"value" - $"lo") / $"w"), lit(19.0)).cast("long")))
      .withColumn("bin_lo", round($"lo" + $"bin" * $"w", 6))
      .withColumn("bin_hi", round($"lo" + ($"bin" + 1) * $"w", 6))
      .groupBy($"event_type", $"bin", $"bin_lo", $"bin_hi")
      .agg(count(lit(1)).as("n"))
  }

  val q76Sql: String =
    """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
      |binned AS (
      |  SELECT event_type,
      |         CASE WHEN hi = lo THEN 0
      |              ELSE CAST(least(floor((value - lo) / ((hi - lo) / 20.0)), 19.0) AS BIGINT)
      |         END AS bin,
      |         lo, (hi - lo) / 20.0 AS w
      |  FROM events, b)
      |SELECT event_type, bin,
      |       round(lo + bin * w, 6) AS bin_lo,
      |       round(lo + (bin + 1) * w, 6) AS bin_hi,
      |       count(*) AS n
      |FROM binned GROUP BY 1, 2, 3, 4""".stripMargin

  /** q108 — table column profiler (the pre-training data-quality sweep;
    * q93 is the same idea for embedding dimensions): per numeric
    * lineitem measure, row/null/zero counts and min/max/mean, computed
    * in ONE aggregate pass — a single partial→final combine producing
    * one row, melted to per-column rows AFTER the aggregate, so the
    * reshape costs nothing at any scale. The profile of a 100 TB table
    * is one scan, one 1-row shuffle. */
  def q108ColumnProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}_n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nnull"),
        sum(when(col(c) === 0.0, 1L).otherwise(0L)).as(s"${c}_nzero"),
        round(min(col(c)), 6).as(s"${c}_min"),
        round(max(col(c)), 6).as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_mean"))
    }
    val one = Tables(s, d, "lineitem").agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
      s"'$c', ${c}_n, ${c}_nnull, ${c}_nzero, ${c}_min, ${c}_max, ${c}_mean")
      .mkString(s"stack(${cols.size}, ", ", ", ")")
    one.select(expr(
      s"$stackExpr AS (column_name, n, n_null, n_zero, min_val, max_val, mean_val)"))
  }

  val q108Sql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(sum(CASE WHEN $c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  round(min($c), 6) AS min_val, round(max($c), 6) AS max_val,
        |  round(avg($c), 6) AS mean_val
        |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** The candidate functional dependencies q159 audits:
    * (table, determinant, dependent). A deliberate mix of FDs that HOLD
    * (key → attribute) and FDs that are violated (the dirty-data
    * signal), so the report exercises both verdicts. */
  val FdCandidates: Seq[(String, String, String)] = Seq(
    ("orders", "o_orderkey", "o_custkey"),        // key FD — must hold
    ("orders", "o_custkey", "o_orderpriority"),   // violated: customers change priority
    ("part", "p_partkey", "p_name"),              // key FD — must hold
    ("part", "p_name", "p_brand"),                // violated: names span brands
    ("part", "p_brand", "p_type"))                // violated: brands span types

  /** q159 — functional-dependency audit (data profiling's schema-rule
    * checker, q108's column profile lifted to CROSS-column rules): for
    * each candidate determinant→dependent pair, how many determinant
    * values exist, how many map to MORE than one dependent (the FD
    * violations), the worst fan-out, and the verdict. The op a pipeline
    * runs before trusting a column as a join/merge key — q17's MERGE
    * and the ER family's golden records both assume their keys
    * determine their payloads, and this is the instrument that checks
    * it. Per FD: one partial-aggregated distinct-count keyed by the
    * determinant, then a table-sized rollup to ONE row — at 100 TB each
    * FD costs exactly its groupBy shuffle, and the output is bounded by
    * the candidate list. */
  def q159FdAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    FdCandidates.map { case (t, det, dep) =>
      Tables(s, d, t)
        .groupBy(col(det)).agg(countDistinct(col(dep)).as("nd"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(when($"nd" > 1, 1L).otherwise(0L)).as("n_violating_keys"),
          max($"nd").as("max_deps_per_key"))
        .select(
          lit(t).as("table_name"), lit(det).as("determinant"),
          lit(dep).as("dependent"), $"n_keys", $"n_violating_keys",
          $"max_deps_per_key",
          round($"n_violating_keys".cast("double") / $"n_keys".cast("double"), 6)
            .as("violation_rate"),
          ($"max_deps_per_key" === 1L).as("holds"))
    }.reduce(_ union _)
  }

  val q159Sql: String =
    FdCandidates.map { case (t, det, dep) =>
      s"""SELECT '$t' AS table_name, '$det' AS determinant, '$dep' AS dependent,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
        |  CAST(max(nd) AS BIGINT) AS max_deps_per_key,
        |  round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE), 6) AS violation_rate,
        |  max(nd) = 1 AS holds
        |FROM (SELECT $det, count(DISTINCT $dep) AS nd FROM $t GROUP BY $det) g""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** The foreign-key relationships q160 audits:
    * (child table, child key, parent table, parent key). */
  val FkCandidates: Seq[(String, String, String, String)] = Seq(
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"))

  /** q160 — referential-integrity audit (q159's FD checker for the
    * OTHER schema rule joins depend on): per declared foreign key, how
    * many child rows exist, how many are orphans (no matching parent),
    * how many distinct orphan key values carry them, and the verdict.
    * An inner join silently DROPS orphan rows — at 100 TB that is data
    * loss nobody sees — so this audit is what a pipeline runs before
    * trusting inner-join semantics between two tables. Plan shape: the
    * orphan probe is one LEFT ANTI join per FK on the key — the child
    * side shuffles once (or the parent broadcasts when it is
    * dimension-sized, AQE's call), and the per-FK output is one row. */
  def q160RiAudit(s: SparkSession, d: String): DataFrame =
    FkCandidates.map { case (ct, ck, pt, pk) =>
      riAuditOne(Tables(s, d, ct), ck, Tables(s, d, pt), pk, ct, pt)
    }.reduce(_ union _)

  /** One FK's audit row — the unit q160 unions, exposed so a spec can
    * drive it with a deliberately-dirty pair (the shipped fixture is
    * referentially CLEAN, so the orphan path never fires on it). */
  private[graft] def riAuditOne(childT: DataFrame, ck: String,
      parentT: DataFrame, pk: String, ct: String, pt: String): DataFrame = {
    val s = childT.sparkSession
    import s.implicits._
    // r20 (guide §2.4): ONE child pass — the old shape scanned the child
    // twice (anti-join for orphans + a separate totals count) and
    // cross-joined the two 1-row aggregates. A left join against the
    // distinct parent keys (dimension-sized, AQE broadcasts) tags each
    // child row orphan/matched, and one conditional aggregate emits all
    // three counts; countDistinct ignores the nulls of matched rows.
    val child = childT.select(col(ck).as("k"))
    val parent = parentT.select(col(pk).as("k"), lit(1).as("hit")).distinct()
    child.join(parent, Seq("k"), "left")
      .agg(count(lit(1)).as("n_child_rows"),
        count(when($"hit".isNull, lit(1))).as("n_orphan_rows"),
        countDistinct(when($"hit".isNull, $"k")).as("n_orphan_keys"))
      .select(
        lit(ct).as("child_table"), lit(ck).as("child_key"),
        lit(pt).as("parent_table"), lit(pk).as("parent_key"),
        $"n_child_rows", $"n_orphan_rows",
        $"n_orphan_keys".cast("long").as("n_orphan_keys"),
        round($"n_orphan_rows".cast("double") / $"n_child_rows".cast("double"), 6)
          .as("orphan_rate"),
        ($"n_orphan_rows" === 0L).as("intact"))
  }

  val q160Sql: String =
    FkCandidates.map { case (ct, ck, pt, pk) =>
      s"""SELECT '$ct' AS child_table, '$ck' AS child_key,
        |  '$pt' AS parent_table, '$pk' AS parent_key,
        |  (SELECT count(*) FROM $ct) AS n_child_rows,
        |  count(*) AS n_orphan_rows,
        |  CAST(count(DISTINCT c.$ck) AS BIGINT) AS n_orphan_keys,
        |  round(CAST(count(*) AS DOUBLE)
        |        / CAST((SELECT count(*) FROM $ct) AS DOUBLE), 6) AS orphan_rate,
        |  count(*) = 0 AS intact
        |FROM $ct c
        |WHERE NOT EXISTS (SELECT 1 FROM $pt p WHERE p.$pk = c.$ck)""".stripMargin
    }.mkString("\nUNION ALL\n")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q160_ri_audit" -> (q160RiAudit _),
    "q159_fd_audit" -> (q159FdAudit _),
    "q108_column_profile" -> (q108ColumnProfile _),
    "q51_cube" -> (q51Cube _),
    "q38_pivot" -> (q38Pivot _),
    "q39_correlated_subquery" -> (q39CorrelatedSubquery _),
    "q40_percentiles" -> (q40Percentiles _),
    "q41_approx_aggs" -> (q41ApproxAggs _),
    "q42_string_funcs" -> (q42StringFuncs _),
    "q43_conditional_agg" -> (q43ConditionalAgg _),
    "q44_geometric_mean" -> (q44GeometricMean _),
    "q76_histogram" -> (q76Histogram _))

  /** q41 intentionally omitted: approximate sketches are engine-specific. */
  val oracleSql: Map[String, String] = Map(
    "q160_ri_audit" -> q160Sql,
    "q159_fd_audit" -> q159Sql,
    "q108_column_profile" -> q108Sql,
    "q51_cube" -> q51Sql,
    "q38_pivot" -> q38Sql,
    "q39_correlated_subquery" -> q39Sql,
    "q40_percentiles" -> q40Sql,
    "q42_string_funcs" -> q42Sql,
    "q43_conditional_agg" -> q43Sql,
    "q44_geometric_mean" -> q44Sql,
    "q76_histogram" -> q76Sql)
}
