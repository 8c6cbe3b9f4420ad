package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference dashboard's four report queries (calorista/
  * streamlit_app.py) as pure DataFrame→DataFrame functions over the
  * silver food-entry table (SURVEY §7.1 module 4).
  *
  * Each function assumes the D3 read-time dedup (Dedup.dedupRead) has
  * already run — matching the dashboard's cached gold frame
  * (streamlit_app.py:114-161). All four share one scan when the caller
  * persists the gold frame, mirroring st.cache_data.
  *
  * THE THREE AVERAGE DENOMINATORS DIFFER BY DESIGN (SURVEY §7.4 #1):
  * date-range averages divide by CALENDAR days in range; weekly averages
  * by a FIXED 7; monthly averages by DAYS IN THE MONTH.
  */
object Reports {

  private val macros = Seq("calories", "carbohydrate", "fat", "protein")

  private def sums(cols: Seq[String]): Seq[Column] =
    cols.map(c => sum(col(c)).as(s"total_$c"))

  /** Latest-day report (streamlit_app.py:225-265): argmax date (A11),
    * equality filter (P4), global sums (A1), display projection + sort
    * by meal (P6/O1). Returns (summary, detail). */
  def latestDay(gold: DataFrame): (DataFrame, DataFrame) = {
    val s = gold.sparkSession
    import s.implicits._
    val latest = gold.agg(max($"date").as("latest_date"))
    val day = gold.join(broadcast(latest), $"date" === $"latest_date").drop("latest_date")
    val summary = day.agg(sums(macros).head, sums(macros).tail: _*)
    val detail = day
      .select($"meal", $"food_entry_name", $"food_entry_description",
        $"calories", $"carbohydrate", $"fat", $"protein")
      .orderBy($"meal")
    (summary, detail)
  }

  /** Daily totals (A2, streamlit_app.py:315-324). */
  def dailyTotals(gold: DataFrame): DataFrame = {
    val s = gold.sparkSession
    import s.implicits._
    gold.groupBy($"date").agg(sums(macros).head, sums(macros).tail: _*)
  }

  /** Date-range report (streamlit_app.py:267-376): BETWEEN filter (P5),
    * daily totals (A2), calendar densification preserving null gaps (J1),
    * period totals skipping nulls (A3), per-CALENDAR-day averages (A4).
    * Returns (densified daily series, period summary). */
  def dateRange(gold: DataFrame, start: String, end: String): (DataFrame, DataFrame) = {
    val s = gold.sparkSession
    import s.implicits._
    val lo = lit(start).cast("date")
    val hi = lit(end).cast("date")
    val daily = dailyTotals(gold.where($"date".between(lo, hi)))
    val calendar = s.range(1)
      .select(explode(sequence(lo, hi, expr("interval 1 day"))).as("date"))
    val densified = calendar.join(daily, Seq("date"), "left") // gaps stay null
    val nDays = datediff(hi, lo) + 1
    val summary = densified
      .agg(sums(macros.map(m => s"total_$m")).head,
           sums(macros.map(m => s"total_$m")).tail: _*)
      .toDF(macros.map(m => s"period_total_$m"): _*)
      .select(macros.flatMap(m => Seq(
        col(s"period_total_$m"),
        (coalesce(col(s"period_total_$m"), lit(0.0)) / nDays).as(s"avg_${m}_per_day"))): _*)
    (densified, summary)
  }

  /** Weekly report (streamlit_app.py:378-508): ISO (year, week) keys via
    * YEAROFWEEK — not year(), the Dec29–Jan3 trap (F8) — sums, week_start
    * = min(date) (A5), days_logged = countDistinct, fixed-7 averages
    * (A6), macro ratios as % of total macro grams (A7), week label (F6/F7).
    */
  def weekly(gold: DataFrame): DataFrame = {
    val s = gold.sparkSession
    import s.implicits._
    val totalMacros = $"total_carbohydrate" + $"total_fat" + $"total_protein"
    gold
      .groupBy(expr("extract(YEAROFWEEK FROM date)").cast("int").as("iso_year"),
               weekofyear($"date").as("iso_week"))
      .agg(sums(macros).head,
        (sums(macros).tail :+ min($"date").as("week_start") :+
          countDistinct($"date").as("days_logged")): _*)
      .withColumn("week_label",
        format_string("Week %d (%s)", $"iso_week",
          date_format($"week_start", "MMM dd")))
      .withColumn("avg_calories_per_day", $"total_calories" / 7)
      .withColumn("carbohydrate_ratio", $"total_carbohydrate" / totalMacros * 100)
      .withColumn("fat_ratio", $"total_fat" / totalMacros * 100)
      .withColumn("protein_ratio", $"total_protein" / totalMacros * 100)
      .orderBy($"iso_year", $"iso_week")
  }

  /** Monthly report (streamlit_app.py:510-602): month truncation (F9),
    * sums + days_logged (A8), averages over DAYS IN MONTH via last_day
    * (A9/F10), "MMM yyyy" label (F7). */
  def monthly(gold: DataFrame): DataFrame = {
    val s = gold.sparkSession
    import s.implicits._
    gold
      .groupBy(to_date(date_trunc("month", $"date")).as("month_start"))
      .agg(sums(macros).head,
        (sums(macros).tail :+ countDistinct($"date").as("days_logged")): _*)
      .withColumn("month_label", date_format($"month_start", "MMM yyyy"))
      .withColumn("avg_calories_per_day",
        $"total_calories" / dayofmonth(last_day($"month_start")))
      .orderBy($"month_start")
  }

  /** R1 — melt/unpivot wide→long (streamlit_app.py:346-351 et al.),
    * with the reference's label cleanup (F13: strip total_ prefix,
    * capitalize). */
  def meltMacros(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol),
      expr("""stack(3, 'Carbohydrate', total_carbohydrate,
                        'Fat', total_fat,
                        'Protein', total_protein) AS (macronutrient, amount_g)"""))
}
