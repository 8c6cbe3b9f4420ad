package graft

import graft.operators.Reports
import org.apache.spark.sql.functions._

/** The four report queries' semantic traps (SURVEY §7.4): three different
  * average denominators, ISO week boundaries, null gap preservation. */
class ReportsSpec extends SparkSpec {

  private def gold(rows: (String, String, String, Double, Double, Double, Double)*) = {
    import spark.implicits._
    rows.toSeq
      .toDF("date_s", "meal", "food_entry_name", "calories", "carbohydrate", "fat", "protein")
      .withColumn("date", col("date_s").cast("date"))
      .withColumn("food_entry_description", lit("d"))
      .drop("date_s")
  }

  test("latestDay: picks argmax date and sums only that day (A11/A1/P4)") {
    val g = gold(
      ("2026-04-01", "b", "x", 100.0, 1, 1, 1),
      ("2026-04-03", "b", "x", 200.0, 1, 1, 1),
      ("2026-04-03", "l", "y", 50.0, 1, 1, 1))
    val (summary, detail) = Reports.latestDay(g)
    assert(summary.collect().head.getAs[Double]("total_calories") === 250.0)
    assert(detail.count() === 2)
    assert(detail.collect().map(_.getAs[String]("meal")).toSeq === Seq("b", "l")) // sorted by meal
  }

  test("dateRange: calendar densification keeps null gaps; averages divide by CALENDAR days (J1/A3/A4)") {
    val g = gold(
      ("2026-04-01", "b", "x", 100.0, 10, 10, 10),
      ("2026-04-03", "b", "x", 200.0, 10, 10, 10))
    val (densified, summary) = Reports.dateRange(g, "2026-04-01", "2026-04-05")
    val rows = densified.orderBy("date").collect()
    assert(rows.length === 5) // full calendar, not just logged days
    assert(rows(1).isNullAt(rows(1).fieldIndex("total_calories"))) // Apr 2 gap stays null
    // A4: 300 total / 5 CALENDAR days (not 2 logged days)
    assert(summary.collect().head.getAs[Double]("avg_calories_per_day") === 60.0)
  }

  test("weekly: ISO year-of-week on Dec29–Jan3 boundary (F8, SURVEY §7.4 #2)") {
    // 2025-12-29 is ISO week 1 of 2026
    val g = gold(("2025-12-29", "b", "x", 700.0, 100, 100, 100))
    val r = Reports.weekly(g).collect().head
    assert(r.getAs[Int]("iso_year") === 2026)
    assert(r.getAs[Int]("iso_week") === 1)
    // A6: divide by FIXED 7 even though 1 day logged
    assert(r.getAs[Double]("avg_calories_per_day") === 100.0)
    // A7: macro ratios are % of total macro grams
    assert(math.abs(r.getAs[Double]("carbohydrate_ratio") - 100.0 / 3) < 1e-9)
  }

  test("monthly: averages divide by DAYS IN MONTH (A9/F10)") {
    val g = gold(
      ("2024-02-10", "b", "x", 290.0, 1, 1, 1), // Feb 2024: 29 days (leap)
      ("2024-02-11", "b", "x", 290.0, 1, 1, 1))
    val r = Reports.monthly(g).collect().head
    assert(r.getAs[java.sql.Date]("month_start").toString === "2024-02-01")
    assert(r.getAs[Long]("days_logged") === 2L)
    assert(r.getAs[Double]("avg_calories_per_day") === 20.0) // 580/29
    assert(r.getAs[String]("month_label") === "Feb 2024")
  }

  test("meltMacros: unpivot preserves sums (R1 invariant)") {
    val g = gold(("2026-04-01", "b", "x", 100.0, 10, 20, 30))
    val wide = Reports.dailyTotals(g)
    val long = Reports.meltMacros(wide, "date")
    assert(long.count() === 3)
    val total = long.agg(sum("amount_g")).collect().head.getDouble(0)
    assert(total === 60.0)
  }
}
