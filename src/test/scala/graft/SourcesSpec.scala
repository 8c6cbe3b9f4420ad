package graft

import graft.sources.Ingest
import java.nio.file.{Files, Paths}
import java.time.{Clock, Instant, ZoneOffset}

/** S3 monthly extract, S5 exercises extract, F3 injectable tz-clock. */
class SourcesSpec extends SparkSpec {

  private def writeDay(root: String, day: String, doc: String): Unit = {
    val dir = Paths.get(root, s"day=$day")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("data.json"), doc)
  }

  private def foodDoc(id: String, dateInt: String): String =
    s"""{"food_entries": {"food_entry": [{"food_entry_id": "$id", "id": "$id",
       |"date_int": "$dateInt", "timestamp": "1775001600", "meal": "lunch",
       |"food_entry_name": "n", "food_entry_description": "d",
       |"calories": "100", "carbohydrate": "10", "fat": "1", "protein": "5",
       |"fiber": "1", "sugar": "1", "sodium": "10", "number_of_units": "1"}]}}"""
      .stripMargin.replace("\n", " ")

  test("S3: monthly extract reads only the requested month via partition pruning") {
    val root = Files.createTempDirectory("graft-monthly").toString
    writeDay(root, "2026-03-05", foodDoc("a", "20517")) // 2026-03-05
    writeDay(root, "2026-03-20", foodDoc("b", "20532"))
    writeDay(root, "2026-04-02", foodDoc("c", "20545"))

    val df = Ingest.readSilverMonth(spark, root, "2026-03")
    val ids = df.collect().map(_.getAs[String]("food_entry_id")).toSet
    assert(ids == Set("a", "b"))
    // the month predicate must reach the file listing as a PartitionFilter,
    // not run as a post-scan filter over all days
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(!plan.contains("PartitionFilters: []"), plan)
  }

  test("S5: exercises envelope parses to a typed Dataset with lenient numerics") {
    val root = Files.createTempDirectory("graft-exercises").toString
    writeDay(root, "2026-04-02",
      """{"exercises": {"exercise": [
        |{"exercise_id": "1", "exercise_name": "Running", "minutes": "30", "calories": "340.5"},
        |{"exercise_id": "2", "exercise_name": "Walking", "minutes": "junk", "calories": null}]}}"""
        .stripMargin.replace("\n", " "))
    // single-exercise day delivered as a bare object (F16 dict-or-list)
    writeDay(root, "2026-04-03",
      """{"exercises": {"exercise": {"exercise_id": "3", "exercise_name": "Rest", "minutes": "0", "calories": "0"}}}""")

    val all = Ingest.readExercises(spark, root).collect()
    assert(all.map(_.exercise_id).toSet == Set("1", "2", "3"))
    val walking = all.find(_.exercise_id == "2").get
    assert(walking.minutes == 0.0 && walking.calories == 0.0) // F12 0-fill
    assert(all.find(_.exercise_id == "1").get.calories == 340.5)

    val filtered = Ingest.readExercises(spark, root, Some("2026-04-03")).collect()
    assert(filtered.map(_.exercise_id).toSet == Set("3"))
  }

  test("F3: 'today' is timezone-aware and clock-injectable") {
    // 23:30 UTC on Apr 2 is already Apr 3 in Kyiv (UTC+3 in summer)
    val fixed = Clock.fixed(Instant.parse("2026-04-02T23:30:00Z"), ZoneOffset.UTC)
    assert(Clocks.today("UTC", fixed).toString == "2026-04-02")
    assert(Clocks.today(Clocks.ReferenceZone, fixed).toString == "2026-04-03")
    val (start, end) = Clocks.lastNDays(7, Clocks.ReferenceZone, fixed)
    assert(start.toString == "2026-03-28" && end.toString == "2026-04-03")
    // same clock, same range — replay determinism
    assert(Clocks.lastNDays(7, Clocks.ReferenceZone, fixed) == (start, end))
  }
}
