package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._

/** Bronze→silver ingest semantics, one test per FIXTURES.md §1 variant
  * (each pins a reference behavior, cites in Ingest's scaladoc). */
class IngestSpec extends SparkSpec {

  private def entryJson(
      id: String = "118217751",
      dateInt: String = "\"20545\"",
      ts: String = "\"1775001600\"",
      calories: String = "\"210\"",
      fiber: String = "\"5.0\"",
      extra: String = ""): String =
    s"""{"food_entry_id": "$id", "id": "$id", "date_int": $dateInt,
        "timestamp": $ts, "meal": "breakfast",
        "food_entry_name": "Oatmeal", "food_entry_description": "desc",
        "calories": $calories, "carbohydrate": "35.5", "fat": "3.6",
        "protein": "7.4", "fiber": $fiber, "sugar": "1.1",
        "sodium": "115", "number_of_units": "1.5"$extra}"""

  private def envelope(payload: String): String =
    s"""{"food_entries": {"food_entry": $payload}}"""

  private def parse(docs: String*) = {
    import spark.implicits._
    val raw = docs.toSeq.toDF("json").withColumn("day", lit("2026-04-03").cast("date"))
    Ingest.toSilver(Ingest.parseEnvelope(raw))
  }

  test("day_normal: array of entries parses to typed rows") {
    val out = parse(envelope(s"[${entryJson()}, ${entryJson(id = "2")}]")).collect()
    assert(out.length === 2)
    val r = out.find(_.getAs[String]("food_entry_id") == "118217751").get
    assert(r.getAs[Int]("date_int") === 20545)
    assert(r.getAs[java.sql.Date]("date").toString === "2026-04-02") // 1970-01-01 + 20545d
    assert(r.getAs[Double]("calories") === 210.0)
    assert(r.getAs[Long]("timestamp") === 1775001600L)
  }

  test("day_single_as_dict: bare object is normalized to 1-element array (main.py:88-89)") {
    val out = parse(envelope(entryJson())).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("food_entry_id") === "118217751")
  }

  test("day_empty: null food_entries → zero rows, no failure (main.py:82-85)") {
    assert(parse("""{"food_entries": null}""").count() === 0)
    assert(parse("""{"food_entries": {"food_entry": null}}""").count() === 0)
  }

  test("day_missing_id: entry without food_entry_id dropped (main.py:94-95)") {
    val noId = entryJson().replace(""""food_entry_id": "118217751",""", "")
    val out = parse(envelope(s"[$noId, ${entryJson(id = "keep")}]")).collect()
    assert(out.map(_.getAs[String]("food_entry_id")).toSeq === Seq("keep"))
  }

  test("day_bad_numeric: unparseable/null/missing numerics → 0.0 (models.py:53-55)") {
    val bad = entryJson(calories = "\"abc\"", fiber = "null")
      .replace(""""sugar": "1.1",""", "")
    val r = parse(envelope(s"[$bad]")).collect().head
    assert(r.getAs[Double]("calories") === 0.0)
    assert(r.getAs[Double]("fiber") === 0.0)
    assert(r.getAs[Double]("sugar") === 0.0)
    assert(r.getAs[Double]("fat") === 3.6) // good values untouched
  }

  test("date_int tolerates float strings, drops unparseable (main.py:34-39)") {
    val floaty = entryJson(id = "f", dateInt = "\"20545.0\"")
    val bad = entryJson(id = "b", dateInt = "\"notanumber\"")
    val out = parse(envelope(s"[$floaty, $bad]")).collect()
    assert(out.map(_.getAs[String]("food_entry_id")).toSeq === Seq("f"))
    assert(out.head.getAs[Int]("date_int") === 20545)
  }

  test("day_malformed: invalid JSON document skipped (streamlit_app.py:147-148)") {
    val out = parse("{not json at all", envelope(s"[${entryJson()}]"))
    assert(out.count() === 1)
  }

  test("epoch-day roundtrip: date == 1970-01-01 + date_int (F1/F2)") {
    import spark.implicits._
    val out = parse(envelope(s"[${entryJson()}]"))
      .select(datediff($"date", lit("1970-01-01").cast("date")).as("back"), $"date_int")
      .collect().head
    assert(out.getAs[Int]("back") === out.getAs[Int]("date_int"))
  }

  test("silver write/read roundtrip is date-partitioned and prunable (S8/S9)") {
    val dir = java.nio.file.Files.createTempDirectory("silver").toString
    val silver = parse(envelope(s"[${entryJson()}]"))
    Ingest.writeSilver(silver, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1)
    // partition dir exists → day-key access is partition pruning, not scan
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("date=")))
  }
}
