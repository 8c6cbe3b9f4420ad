package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Oracle coverage for the bronze→silver ingest slice (S1/S2/P1-P3/F1/
  * F12/F16): a deterministic on-disk JSON fixture set that BOTH engines
  * read — Spark through [[Ingest.readSilver]], DuckDB through
  * `read_json` in [[q52Sql]] — so the ingest pipeline gets a real
  * CORRECTNESS row instead of ScalaTest-only coverage.
  *
  * The fixture exercises every lenient-parse branch the reference has:
  * a normal multi-entry day, junk numerics → 0.0 (models.py:53-55), a
  * missing required key → row dropped (main.py:94-95), an unparseable
  * date → row dropped (main.py:125-128), a bare-object single-entry day
  * (main.py:88-89), a malformed document → dropped (P1), and a null
  * envelope. Content is byte-deterministic: same rows every run, any SF.
  */
object IngestFixtures {

  /** Fixed absolute path: the oracle SQL must name the same files the
    * Spark side reads, and oracle SQL is a static string. */
  val root: String = "/tmp/graft_ingest_fixtures"

  private def entry(
      id: String, dateInt: String, ts: String, meal: String, name: String,
      desc: String, calories: String): String =
    s"""{"food_entry_id": $id, "id": $id, "date_int": "$dateInt",
       |"timestamp": $ts, "meal": "$meal", "food_entry_name": "$name",
       |"food_entry_description": "$desc", "calories": "$calories",
       |"carbohydrate": "35.5", "fat": "3.6", "protein": "7.4",
       |"fiber": "5.0", "sugar": "1.1", "sodium": "115",
       |"number_of_units": "1.5"}""".stripMargin.replace("\n", " ")

  /** Idempotently materialize the fixture tree; returns [[root]]. */
  def ensure(): String = synchronized {
    def write(day: String, doc: String): Unit = {
      val dir = Paths.get(root, s"day=$day")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("data.json"), doc + "\n")
    }
    val multi = Seq(
      entry("\"e1\"", "20544", "\"1775001600\"", "breakfast", "Oatmeal", "normal row", "210"),
      entry("\"e2\"", "20544", "null", "lunch", "Soup", "junk calories to 0", "junk"),
      entry("null", "20544", "\"1\"", "dinner", "Ghost", "missing id drops", "1"),
      entry("\"e4\"", "not-a-date", "\"2\"", "snack", "BadDate", "bad date drops", "1"))
    write("2026-04-01", s"""{"food_entries": {"food_entry": [${multi.mkString(", ")}]}}""")
    // bare object, not a 1-element array (F16), float-string epoch day (F1)
    write("2026-04-02",
      s"""{"food_entries": {"food_entry": ${entry("\"e5\"", "20545.0", "\"1775088000\"", "lunch", "Solo", "bare object day", "450.5")}}}""")
    write("2026-04-03", "{this is not json") // malformed document (P1)
    write("2026-04-04", """{"food_entries": null}""") // empty envelope
    root
  }

  /** The q52 query: run the real bronze→silver pipeline over the fixture
    * (the `d` sfDir is unused — ingest input is the JSON tree, which is
    * SF-independent by design). */
  def q52IngestSilver(s: SparkSession, d: String): DataFrame =
    Ingest.readSilver(s, ensure())

  /** DuckDB twin of [[Ingest.readSilver]] over the same files:
    * `ignore_errors` = PERMISSIVE parse (P1), `json_type` branch =
    * dict-or-list normalization (F16), `trunc` before the int cast
    * mirrors Spark's truncating double→int semantics (DuckDB's plain
    * cast ROUNDS), `coalesce(TRY_CAST(...), 0.0)` = lenient 0-fill
    * (F12). */
  val q52Sql: String =
    s"""WITH docs AS (
      |  SELECT food_entries
      |  FROM read_json('$root/day=*/data.json',
      |                 columns={food_entries: 'STRUCT(food_entry JSON)'},
      |                 format='newline_delimited', ignore_errors=true)),
      |payload AS (
      |  SELECT CASE WHEN json_type(food_entries.food_entry) = 'ARRAY'
      |              THEN food_entries.food_entry
      |              ELSE to_json([food_entries.food_entry]) END AS arr
      |  FROM docs
      |  WHERE food_entries IS NOT NULL AND food_entries.food_entry IS NOT NULL),
      |entries AS (SELECT unnest(from_json(arr, '["json"]')) AS e FROM payload),
      |typed AS (
      |  SELECT e->>'$$.food_entry_id' AS food_entry_id,
      |         e->>'$$.id' AS id,
      |         TRY_CAST(trunc(TRY_CAST(e->>'$$.date_int' AS DOUBLE)) AS INTEGER) AS date_int,
      |         TRY_CAST(e->>'$$.timestamp' AS BIGINT) AS "timestamp",
      |         e->>'$$.meal' AS meal,
      |         e->>'$$.food_entry_name' AS food_entry_name,
      |         e->>'$$.food_entry_description' AS food_entry_description,
      |         coalesce(TRY_CAST(e->>'$$.calories' AS DOUBLE), 0.0) AS calories,
      |         coalesce(TRY_CAST(e->>'$$.carbohydrate' AS DOUBLE), 0.0) AS carbohydrate,
      |         coalesce(TRY_CAST(e->>'$$.fat' AS DOUBLE), 0.0) AS fat,
      |         coalesce(TRY_CAST(e->>'$$.protein' AS DOUBLE), 0.0) AS protein,
      |         coalesce(TRY_CAST(e->>'$$.fiber' AS DOUBLE), 0.0) AS fiber,
      |         coalesce(TRY_CAST(e->>'$$.sugar' AS DOUBLE), 0.0) AS sugar,
      |         coalesce(TRY_CAST(e->>'$$.sodium' AS DOUBLE), 0.0) AS sodium,
      |         coalesce(TRY_CAST(e->>'$$.number_of_units' AS DOUBLE), 0.0) AS number_of_units
      |  FROM entries
      |  WHERE e->>'$$.food_entry_id' IS NOT NULL)
      |SELECT food_entry_id, id, date_int,
      |       DATE '1970-01-01' + date_int AS date,
      |       "timestamp", meal, food_entry_name, food_entry_description,
      |       calories, carbohydrate, fat, protein, fiber, sugar, sodium,
      |       number_of_units
      |FROM typed
      |WHERE date_int IS NOT NULL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_ingest_silver" -> (q52IngestSilver _))

  val oracleSql: Map[String, String] = Map(
    "q52_ingest_silver" -> q52Sql)
}
