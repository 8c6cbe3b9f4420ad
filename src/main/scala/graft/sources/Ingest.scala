package graft.sources

import graft.schema.Schemas
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Bronze→silver ingest pipeline (SURVEY §2.1 S1/S2/S9/S10, §2.9
  * F1/F12/F15/F16; reference: calorista/main.py:77-130).
  *
  * The reference fetches one JSON envelope per day over HTTP
  * (utils/api.py:127-145) sequentially; here the source is a
  * day-partitioned JSON dataset read in parallel — at 100 TB the fetch
  * becomes a `mapPartitions` over a day-range Dataset (S2), but the
  * normalize/cast/filter plan below is identical either way.
  *
  * Lenient everywhere, matching the reference: malformed JSON → null row
  * dropped (PERMISSIVE mode, streamlit_app.py:147-148); unparseable
  * numerics → 0.0 (models.py:53-55); unparseable dates → row dropped
  * (main.py:38-39, :125-128); missing `food_entry_id` → row dropped
  * (main.py:94-95).
  */
object Ingest {

  /** F16 — dict-or-list normalization (main.py:88-89): the API delivers a
    * single-entry day as an object, not a 1-element array. Working on the
    * raw JSON text of `food_entry`, wrap a bare object in `[...]` so one
    * ArrayType parse handles both shapes. */
  def normalizeDictOrList(payload: Column): Column = {
    val trimmed = trim(payload)
    when(payload.isNull, lit(null).cast("string"))
      .when(trimmed.startsWith("["), trimmed)
      .otherwise(concat(lit("["), trimmed, lit("]")))
  }

  /** F12 — lenient numeric cast with 0-fill (streamlit_app.py:105-110,
    * models.py:53-55): unparseable / null / empty → 0.0, never fail. */
  def lenientDouble(c: Column): Column =
    coalesce(try_cast(c, "double"), lit(0.0))

  /** ANSI-safe cast: Spark 4 defaults to ANSI mode where CAST throws on
    * bad input; the reference's contract is null-on-failure (SURVEY §7.4
    * #4), which is try_cast. */
  private def try_cast(c: Column, t: String): Column =
    c.try_cast(t)

  /** F1 — epoch-day string → DateType (main.py:34-39). The reference
    * does int(float(s)) — "20545.0" is tolerated — then date arithmetic;
    * invalid input → null (caller drops the row). */
  def epochDayToDate(c: Column): Column =
    date_add(lit("1970-01-01").cast("date"),
      try_cast(try_cast(c, "double"), "int"))

  /** Parse raw per-day envelope JSON documents (one JSON text per row in
    * `raw`, column `json` + partition column `day`) into exploded raw
    * entries — still all-string. */
  def parseEnvelope(raw: DataFrame): DataFrame = {
    val s = raw.sparkSession
    import s.implicits._
    raw
      // PERMISSIVE: malformed document → null struct → row dropped (P1)
      .withColumn("env", from_json($"json", Schemas.rawEnvelope))
      .withColumn("payload", normalizeDictOrList($"env.food_entries.food_entry"))
      .where($"payload".isNotNull)
      .withColumn("entries", from_json($"payload", ArrayType(Schemas.rawEntry)))
      .where($"entries".isNotNull)
      .select($"day", explode($"entries").as("e"))
      .select($"day" +: Schemas.rawEntry.fieldNames.toSeq.map(f => $"e.$f".as(f)): _*)
  }

  /** Raw exploded entries → typed silver rows: required-key filters (P2/
    * P3), typed casts (F12), derived date (F1). */
  def toSilver(entries: DataFrame): DataFrame = {
    val s = entries.sparkSession
    import s.implicits._
    entries
      .where($"food_entry_id".isNotNull) // P2 (main.py:94-95)
      .withColumn("date_int_typed", $"date_int".try_cast("double").try_cast("int"))
      .withColumn("date", epochDayToDate($"date_int"))
      .where($"date_int_typed".isNotNull && $"date".isNotNull) // P3 (main.py:125-128)
      .select(
        $"food_entry_id",
        $"id",
        $"date_int_typed".as("date_int"),
        $"date",
        $"timestamp".try_cast("long").as("timestamp"),
        $"meal",
        $"food_entry_name",
        $"food_entry_description",
        lenientDouble($"calories").as("calories"),
        lenientDouble($"carbohydrate").as("carbohydrate"),
        lenientDouble($"fat").as("fat"),
        lenientDouble($"protein").as("protein"),
        lenientDouble($"fiber").as("fiber"),
        lenientDouble($"sugar").as("sugar"),
        lenientDouble($"sodium").as("sodium"),
        lenientDouble($"number_of_units").as("number_of_units"))
  }

  /** Full bronze→silver slice from JSON documents on disk: one file per
    * day under `path/day=YYYY-MM-DD/` (S8's partitioned layout — day-key
    * Redis GET ≙ partition-pruned read, SURVEY §1.4). */
  def readSilver(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.text(path)
      .select(input_file_name().as("file"), $"value".as("json"))
      .withColumn("day", to_date(regexp_extract($"file", "day=([0-9-]+)", 1)))
      .drop("file")
    toSilver(parseEnvelope(raw))
  }

  /** S3 — month-granularity extract (utils/api.py:188-201,
    * `food_entries.get_month`): one month's days in a single read. The
    * day-partitioned layout is read through Spark's partition discovery
    * (the `day=YYYY-MM-DD` directories become a real partition column),
    * so the month predicate becomes a PartitionFilter — files outside
    * the month are never opened. At 100 TB this is the difference
    * between scanning one month and scanning the whole table. */
  def readSilverMonth(spark: SparkSession, path: String, month: String): DataFrame = {
    import spark.implicits._
    val monthStart = to_date(lit(s"$month-01"))
    val raw = spark.read.text(path) // partition discovery: day dirs → `day` col
      .where(trunc($"day", "month") === monthStart)
      .select($"day".cast("date").as("day"), $"value".as("json"))
    toSilver(parseEnvelope(raw))
  }

  /** S5 — exercises extract (utils/api.py:147-158, `exercises.get`):
    * same envelope pattern as the food path — dict-or-list payload
    * normalization (F16), permissive parse (P1), lenient numeric casts
    * (F12). The optional date filter applies to a `day` column DERIVED
    * from the file name after the scan — it does not prune the file
    * listing; a Hive-layout partitioned read (the readSilverMonth shape)
    * is the pruned path. Returns a typed `Dataset[ExerciseEntry]`. */
  def readExercises(spark: SparkSession, path: String,
                    date: Option[String] = None): Dataset[graft.schema.ExerciseEntry] = {
    import spark.implicits._
    val raw = spark.read.text(path)
      .select(input_file_name().as("file"), $"value".as("json"))
      .withColumn("day", to_date(regexp_extract($"file", "day=([0-9-]+)", 1)))
      .drop("file")
    val filtered = date.fold(raw)(dt => raw.where($"day" === to_date(lit(dt))))
    parseExercises(filtered)
  }

  /** Exercises envelope JSON → typed rows (see [[readExercises]]). */
  def parseExercises(raw: DataFrame): Dataset[graft.schema.ExerciseEntry] = {
    val s = raw.sparkSession
    import s.implicits._
    raw
      .withColumn("env", from_json($"json", Schemas.rawExercisesEnvelope))
      .withColumn("payload", normalizeDictOrList($"env.exercises.exercise"))
      .where($"payload".isNotNull)
      .withColumn("entries", from_json($"payload", ArrayType(Schemas.rawExercise)))
      .where($"entries".isNotNull)
      .select($"day", explode($"entries").as("e"))
      .where($"e.exercise_id".isNotNull) // P2's required-key contract
      .select(
        $"e.exercise_id".as("exercise_id"),
        $"e.exercise_name".as("exercise_name"),
        lenientDouble($"e.minutes").as("minutes"),
        lenientDouble($"e.calories").as("calories"),
        $"day".cast("date").as("date"))
      .as[graft.schema.ExerciseEntry]
  }

  /** S8 — silver sink: date-partitioned parquet with dynamic partition
    * overwrite (per-day Redis SET ≙ overwrite one day partition). */
  def writeSilver(silver: DataFrame, path: String): Unit =
    silver.write
      .partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
}
