package graft.schema

import org.apache.spark.sql.types._

/** Typed records and declared schemas — the engine's data model
  * (SURVEY §1; reference: calorista/utils/models.py).
  *
  * Two-layer model: bronze (raw API envelope, all strings, permissive)
  * → silver (typed, deduped). Nutrients are doubles with lenient
  * coerce-else-0.0 semantics (models.py:53-55, streamlit_app.py:105-110);
  * `date` is a first-class DateType derived from the epoch-day string
  * (main.py:34-39) and is the partition column of the silver table.
  */

/** Silver food-entry record (utils/models.py:28-56 + identity fields used
  * by dedup: main.py:57-59, streamlit_app.py:96-102). */
case class FoodEntry(
    food_entry_id: String,
    id: String,
    date_int: Int,
    date: java.sql.Date,
    timestamp: Option[Long],
    meal: String,
    food_entry_name: String,
    food_entry_description: String,
    calories: Double,
    carbohydrate: Double,
    fat: Double,
    protein: Double,
    fiber: Double,
    sugar: Double,
    sodium: Double,
    number_of_units: Double)

/** Typed exercise entry (S5; the reference leaves `exercises.get`
  * untyped — utils/api.py:147-158 returns the raw dict — so the typed
  * shape mirrors the public envelope's fields with the same lenient
  * numeric semantics as FoodEntry). */
case class ExerciseEntry(
    exercise_id: String,
    exercise_name: String,
    minutes: Double,
    calories: Double,
    date: java.sql.Date)

/** User profile (utils/models.py:5-13). */
case class UserProfile(
    goal_weight_kg: Double,
    height_cm: Double,
    height_measure: String,
    last_weight_kg: Double,
    weight_measure: String,
    last_weight_date_int: Option[Int],
    last_weight_comment: Option[String])

object Schemas {

  /** One raw entry as delivered by the API — every field a string
    * (FIXTURES.md §1; the API stringifies all numerics,
    * utils/models.py:49-55). */
  val rawEntry: StructType = StructType(Seq(
    "food_entry_id", "id", "date_int", "timestamp", "meal",
    "food_entry_name", "food_entry_description", "calories",
    "carbohydrate", "fat", "protein", "fiber", "sugar", "sodium",
    "number_of_units").map(StructField(_, StringType, nullable = true)))

  /** One raw exercise as delivered by `exercises.get` — all strings,
    * like [[rawEntry]] (the API stringifies numerics). */
  val rawExercise: StructType = StructType(Seq(
    "exercise_id", "exercise_name", "minutes", "calories")
    .map(StructField(_, StringType, nullable = true)))

  /** Raw exercises envelope: {"exercises": {"exercise": [exercise…]}} —
    * same bare-object-for-singleton quirk as [[rawEnvelope]], so the
    * payload is captured as verbatim text and normalized before the
    * typed parse. */
  val rawExercisesEnvelope: StructType = StructType(Seq(
    StructField("exercises", StructType(Seq(
      StructField("exercise", StringType, nullable = true))),
      nullable = true)))

  /** Raw per-day envelope: {"food_entries": {"food_entry": [entry…]}}.
    * `food_entry` is declared StringType, NOT ArrayType — the API sends a
    * bare object (not a 1-element array) for single-entry days
    * (main.py:82-89), so the payload is captured verbatim and normalized
    * by Ingest.normalizeDictOrList before the typed parse. */
  val rawEnvelope: StructType = StructType(Seq(
    StructField("food_entries", StructType(Seq(
      StructField("food_entry", StringType, nullable = true))),
      nullable = true)))

  /** Silver schema (FIXTURES.md §2). */
  val silver: StructType = StructType(Seq(
    StructField("food_entry_id", StringType, nullable = false),
    StructField("id", StringType, nullable = true),
    StructField("date_int", IntegerType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("timestamp", LongType, nullable = true),
    StructField("meal", StringType, nullable = true),
    StructField("food_entry_name", StringType, nullable = true),
    StructField("food_entry_description", StringType, nullable = true),
    StructField("calories", DoubleType, nullable = false),
    StructField("carbohydrate", DoubleType, nullable = false),
    StructField("fat", DoubleType, nullable = false),
    StructField("protein", DoubleType, nullable = false),
    StructField("fiber", DoubleType, nullable = false),
    StructField("sugar", DoubleType, nullable = false),
    StructField("sodium", DoubleType, nullable = false),
    StructField("number_of_units", DoubleType, nullable = false)))
}
