package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's signature operator family — deduplication and
  * change-detecting upsert (SURVEY §2.3; calorista/main.py:54-60,
  * :96-105, :140-161, streamlit_app.py:94-102).
  *
  * Two DISTINCT identity keys exist in the reference and both are kept
  * (SURVEY §7.4 #5):
  *   - D1 (extract-time): (food_entry_id, date_int, timestamp)
  *   - D3 (read-time):    (date, id, food_entry_name, timestamp, meal)
  *
  * All paths use row_number with an explicit tie-break rather than
  * dropDuplicates: the survivor is then deterministic across engines,
  * retries, and cluster topologies — dropDuplicates keeps an arbitrary
  * partition-order-dependent row, which is unacceptable for an
  * exactly-once sink at scale.
  */
object Dedup {

  /** D1 key (main.py:54-60): fingerprint = id ‖ date_int ‖ timestamp. */
  val extractKey: Seq[String] = Seq("food_entry_id", "date_int", "timestamp")

  /** D3 key (streamlit_app.py:94-102). */
  val readKey: Seq[String] = Seq("date", "id", "food_entry_name", "timestamp", "meal")

  /** Keep exactly one row per key; survivor = first by `tieBreak`.
    * One shuffle on the key columns; partial aggregation does not apply
    * but AQE handles skewed keys. */
  def deduplicate(df: DataFrame, key: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** D1 — extract-time dedup. */
  def dedupExtract(entries: DataFrame): DataFrame =
    deduplicate(entries, extractKey, Seq(col("food_entry_id")))

  /** D3 — read-time dedup. */
  def dedupRead(entries: DataFrame): DataFrame =
    deduplicate(entries, readKey, Seq(col("food_entry_id")))

  /** D2 — change-detecting upsert (main.py:140-161): MERGE semantics as a
    * full-outer join on the key with incoming-wins column selection:
    * new keys are inserted, matched keys take the incoming values
    * (a value-diff no-op write is indistinguishable from an update in
    * result space, so the merged output implements the reference's
    * intent), untouched existing rows are preserved.
    *
    * Idempotent: merge(merge(e, i), i) == merge(e, i) — property-tested
    * in DedupSpec, mirroring the reference's "no changes on second run"
    * check (main.py:164-165). At scale this runs inside foreachBatch
    * against the silver table keyed by partition (streaming.EventStream).
    */
  def merge(existing: DataFrame, incoming: DataFrame, key: Seq[String]): DataFrame = {
    val dataCols = existing.columns.filterNot(key.contains)
    require(incoming.columns.sameElements(existing.columns),
      "merge requires identical schemas")
    val e = existing.alias("e")
    // side marker, not key-null checks: key components may legitimately
    // be null (D1's timestamp) under the null-safe join
    val i = incoming.withColumn("__present", lit(true)).alias("i")
    val cond = key.map(k => col(s"e.$k") <=> col(s"i.$k")).reduce(_ && _)
    val merged = e.join(i, cond, "full_outer")
    val incomingPresent = col("i.__present").isNotNull
    val keyCols = key.map(k =>
      when(incomingPresent, col(s"i.$k")).otherwise(col(s"e.$k")).as(k))
    // incoming wins column-wise, keyed on side presence
    // (not per-column coalesce: an incoming null must overwrite)
    val valueCols = dataCols.toSeq.map(c =>
      when(incomingPresent, col(s"i.$c")).otherwise(col(s"e.$c")).as(c))
    merged.select(keyCols ++ valueCols: _*)
      .select(existing.columns.map(col).toSeq: _*)
  }
}
