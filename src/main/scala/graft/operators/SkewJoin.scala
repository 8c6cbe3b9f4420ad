package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (the 100 TB design requirement:
  * "Skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin, on by default)
  * handles most skew at runtime by splitting oversized partitions.
  * Salting is the explicit fallback when a single JOIN KEY (not just a
  * partition) is hot — AQE cannot split one key's hash bucket across
  * tasks for a sort-merge join without duplicating the other side, which
  * is exactly what salting does deliberately:
  *
  *   fact side:  salt = pmod(hash(row-unique), S) — spreads one hot key
  *               over S shuffle partitions
  *   dim side:   exploded S times, one copy per salt value
  *
  * Join keys become (key, salt). Row multiplicity is unchanged — each
  * fact row matches exactly one dim copy. Cost: dim side inflates S×,
  * so salt only the join with the skew and keep S small (8–32).
  */
object SkewJoin {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salt` ways. Semantics are
    * identical to `fact.join(dim, keys, "inner"|"left")`; physical shape
    * spreads each hot key across `salt` tasks. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // content-deterministic salt (hash of the full row), NOT rand():
    // a task retry that recomputes a map partition must re-derive the
    // same salt values the shuffle files already consumed, or the join
    // can duplicate/drop rows under fetch-failure recovery
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salt)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact
      .join(saltedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Top-k hot keys by frequency — the probe used to DECIDE whether to
    * salt (run on a sample at scale, never on the full fact table). */
  def hotKeys(df: DataFrame, key: Column, k: Int): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
}
