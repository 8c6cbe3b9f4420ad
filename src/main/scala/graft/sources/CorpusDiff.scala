package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus VERSION-DIFF analytics: "what changed between snapshot v_a
  * and v_b of this table, summarized the way a dataset release note
  * reads" — per source and change type, how many docs and how many
  * characters moved. The lakehouse layer already exposes the raw delta
  * ([[ManifestTable.readChanges]]); this is the reporting operator a
  * data-curation team actually reviews before promoting a corpus
  * version (reference analog: the day-over-day comparison framing of
  * calorista's report tables, re-aimed at corpus snapshots).
  *
  * 100 TB shape: the NET diff is computed from only the CHANGED
  * partitions' files on both sides (readChanges prunes via the
  * manifests), the full-outer key match is one co-partitioned shuffle
  * of those files, and this report then collapses it map-side into a
  * |sources| × 3 result. Nothing rereads the unchanged corpus.
  */
object CorpusDiff {

  /** Classify + sign one CDC row: the update pre/post pair collapses to
    * one logical `update`, and preimages/deletes carry negative size. */
  private def shaped(changes: DataFrame, sizeCol: String): DataFrame =
    changes
      .withColumn("change_type",
        when(col("_change_type").startsWith("update"), "update")
          .otherwise(col("_change_type")))
      .withColumn("__delta",
        when(col("_change_type").isin("delete", "update_preimage"),
          -col(sizeCol)).otherwise(col(sizeCol)))

  /** The aggregate BOTH faces share. n_docs is a plain additive count
    * (one per non-preimage row), not countDistinct: the CDC contract
    * emits at most one image per key and logical type within a diff, so
    * distinctness is structural. ADDITIVITY is what buys the streaming
    * face — Σ of per-commit reports ≡ the report of the concatenated
    * feed — and it is also what lets Spark keep the aggregation partial
    * map-side; a distinct count would force an extra key-wide shuffle
    * AND be unsupported in a streaming aggregation. */
  private def aggregated(df: DataFrame, dims: Seq[String]): DataFrame =
    df.groupBy(dims.map(col) :+ col("change_type"): _*)
      .agg(
        count(when(col("_change_type") =!= "update_preimage", lit(1)))
          .as("n_docs"),
        sum(col("__delta")).as("chars_delta"))

  /** Summarize a [[ManifestTable.readChanges]] frame (preimages = true)
    * into (dims..., change_type, n_docs, chars_delta): inserts count
    * +size, deletes −size, updates net post−pre with the doc counted
    * once. Pure aggregation — composes with any dims the table carries. */
  def report(changes: DataFrame, dims: Seq[String],
      sizeCol: String): DataFrame =
    aggregated(shaped(changes, sizeCol), dims)

  /** Streaming face: the release FEED. A Complete-mode aggregation over
    * the `graft-manifest-cdc` source whose state IS the report —
    * |dims| × 3 rows, updated by each commit's micro-batch (the
    * bootstrap batch is the starting snapshot as inserts, the CDC
    * source contract). Semantics differ from [[report]] deliberately:
    * this is the CUMULATIVE sum of per-commit diffs (a doc updated in
    * two commits counts twice — it changed twice), while `report` nets
    * a version RANGE per key; CorpusDiffSpec pins streamed ≡
    * Σ per-commit `report`s, restart included. At 100 TB each trigger
    * shuffles only that commit's delta rows into the tiny state. */
  def reportStream(spark: SparkSession, root: String, dims: Seq[String],
      keyCol: String, sizeCol: String): DataFrame =
    aggregated(shaped(
      spark.readStream.format("graft-manifest-cdc")
        .option("path", root).option("key", keyCol)
        .option("preimages", "true").load(),
      sizeCol), dims)
}

/** Oracle fixture for q141: a documents ManifestTable rolled through
  * three deterministic commits — v1 base load (doc_id % 4 != 3), v2
  * change-detecting merge of every doc_id % 3 == 0 with " v2" appended
  * (inserts the % 4 == 3 ones, updates the rest), v3 delete of every
  * doc_id % 5 == 0 (committed as a filtered snapshot). q141 reports
  * the NET v1→v3 diff; the DuckDB oracle re-derives the same three
  * residue-class sets straight from the raw parquet, so the whole
  * manifest path — three commits, changed-partition pruning, full-outer
  * net diff, preimage accounting — is hash-gated against an engine
  * that never saw the table. Build-once lifecycle and signature
  * invalidation follow [[DedupIndexFixtures]]. */
object DiffFixtures {

  private val FixtureVersion = 2

  /** Idempotently build the three-version corpus table for `sfDir`
    * ([[FixtureLifecycle.ensureOnce]]). */
  def ensure(s: SparkSession, sfDir: String): String =
    FixtureLifecycle.ensureOnce("graft_diff",
      FixtureLifecycle.signature(Seq(sfDir, FixtureVersion.toString))) { root =>
      ManifestTable.currentVersion(root) == 3
    } { root =>
      val docs = Tables(s, sfDir, "documents")
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      ManifestTable.merge(docs.where(col("doc_id") % 4 =!= 3), root, Seq("doc_id"))
      ManifestTable.merge(
        docs.where(col("doc_id") % 3 === 0)
          .withColumn("text", concat(col("text"), lit(" v2")))
          .withColumn("n_chars", col("n_chars") + 3),
        root, Seq("doc_id"))
      val v3 = ManifestTable.commitSnapshot(
        ManifestTable.read(s, root).where(col("doc_id") % 5 =!= 0)
          .localCheckpoint(),
        root, Nil)
      assert(v3 == 3, s"fixture built $v3 versions, expected 3")
    }

  /** q141 — the corpus release-note diff (net v1→v3) through the
    * MAINTAINED table: per source and change type, docs and signed
    * character movement. */
  def q141CorpusDiff(s: SparkSession, d: String): DataFrame = {
    val root = ensure(s, d)
    CorpusDiff.report(
      ManifestTable.readChanges(s, root, 1, 3, Seq("doc_id"), preimages = true),
      dims = Seq("source"), sizeCol = "n_chars")
  }

  /** The oracle re-derives the net diff's three residue-class sets from
    * raw parquet: insert = arrived in v2 and survived v3's delete;
    * delete = present in v1 and gone by v3 (whether or not v2 updated
    * it first — the net preimage is v1's, so chars use the ORIGINAL
    * n_chars); update = in v1, rewritten by v2, survived v3 (+3 chars
    * each from the " v2" suffix). */
  val q141Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |ins AS (SELECT source, 'insert' AS change_type,
      |               count(*) AS n_docs, CAST(sum(n_chars + 3) AS BIGINT) AS chars_delta
      |        FROM d WHERE doc_id % 4 = 3 AND doc_id % 3 = 0 AND doc_id % 5 <> 0
      |        GROUP BY source),
      |del AS (SELECT source, 'delete' AS change_type,
      |               count(*) AS n_docs, CAST(sum(-n_chars) AS BIGINT) AS chars_delta
      |        FROM d WHERE doc_id % 4 <> 3 AND doc_id % 5 = 0
      |        GROUP BY source),
      |upd AS (SELECT source, 'update' AS change_type,
      |               count(*) AS n_docs, CAST(sum(3) AS BIGINT) AS chars_delta
      |        FROM d WHERE doc_id % 4 <> 3 AND doc_id % 3 = 0 AND doc_id % 5 <> 0
      |        GROUP BY source)
      |SELECT * FROM ins
      |UNION ALL SELECT * FROM del
      |UNION ALL SELECT * FROM upd""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_corpus_diff" -> (q141CorpusDiff _))

  val oracleSql: Map[String, String] = Map(
    "q141_corpus_diff" -> q141Sql)
}
