package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.EntityOps

/** Oracle coverage for the MAINTAINED entity index ([[EntityIndex]]):
  * q162 answers "what are the resolved entities of the record corpus"
  * from state maintained incrementally across FOUR corpus commits —
  * including a commit that renames EVERY record of ~a fifth of the
  * names (full retractions + typo-variant arrivals, the entity
  * churn case) and a follow-up that restores them (re-arrivals,
  * re-merges). The final corpus content equals the raw `part` parquet,
  * so the DuckDB oracle recomputes blocking → capped candidates →
  * Levenshtein match graph → connected components (entity = min member
  * name) → per-entity rollup from data the entity tables never re-read
  * after bootstrap.
  *
  * Lifecycle = [[StatsIndexFixtures]]'s: one build per content
  * signature; queries then only READ the maintained table — the honest
  * thing to time, since the production refresh never re-pays the
  * bootstrap. */
object EntityIndexFixtures {

  /** Bump when the fixture layout changes. */
  private val FixtureVersion = 2

  def ensure(s: SparkSession, sfDir: String): String =
    FixtureLifecycle.ensureOnce("graft_entidx",
      FixtureLifecycle.signature(Seq(sfDir, FixtureVersion.toString,
        EntityOps.MaxBlockSize.toString, EntityOps.MatchMaxDist.toString))) { root =>
      // a COMPLETE build ends with corpus and membership both at
      // version 4 (bootstrap + three applied deltas); >= would accept a
      // crashed build whose corpus already reached 4
      ManifestTable.currentVersion(s"$root/corpus") == 4 &&
        ManifestTable.currentVersion(s"$root/memb") == 4
    } { root =>
      val corpus = s"$root/corpus"
      val all = Tables(s, sfDir, "part").select(col("p_partkey"), col("p_name"))
      // names fully renamed by v3 (every record of the name, so the
      // original name RETRACTS and the typo variant ARRIVES)
      val renamed = pmod(xxhash64(col("p_name")), lit(5)) === 0
      // v1: half the records; bootstrap the entity tables on it
      val v1 = ManifestTable.merge(
        all.where(col("p_partkey") % 2 === 0), corpus, Seq("p_partkey"))
      EntityIndex.bootstrap(ManifestTable.read(s, corpus),
        s"$root/blocks", s"$root/memb", s"$root/ents")
      // v2: the other half — name arrivals that merge into / extend the
      // bootstrap entities, plus count bumps on shared names
      val v2 = ManifestTable.merge(
        all.where(col("p_partkey") % 2 === 1), corpus, Seq("p_partkey"))
      // v3: ~a fifth of the names arrive CORRUPTED (one appended char —
      // an edit-distance-1 variant that usually re-blocks with the
      // original's entity); v4 restores the true content
      val v3 = ManifestTable.merge(
        all.where(renamed)
          .withColumn("p_name", concat(col("p_name"), lit("q"))),
        corpus, Seq("p_partkey"))
      val v4 = ManifestTable.merge(all.where(renamed), corpus, Seq("p_partkey"))
      EntityIndex.refresh(s, corpus, s"$root/blocks", s"$root/memb",
        s"$root/ents", v1, v4)
      assert(v1 == 1 && v2 == 2 && v3 == 3 && v4 == 4)
    }

  /** q162 — the resolved-entity rollup from the MAINTAINED membership:
    * (entity, n_names, n_records), entity = canonical (min) member
    * name. The maintained claim under gate: blocking, cap, match graph,
    * component labels, and the delta-maintained record counts all equal
    * a from-scratch recompute over the raw parquet. */
  def q162MaintainedEntities(s: SparkSession, d: String): DataFrame =
    EntityIndex.readEntities(s, s"${ensure(s, d)}/memb")

  val q162Sql: String =
    s"""WITH RECURSIVE nm AS (
      |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_records,
      |         CASE WHEN instr(p_name, ' ') = 0 THEN p_name
      |              ELSE substr(p_name, 1, instr(p_name, ' ') - 1)
      |         END AS adj,
      |         CASE WHEN instr(p_name, ' ') = 0 THEN p_name
      |              ELSE substr(p_name, length(p_name) - instr(reverse(p_name), ' ') + 2)
      |         END AS noun
      |  FROM part GROUP BY p_name
      |),
      |blocks AS (
      |  SELECT name, 'adj' AS slot, adj AS key FROM nm
      |  UNION ALL
      |  SELECT name, 'noun' AS slot, noun AS key FROM nm
      |),
      |sized AS (
      |  SELECT slot, key FROM blocks GROUP BY slot, key
      |  HAVING count(*) <= ${EntityOps.MaxBlockSize}
      |),
      |cand AS (
      |  SELECT x.name AS name_a, y.name AS name_b
      |  FROM blocks x
      |  JOIN sized s ON s.slot = x.slot AND s.key = x.key
      |  JOIN blocks y ON y.slot = x.slot AND y.key = x.key AND x.name < y.name
      |  GROUP BY x.name, y.name
      |),
      |mtch AS (
      |  SELECT name_a, name_b FROM cand
      |  WHERE levenshtein(name_a, name_b) <= ${EntityOps.MatchMaxDist}
      |),
      |edges AS (
      |  SELECT name_a AS src, name_b AS dst FROM mtch
      |  UNION ALL SELECT name_b, name_a FROM mtch),
      |reach(node, lbl) AS (
      |  SELECT name, name FROM nm
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
      |comp AS (SELECT node AS name, min(lbl) AS entity FROM reach GROUP BY node)
      |SELECT c.entity, CAST(count(*) AS BIGINT) AS n_names,
      |       CAST(sum(n.n_records) AS BIGINT) AS n_records
      |FROM comp c JOIN nm n ON n.name = c.name
      |GROUP BY c.entity""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_maintained_entities" -> (q162MaintainedEntities _))

  val oracleSql: Map[String, String] = Map(
    "q162_maintained_entities" -> q162Sql)
}
