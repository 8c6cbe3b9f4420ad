package graft.sources

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Oracle coverage for the MAINTAINED embedding stats ([[StatsIndex]]):
  * q144 answers q139's question (the full covariance matrix) and q145
  * answers q143's (the all-but-the-top whitening projection), but from
  * sufficient statistics maintained incrementally across FOUR corpus
  * commits — including a commit that writes corrupted vectors and a
  * follow-up that restores them, so the gate exercises RETRACTION
  * (update preimages subtracting from the sums), not just accumulation.
  * The final corpus content equals the raw `embeddings` parquet, so the
  * DuckDB oracle is q139's / q143's text VERBATIM, recomputed from data
  * the stats table never re-read after bootstrap.
  *
  * Lifecycle = [[DedupIndexFixtures]]'s: one build per content
  * signature under java.io.tmpdir ([[FixtureLifecycle]]), queries then
  * only READ the maintained table — which is the honest thing to time,
  * since the production refresh never re-pays the bootstrap. */
object StatsIndexFixtures {

  /** Bump when the fixture layout changes. */
  private val FixtureVersion = 2

  def ensure(s: SparkSession, sfDir: String): String =
    FixtureLifecycle.ensureOnce("graft_statsidx",
      FixtureLifecycle.signature(Seq(sfDir, FixtureVersion.toString,
        VectorOps.EmbeddingDims.toString))) { root =>
      // a COMPLETE build deterministically ends at stats version 4
      // (bootstrap + the three non-empty deltas); >= would accept a
      // build that crashed mid-refresh with the corpus already at 4
      ManifestTable.currentVersion(s"$root/corpus") == 4 &&
        ManifestTable.currentVersion(s"$root/stats") == 4
    } { root =>
      val corpus = s"$root/corpus"
      val all = Tables(s, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
      // v1: half the corpus; the stats bootstrap FREEZES its means as
      // the center (the IVF frozen-quantizer contract)
      val v1 = ManifestTable.merge(
        all.where(col("vec_id") % 2 === 0), corpus, Seq("vec_id"))
      StatsIndex.bootstrap(ManifestTable.read(s, corpus), s"$root/stats")
      // v2: the other half
      val v2 = ManifestTable.merge(
        all.where(col("vec_id") % 2 === 1), corpus, Seq("vec_id"))
      // v3: a slice arrives CORRUPTED (every dim shifted by +1) —
      // v4 restores the true content, so the maintained sums must
      // subtract v3's images exactly for the oracle to agree
      val v3 = ManifestTable.merge(
        all.where(col("vec_id") % 10 === 3)
          .withColumn("embedding",
            expr("transform(embedding, x -> float(x + float(1.0)))")),
        corpus, Seq("vec_id"))
      val v4 = ManifestTable.merge(
        all.where(col("vec_id") % 10 === 3), corpus, Seq("vec_id"))
      StatsIndex.refresh(s, corpus, s"$root/stats", v1, v4)
      assert(v1 == 1 && v2 == 2 && v3 == 3 && v4 == 4)
    }

  /** q144 — q139's covariance matrix from the MAINTAINED sums. */
  def q144MaintainedCovariance(s: SparkSession, d: String): DataFrame =
    StatsIndex.covarianceFromStats(s, s"${ensure(s, d)}/stats")

  /** q145 — q143's whitening projection with the direction and means
    * derived from the MAINTAINED sums (no stats pass over the corpus;
    * the projection itself is q143's map-only broadcast-literal pass). */
  def q145MaintainedWhitening(s: SparkSession, d: String): DataFrame = {
    val (w, mu) = StatsIndex.whiteningFromStats(s, s"${ensure(s, d)}/stats")
    VectorOps.whitenProjection(s, d, w, mu)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_maintained_covariance" -> (q144MaintainedCovariance _),
    "q145_maintained_whitening" -> (q145MaintainedWhitening _))

  /** The oracle never sees the stats table: q139/q143's texts verbatim,
    * recomputing from the raw parquet the final corpus state equals. */
  val oracleSql: Map[String, String] = Map(
    "q144_maintained_covariance" -> VectorOps.q139Sql,
    "q145_maintained_whitening" -> VectorOps.q143Sql)
}
