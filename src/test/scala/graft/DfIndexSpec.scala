package graft

import graft.sources.{DfIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained document-frequency lifecycle: token→df ref-counts and
  * the same-commit corpus-size row, kept current from corpus CDC, with
  * maintained ≡ recomputed as the gate everywhere — including the
  * empty-text doc whose "" token must NOT alias the reserved meta key. */
class DfIndexSpec extends SparkSpec {

  private val t1 = "alpha beta gamma"
  private val t2 = "beta gamma delta"
  private val t3 = "epsilon zeta"

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def dfSet(idx: String): Set[(String, Long)] =
    DfIndex.readDfIndex(spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  private def nDocs(idx: String): Long =
    DfIndex.corpusSize(spark, idx).collect()(0).getLong(0)

  private def assertMatchesSnapshot(corpus: String, idx: String, clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpus)
    val expected = DfIndex.computeDfIndex(snap)
      .where(col("token") =!= DfIndex.MetaToken)
      .select(col("token"), col("df_docs")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dfSet(idx) == expected, s"df index drifted: $clue")
    assert(nDocs(idx) == snap.count(), s"corpus-size row drifted: $clue")
  }

  test("maintained df equals recomputed across insert / update / " +
    "empty-text / delete commits; the \"\" token never aliases the meta row") {
    val work = Files.createTempDirectory("graft-dfidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/df")

    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t2, 3L -> t1), corpus, Seq("doc_id"))
    DfIndex.refresh(spark, corpus, idx, 0, v1)
    assertMatchesSnapshot(corpus, idx, "after v1")
    // shared tokens ref-counted: beta/gamma in all three docs
    assert(dfSet(idx)(("beta", 3L)) && dfSet(idx)(("alpha", 2L)))

    // v2: update doc 2 (its old tokens must decrement) + an EMPTY doc —
    // whose "" token is a real df row, distinct from the meta key
    val v2 = ManifestTable.merge(
      docsDf(2L -> t3, 4L -> ""), corpus, Seq("doc_id"))
    DfIndex.refresh(spark, corpus, idx, v1, v2)
    assertMatchesSnapshot(corpus, idx, "after v2 update + empty doc")
    assert(dfSet(idx)(("", 1L)), "empty-text doc must contribute the \"\" token")
    assert(!dfSet(idx).exists(_._2 == 0L))
    assert(dfSet(idx).forall(_._1 != DfIndex.MetaToken))
    assert(nDocs(idx) == 4L)

    // v3: delete doc 1 — alpha drops to 1, doc count retracts
    val v3 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 1L)
        .localCheckpoint(), corpus)
    DfIndex.refresh(spark, corpus, idx, v2, v3)
    assertMatchesSnapshot(corpus, idx, "after v3 delete")
    assert(dfSet(idx)(("alpha", 1L)))
    assert(nDocs(idx) == 3L)

    // replay / overlap: ref-counts must not double, no new version
    val vI = ManifestTable.currentVersion(idx)
    val before = dfSet(idx)
    DfIndex.refresh(spark, corpus, idx, 0, v3)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(dfSet(idx) == before, "ref-counts doubled on replay")

    // purge ages the zeroed rows out; answers and future maintenance
    // are unchanged
    DfIndex.purgeTombstones(spark, idx)
    assert(ManifestTable.read(spark, idx).where(col("df_docs") <= 0L).count() == 0L)
    assertMatchesSnapshot(corpus, idx, "after purge")
    val v4 = ManifestTable.merge(docsDf(5L -> t1), corpus, Seq("doc_id"))
    DfIndex.refresh(spark, corpus, idx, v3, v4)
    assertMatchesSnapshot(corpus, idx, "maintain after purge")
  }

  test("probeTfIdf against the maintained index equals a from-scratch " +
    "recompute (same formula, corpus-wide IDF, unseen tokens dropped)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-dfidx2").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/df")
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    DfIndex.refresh(spark, corpus, idx, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    DfIndex.refresh(spark, corpus, idx, v1, v2)

    val batch = all.where($"doc_id" % 10 === 9)
    val got = DfIndex.probeTfIdf(batch, spark, idx).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet

    // brute force: tf over the batch, df/n over the committed corpus
    val snap = ManifestTable.read(spark, corpus)
    val tf = batch.select($"doc_id", explode(graft.functions.TextOps.tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfT = snap.select($"doc_id", explode(graft.functions.TextOps.tokens($"text")).as("token"))
      .distinct().groupBy($"token").agg(count(lit(1)).as("df_docs"))
    val n = snap.count().toDouble
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tfidf".desc, $"token")
    val expected = tf.join(dfT, "token")
      .withColumn("tfidf", round($"tf" * log(lit(n) / $"df_docs"), 6))
      .withColumn("rnk", row_number().over(w)).where($"rnk" <= 3)
      .select($"doc_id", $"token", $"tf", $"tfidf", $"rnk".cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(got == expected)
  }

  test("turnkey startMaintenance: bootstrap pairs with startingVersion, " +
    "stream absorbs a post-bootstrap commit, restart absorbs an offline one") {
    val work = Files.createTempDirectory("graft-dfidx3").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/df")
    val ckpt = s"$work/ckpt"
    val v1 = ManifestTable.merge(docsDf(1L -> t1, 2L -> t2), corpus, Seq("doc_id"))
    DfIndex.bootstrapDfIndex(ManifestTable.read(spark, corpus), idx)
    val q = DfIndex.startMaintenance(spark, corpus, idx, ckpt, startingVersion = v1)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "no-op first batch after bootstrap")
    ManifestTable.merge(docsDf(3L -> t3), corpus, Seq("doc_id"))
    q.processAllAvailable()
    q.stop()
    assertMatchesSnapshot(corpus, idx, "streamed insert")
    ManifestTable.merge(docsDf(1L -> t2), corpus, Seq("doc_id"))
    val q2 = DfIndex.startMaintenance(spark, corpus, idx, ckpt, startingVersion = v1)
    q2.processAllAvailable()
    q2.stop()
    assertMatchesSnapshot(corpus, idx, "after restart with offline update")
  }
}
