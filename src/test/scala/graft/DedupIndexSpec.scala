package graft

import graft.functions.TextOps
import graft.sources.{DedupIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental dedup-index lifecycle: the exact-fingerprint and
  * LSH band-bucket indexes live as bucketed ManifestTables maintained
  * from the corpus table's CDC stream, and a MAINTAINED index must
  * answer exactly like one RECOMPUTED from the current snapshot — across
  * inserts, updates (including one that drops a doc below shingle
  * length) and deletes. This is the gate that makes q125/q126's
  * "never re-hash the lake" story code rather than commentary. */
class DedupIndexSpec extends SparkSpec {

  private val t1 = "alpha beta gamma delta epsilon zeta"
  private val t2 = "one two three four five six seven"
  private val t3 = "red orange yellow green blue indigo"
  private val t4 = "north south east west up down"

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  /** maintained ≡ recomputed, both indexes, against the CURRENT corpus
    * snapshot. */
  private def assertMatchesSnapshot(corpusRoot: String, fpRoot: String,
      bandRoot: String, clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpusRoot)
    assert(rows(DedupIndex.readFpIndex(spark, fpRoot)) ==
      rows(DedupIndex.computeFpIndex(snap)), s"fp index drifted: $clue")
    assert(rows(DedupIndex.readBandIndex(spark, bandRoot)) ==
      rows(DedupIndex.computeBandIndex(snap).where(col("live"))
        .select(col("doc_id"), col("band"), col("bucket"))),
      s"band index drifted: $clue")
  }

  test("maintained indexes equal recomputed ones across insert / update / " +
    "shrink-below-shingles / delete commits, and probes agree") {
    val work = Files.createTempDirectory("graft-dedupidx").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"

    // v1: initial load, with an exact-dup pair (1,4)
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t2, 3L -> t3, 4L -> t1), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, 0, v1)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after v1 bootstrap")

    // v2: a second batch — another copy of t2, and a fresh doc
    val v2 = ManifestTable.merge(
      docsDf(5L -> t2, 6L -> t4), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v1, v2)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after v2 inserts")

    // v3: updates — doc 4 moves to t3's content (old fp must decrement,
    // new must increment, band rows must be replaced), and doc 2 shrinks
    // to 2 tokens (no shingles: its band rows must become tombstones,
    // the case an upsert-only maintenance would silently get wrong)
    val v3 = ManifestTable.merge(
      docsDf(4L -> t3, 2L -> "tiny doc"), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v2, v3)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after v3 updates")
    // the shrunk doc really fell out of the band index
    assert(DedupIndex.readBandIndex(spark, bandIdx)
      .where(col("doc_id") === 2L).count() == 0L)

    // v4: delete doc 3 (snapshot commit without it) — ref-counts retract
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 3L)
        .localCheckpoint(), corpus)
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v3, v4)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after v4 delete")

    // probes: a batch carrying one committed duplicate (t4) and one
    // fresh doc answers identically against maintained and recomputed
    val batch = docsDf(100L -> t4, 101L -> "completely novel words nobody wrote")
    val exact = DedupIndex.probeExact(batch, spark, fpIdx).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(exact == Map(100L -> true, 101L -> false), s"got $exact")
    val near = DedupIndex.probeNearDup(batch, spark, bandIdx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical text ⇒ identical signature ⇒ guaranteed band collision
    assert(near.contains((100L, 6L)), s"got $near")
    // parity with a from-scratch recompute of the index
    val snap = ManifestTable.read(spark, corpus)
    val nearRecomputed = TextOps.bandRowsOf(batch).as("a")
      .join(DedupIndex.computeBandIndex(snap).where(col("live")).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near == nearRecomputed)
  }

  test("a single-doc commit rewrites only that doc's hash buckets, not the index") {
    val work = Files.createTempDirectory("graft-dedupidx2").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t2, 3L -> t3, 4L -> t4), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, 0, v1)
    val fpV = ManifestTable.currentVersion(fpIdx)
    val bandV = ManifestTable.currentVersion(bandIdx)
    val v2 = ManifestTable.merge(docsDf(9L -> "brand new lonely document here"),
      corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v1, v2)
    // one new doc = 1 fingerprint = 1 fp bucket, 4 band rows of one
    // pbucket — the merges must not have rewritten any other partition
    assert(ManifestTable.changedPartitions(fpIdx, fpV, fpV + 1).size == 1)
    assert(ManifestTable.changedPartitions(bandIdx, bandV, bandV + 1).size == 1)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after single-doc commit")
  }

  test("maintained-index probes reproduce q125/q126 on the real documents " +
    "table when the corpus arrives as incremental commits") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-dedupidx3").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    // the q125/q126 stand-in split: corpus = doc_id % 10 != 9, committed
    // in two batches; batch = doc_id % 10 == 9
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v1, v2)
    val batch = all.where($"doc_id" % 10 === 9)

    val q125 = TextOps.q125IncrementalDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val probed = DedupIndex.probeExact(batch, spark, fpIdx).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(probed == q125)

    val q126 = TextOps.q126IncrementalNeardup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nearProbed = DedupIndex.probeNearDup(batch, spark, bandIdx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nearProbed == q126)
  }
}
