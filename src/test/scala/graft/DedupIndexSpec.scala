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

  test("the POLLING path is exactly-once too: replaying a version range " +
    "through refreshIndexes neither double-counts ref-counts nor commits " +
    "a new index version (the window VERDICT r11 flagged)") {
    val work = Files.createTempDirectory("graft-dedupidx-poll").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"
    // t1 twice: its fingerprint's ref-count is 2 — the value a
    // double-applied delta would corrupt to 4
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t1, 3L -> t2), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, 0, v1)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after v1")
    val fpV = ManifestTable.currentVersion(fpIdx)
    val bandV = ManifestTable.currentVersion(bandIdx)
    val refCounts = DedupIndex.readFpIndex(spark, fpIdx)
      .select(col("fp"), col("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // a caller that crashed after maintenance but before its own offset
    // write simply calls again with the same (overlapping) range
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, 0, v1)
    assert(ManifestTable.currentVersion(fpIdx) == fpV,
      "replayed range must not commit a new fp-index version")
    assert(ManifestTable.currentVersion(bandIdx) == bandV,
      "replayed range must not commit a new band-index version")
    val after = DedupIndex.readFpIndex(spark, fpIdx)
      .select(col("fp"), col("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == refCounts, "ref-counts doubled on replay")
    assert(after.values.max == 2L)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after replay")

    // and a LATER range still applies (the watermark is per-version,
    // not a one-way latch)
    val v2 = ManifestTable.merge(docsDf(4L -> t1), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v1, v2)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after v2")
    // overlapping replay covering both old and new versions: still a no-op
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, 0, v2)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after overlapping replay")
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

  test("exactly-once maintenance: a REPLAYED CDC micro-batch (crash between " +
    "index commit and checkpoint write) does not double-apply — ref-counts " +
    "stay exact, even with an untagged commit landing in between") {
    val work = Files.createTempDirectory("graft-dedupidx-eo").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"
    // v1: bootstrap batch (streaming batch id 0 reads 0→1 as inserts)
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t2, 3L -> t1), corpus, Seq("doc_id"))
    val ch0 = ManifestTable.readChanges(
      spark, corpus, 0, v1, Seq("doc_id"), preimages = true)
    DedupIndex.applyBatch(ch0, 0L, fpIdx, bandIdx)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after batch 0")

    // v2: an update + an insert, applied as batch 1
    val v2 = ManifestTable.merge(
      docsDf(2L -> t3, 4L -> t1), corpus, Seq("doc_id"))
    val ch1 = ManifestTable.readChanges(
      spark, corpus, v1, v2, Seq("doc_id"), preimages = true).localCheckpoint()
    DedupIndex.applyBatch(ch1, 1L, fpIdx, bandIdx)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after batch 1")
    val fpV = ManifestTable.currentVersion(fpIdx)
    val bandV = ManifestTable.currentVersion(bandIdx)

    // REPLAY batch 1 (the crash-between-commit-and-checkpoint window):
    // both indexes must skip — without the txn-tag guard the fp
    // ref-count for t1 would double-count the replayed +1
    DedupIndex.applyBatch(ch1, 1L, fpIdx, bandIdx)
    assert(ManifestTable.currentVersion(fpIdx) == fpV,
      "replayed batch must not commit a new fp index version")
    assert(ManifestTable.currentVersion(bandIdx) == bandV)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "after replay of batch 1")

    // an UNTAGGED maintenance commit (compaction) between batches must
    // not reset the watermark: the tag scan reads retained history, not
    // just the head commit (ADVICE r10)
    ManifestTable.compact(spark, fpIdx, "bucket", minFiles = 1)
    DedupIndex.applyBatch(ch1, 1L, fpIdx, bandIdx)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx,
      "replay after an untagged compaction commit")
    // the audit surface: index history rows carry their batch tags
    assert(ManifestTable.history(fpIdx).flatMap(_.tag).nonEmpty)
  }

  test("purgeTombstones ages dead rows out WITHOUT changing any answer: " +
    "live reads identical, raw reads tombstone-free, and maintenance " +
    "AFTER the purge still equals a recompute (absent ≡ tombstone)") {
    val work = Files.createTempDirectory("graft-dedupidx-purge").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t2, 3L -> t3, 4L -> t1), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, 0, v1)
    // delete doc 3 and shrink doc 2 below shingle length → a zero
    // ref-count fp tombstone and band tombstones
    val v2 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 3L)
        .localCheckpoint(), corpus)
    val v3 = ManifestTable.merge(docsDf(2L -> "tiny doc"), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v1, v3)
    assert(ManifestTable.read(spark, fpIdx).where(col("n_docs") <= 0L).count() > 0,
      "setup must have produced fp tombstones")
    assert(ManifestTable.read(spark, bandIdx).where(!col("live")).count() > 0,
      "setup must have produced band tombstones")

    val liveFpBefore = rows(DedupIndex.readFpIndex(spark, fpIdx))
    val liveBandBefore = rows(DedupIndex.readBandIndex(spark, bandIdx))
    DedupIndex.purgeTombstones(spark, fpIdx, bandIdx)
    assert(rows(DedupIndex.readFpIndex(spark, fpIdx)) == liveFpBefore)
    assert(rows(DedupIndex.readBandIndex(spark, bandIdx)) == liveBandBefore)
    assert(ManifestTable.read(spark, fpIdx).where(col("n_docs") <= 0L).count() == 0)
    assert(ManifestTable.read(spark, bandIdx).where(!col("live")).count() == 0)
    assert(v2 == v1 + 1)

    // maintenance after the purge: re-insert doc 3's content and a dup
    // of the purged fingerprint — absent keys must behave exactly like
    // the tombstones they replaced
    val v4 = ManifestTable.merge(docsDf(7L -> t3, 8L -> t3), corpus, Seq("doc_id"))
    DedupIndex.refreshIndexes(spark, corpus, fpIdx, bandIdx, v3, v4)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "maintenance after purge")
  }

  test("turnkey startIndexMaintenance: a graft-manifest-cdc-fed streaming " +
    "query keeps BOTH indexes equal to the corpus across commits and a restart") {
    val work = Files.createTempDirectory("graft-dedupidx-turnkey").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"
    val ckpt = s"$work/ckpt"
    ManifestTable.merge(docsDf(1L -> t1, 2L -> t2), corpus, Seq("doc_id"))
    val q = DedupIndex.startIndexMaintenance(spark, corpus, fpIdx, bandIdx, ckpt)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "turnkey bootstrap")
    ManifestTable.merge(docsDf(3L -> t1, 2L -> t4), corpus, Seq("doc_id"))
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "turnkey incremental commit")
    q.stop()
    // offline commit + restart from the same checkpoint
    ManifestTable.merge(docsDf(4L -> t3), corpus, Seq("doc_id"))
    val q2 = DedupIndex.startIndexMaintenance(spark, corpus, fpIdx, bandIdx, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "turnkey restart")
    // and the maintained index still answers probes
    val exact = DedupIndex.probeExact(docsDf(100L -> t1), spark, fpIdx).collect()
    assert(exact.length == 1 && exact.head.getBoolean(2))
  }

  test("bootstrap + startIndexMaintenance(startingVersion): the stream's " +
    "first batch covers only POST-bootstrap commits — ref-counts stay exact " +
    "instead of doubling on the re-emitted snapshot") {
    val work = Files.createTempDirectory("graft-dedupidx-boot").toString
    val corpus = s"$work/corpus"
    val fpIdx = s"$work/fp"
    val bandIdx = s"$work/band"
    // v1 indexed by a BOOTSTRAP, not by the stream
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t2, 3L -> t1), corpus, Seq("doc_id"))
    val snap = ManifestTable.read(spark, corpus)
    DedupIndex.bootstrapFpIndex(snap, fpIdx)
    DedupIndex.bootstrapBandIndex(snap, bandIdx)
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "bootstrap")

    // the documented pairing: startingVersion = the bootstrapped version.
    // Without it the fresh checkpoint's first batch re-emits v0→v1 as
    // inserts and every fp ref-count doubles (t1 would read 4, not 2)
    val q = DedupIndex.startIndexMaintenance(
      spark, corpus, fpIdx, bandIdx, s"$work/ckpt", startingVersion = v1)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, fpIdx, bandIdx,
      "stream start over a bootstrapped index")
    val t1Count = DedupIndex.readFpIndex(spark, fpIdx)
      .where(col("fp") === md5(lit(t1))).select(col("n_docs")).collect()
    assert(t1Count.length == 1 && t1Count.head.getLong(0) == 2L,
      s"t1 ref-count after pairing: ${t1Count.toSeq}")

    // post-bootstrap commits flow through the stream normally
    ManifestTable.merge(docsDf(4L -> t1), corpus, Seq("doc_id"))
    q.processAllAvailable()
    q.stop()
    assertMatchesSnapshot(corpus, fpIdx, bandIdx, "post-bootstrap commit")
  }
}
