package graft

import graft.sources.{ClusterIndex, DedupIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained near-dup COMPONENTS lifecycle: band-index edges in,
  * transitive closure out, kept current by affected-cluster-bounded
  * maintenance. The gate everywhere is maintained ≡ recomputed
  * ([[ClusterIndex.computeMembership]] over the current corpus
  * snapshot) — across inserts, a cluster MERGE (a new doc bridging two
  * existing clusters via its band collisions), a bridge-update SPLIT,
  * and a delete, plus replay rejection and q54 parity on real data. */
class ClusterIndexSpec extends SparkSpec {

  private val t1 = "alpha beta gamma delta epsilon zeta"
  private val t2 = "one two three four five six seven"
  private val t3 = "red orange yellow green blue indigo"

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def membSet(membRoot: String): Set[(Long, Long)] =
    ClusterIndex.readMembership(spark, membRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def expected(corpusRoot: String): Set[(Long, Long)] =
    ClusterIndex.computeMembership(ManifestTable.read(spark, corpusRoot))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Drive one corpus version range through band + cluster maintenance
    * (the [[ClusterIndex.applyBatch]] path, batch id = toV). */
  private def roll(corpus: String, band: String, memb: String, rep: String,
      fromV: Int, toV: Int): Unit =
    (fromV until toV).foreach { v =>
      val ch = ManifestTable.readChanges(
        spark, corpus, v, v + 1, Seq("doc_id"), preimages = true)
      ClusterIndex.applyBatch(ch, v.toLong, band, memb, rep)
    }

  test("maintained components equal recomputed across insert / cluster-" +
    "merge / bridge-update-split / delete commits, with replay rejected") {
    val work = Files.createTempDirectory("graft-clusteridx").toString
    val (corpus, band, memb, rep) =
      (s"$work/corpus", s"$work/band", s"$work/memb", s"$work/rep")

    // v1: two 2-doc clusters (identical texts collide in every band)
    // and a singleton
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t1, 5L -> t2, 6L -> t2, 9L -> t3),
      corpus, Seq("doc_id"))
    roll(corpus, band, memb, rep, 0, v1)
    assert(membSet(memb) == expected(corpus), "after v1")
    assert(membSet(memb) == Set(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))

    // v2: doc 3 joins cluster {1,2} (same text)
    val v2 = ManifestTable.merge(docsDf(3L -> t1), corpus, Seq("doc_id"))
    roll(corpus, band, memb, rep, v1, v2)
    assert(membSet(memb) == expected(corpus), "after v2 insert")
    assert(membSet(memb)(3L -> 1L))

    // v3: cluster MERGE via update — doc 5 (rep of {5,6}) changes text
    // to t1: {1,2,3} and 5 merge; 6 is left alone (its only edge was
    // to 5's OLD image) — a merge and a split in one batch
    val v3 = ManifestTable.merge(docsDf(5L -> t1), corpus, Seq("doc_id"))
    roll(corpus, band, memb, rep, v2, v3)
    assert(membSet(memb) == expected(corpus), "after v3 bridge update")
    assert(membSet(memb) == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      6L -> 6L, 9L -> 9L))

    // v4: delete doc 1 (the rep of the big cluster) — remaining members
    // relabel to the new min
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 1L)
        .localCheckpoint(), corpus)
    roll(corpus, band, memb, rep, v3, v4)
    assert(membSet(memb) == expected(corpus), "after v4 delete")
    assert(membSet(memb)(2L -> 2L) && membSet(memb)(5L -> 2L))

    // replay the last batch id with the same changes: watermark rejects
    val vM = ManifestTable.currentVersion(memb)
    val ch = ManifestTable.readChanges(
      spark, corpus, v3, v4, Seq("doc_id"), preimages = true)
    ClusterIndex.applyBatch(ch, (v4 - 1).toLong, band, memb, rep)
    assert(ManifestTable.currentVersion(memb) == vM,
      "replayed batch must not commit a new membership version")
    assert(membSet(memb) == expected(corpus), "after replay")

    // components read surface: sizes match q54's shape
    val comp = ClusterIndex.readComponents(spark, memb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(comp == Set((2L, 2L, 3L), (3L, 2L, 3L), (5L, 2L, 3L),
      (6L, 6L, 1L), (9L, 9L, 1L)), comp.toString)
  }

  test("turnkey startMaintenance keeps components current across commits " +
    "and a restart; maintained matches q54's recompute on the real " +
    "documents table built from incremental commits") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-clusteridx2").toString
    val (corpus, band, memb, rep) =
      (s"$work/corpus", s"$work/band", s"$work/memb", s"$work/rep")
    val ckpt = s"$work/ckpt"
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    ManifestTable.merge(all.where($"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    val q = ClusterIndex.startMaintenance(spark, corpus, band, memb, rep, ckpt)
    q.processAllAvailable()
    assert(membSet(memb) == expected(corpus), "turnkey bootstrap half")
    ManifestTable.merge(all.where($"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    q.processAllAvailable()
    q.stop()
    assert(membSet(memb) == expected(corpus), "turnkey full corpus")

    // restart absorbs an offline commit
    ManifestTable.merge(
      Seq((900001L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      corpus, Seq("doc_id"))
    val q2 = ClusterIndex.startMaintenance(spark, corpus, band, memb, rep, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(membSet(memb) == expected(corpus), "after restart")

    // parity with the oracle-gated q54 on the SAME corpus content: the
    // maintained labels must equal the per-query solve's
    val snapDir = Files.createTempDirectory("graft-clusteridx2-snap").toString
    ManifestTable.read(spark, corpus).select($"doc_id", $"text")
      .write.parquet(s"$snapDir/documents.parquet")
    val q54 = graft.functions.TextOps.q54NearDupComponents(spark, snapDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val maintained = ClusterIndex.readComponents(spark, memb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == q54)

    // the keeper DECISION too: maintained token counts (batch-supplied,
    // never re-read from the corpus) must reproduce q69 exactly
    val q69 = graft.functions.TextOps.q69KeeperSelection(spark, snapDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val keepers = ClusterIndex.readKeepers(spark, memb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(keepers == q69)
  }

  test("crash BETWEEN the two cluster commits (rep committed, membership " +
    "not): the replay re-enters applyChanges and converges — the watermark " +
    "must ride the LAST commit, or the rep table stays stale forever") {
    val work = Files.createTempDirectory("graft-clusteridx-crash").toString
    val (corpus, band, memb, rep) =
      (s"$work/corpus", s"$work/band", s"$work/memb", s"$work/rep")
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t1, 5L -> t2, 6L -> t2), corpus, Seq("doc_id"))
    roll(corpus, band, memb, rep, 0, v1)

    // v2 merges the two clusters (doc 5's text becomes t1) — and the
    // JVM "dies" after the members-by-rep commit, before membership
    val v2 = ManifestTable.merge(docsDf(5L -> t1), corpus, Seq("doc_id"))
    val ch = ManifestTable.readChanges(
      spark, corpus, v1, v2, Seq("doc_id"), preimages = true)
    ClusterIndex.injectCrashBetweenCommits = true
    intercept[IllegalStateException] {
      ClusterIndex.applyBatch(ch, v1.toLong, band, memb, rep)
    }
    // the crash window: repRoot advanced, membRoot untagged and behind
    assert(ManifestTable.lastBatchTag(memb) < v1.toLong,
      "membership must NOT carry the batch tag after the injected crash")

    // the replay (what the streaming runtime does on restart): must
    // re-enter applyChanges, not skip, and both tables must converge
    ClusterIndex.applyBatch(ch, v1.toLong, band, memb, rep)
    assert(membSet(memb) == expected(corpus), "membership after crash+replay")
    // members-by-rep agrees with membership (no stale (old_rep, doc) row)
    val byRep = ManifestTable.read(spark, rep).where(col("live"))
      .select(col("doc_id"), col("rep")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byRep == membSet(memb),
      s"rep table diverged: rep=$byRep memb=${membSet(memb)}")
    // second replay of the SAME id: now fully applied → watermark skips
    val vM = ManifestTable.currentVersion(memb)
    ClusterIndex.applyBatch(ch, v1.toLong, band, memb, rep)
    assert(ManifestTable.currentVersion(memb) == vM, "replay after success must skip")
  }

  test("LIVE interleaving: the dedup-index stream and the cluster stream " +
    "run CONCURRENTLY, sharing the band root with scoped watermarks, " +
    "across insert / merge-update / delete commits and an inverted drain " +
    "order — every maintained table ends exactly ≡ recomputed") {
    import org.apache.spark.sql.functions.col
    val work = Files.createTempDirectory("graft-clusteridx-live").toString
    val (corpus, fp, band, memb, rep) =
      (s"$work/corpus", s"$work/fp", s"$work/band", s"$work/memb", s"$work/rep")

    ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t1, 5L -> t2, 6L -> t2, 9L -> t3),
      corpus, Seq("doc_id"))
    // BOTH streams up before any batch drains: the dedup stream
    // maintains fp + band, the cluster stream maintains band + the
    // cluster tables — the shared band root sees each corpus delta from
    // two independent batch-id spaces (idempotent keyed upserts, so the
    // double application must be content-neutral), and the scoped
    // watermarks must keep the two lineages from swallowing each other
    val qD = DedupIndex.startIndexMaintenance(spark, corpus, fp, band, s"$work/ckptD")
    val qC = ClusterIndex.startMaintenance(spark, corpus, band, memb, rep, s"$work/ckptC")
    qD.processAllAvailable(); qC.processAllAvailable()
    assert(membSet(memb) == expected(corpus), "after bootstrap, both live")

    // insert while both streams are live
    ManifestTable.merge(docsDf(3L -> t1, 7L -> t2), corpus, Seq("doc_id"))
    qD.processAllAvailable(); qC.processAllAvailable()
    assert(membSet(memb) == expected(corpus), "after live insert")

    // cluster-merging update + a delete, drained in INVERTED order
    // (cluster stream first): order between the streams must not matter
    ManifestTable.merge(docsDf(5L -> t1), corpus, Seq("doc_id"))
    ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 2L)
        .localCheckpoint(), corpus)
    qC.processAllAvailable(); qD.processAllAvailable()
    qD.stop(); qC.stop()

    val snap = ManifestTable.read(spark, corpus)
    assert(membSet(memb) == expected(corpus), "membership after live run")
    // fp index ≡ recomputed
    val fpStored = DedupIndex.readFpIndex(spark, fp)
      .select(col("fp"), col("n_docs")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val fpExpected = DedupIndex.computeFpIndex(snap)
      .select(col("fp"), col("n_docs")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fpStored == fpExpected, "fp index drifted under live interleaving")
    // band index ≡ recomputed (live rows)
    val bandStored = DedupIndex.readBandIndex(spark, band).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val bandExpected = DedupIndex.computeBandIndex(snap).where(col("live"))
      .select(col("doc_id"), col("band"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(bandStored == bandExpected, "band index drifted under live interleaving")
  }

  test("STALE tombstone from an earlier completed move: a later batch " +
    "hitting the doc's OLD rep must not pull it into M without its current " +
    "cluster-mates and silently split it off as a singleton") {
    val work = Files.createTempDirectory("graft-clusteridx-stale").toString
    val (corpus, band, memb, rep) =
      (s"$work/corpus", s"$work/band", s"$work/memb", s"$work/rep")

    // v1: clusters {1,2} (t1) and {5,6} (t2)
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t1, 5L -> t2, 6L -> t2), corpus, Seq("doc_id"))
    roll(corpus, band, memb, rep, 0, v1)
    assert(membSet(memb) == Set(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))

    // v2 (COMPLETED batch): doc 6 moves to cluster {1,2} — the rep table
    // now carries a stale (5, 6, live=false) tombstone (purge is manual)
    val v2 = ManifestTable.merge(docsDf(6L -> t1), corpus, Seq("doc_id"))
    roll(corpus, band, memb, rep, v1, v2)
    assert(membSet(memb) == Set(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 1L))
    val tombstones = ManifestTable.read(spark, rep).where(!col("live"))
      .select(col("rep"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tombstones(5L -> 6L), "precondition: the stale tombstone exists")

    // v3: doc 7 (t2) joins rep 5's cluster. The affected-set walk reaches
    // doc 6 ONLY through the stale tombstone; 6's cluster-mates {1,2} are
    // not in M, so an unguarded solve would see none of 6's edges and
    // relabel it a singleton. The guard (live membership rep ∈ seedReps)
    // must drop 6 from M instead.
    val v3 = ManifestTable.merge(docsDf(7L -> t2), corpus, Seq("doc_id"))
    roll(corpus, band, memb, rep, v2, v3)
    assert(membSet(memb)(6L -> 1L),
      "doc 6 was split from its current cluster by a stale tombstone")
    assert(membSet(memb) == expected(corpus), "maintained != recomputed after v3")
    assert(membSet(memb) ==
      Set(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 1L, 7L -> 5L))
  }

  test("SCOPED watermarks: the dedup stream and the cluster stream share " +
    "the band index with unrelated batch-id spaces — one stream's high id " +
    "must not swallow the other's delta") {
    val work = Files.createTempDirectory("graft-clusteridx-scope").toString
    val (corpus, fp, band, memb, rep) =
      (s"$work/corpus", s"$work/fp", s"$work/band", s"$work/memb", s"$work/rep")
    val v1 = ManifestTable.merge(
      docsDf(1L -> t1, 2L -> t1, 9L -> t3), corpus, Seq("doc_id"))
    val ch1 = ManifestTable.readChanges(
      spark, corpus, 0, v1, Seq("doc_id"), preimages = true)
    // the dedup stream is further along in ITS numbering (restarted
    // checkpoint, compactions — id spaces are not comparable): batch 7
    DedupIndex.applyBatch(ch1, 7L, fp, band, scope = "dedupstream")
    // the cluster stream's FIRST batch (id 0) covers the same corpus
    // commit — an unscoped watermark would see 0 <= 7 and skip BOTH the
    // band delta and the cluster solve
    ClusterIndex.applyBatch(ch1, 0L, band, memb, rep, scope = "clusterstream")
    assert(membSet(memb) == expected(corpus),
      "cluster stream must apply its batch despite the other scope's higher id")

    // and the lineages stay independent: each scope reads its own
    assert(ManifestTable.lastBatchTag(band, "dedupstream") == 7L)
    assert(ManifestTable.lastBatchTag(band, "clusterstream") == 0L)
    assert(ManifestTable.lastBatchTag(band) == -1L,
      "unscoped watermark must not match scoped tags")

    // replay within each scope still rejects
    val vB = ManifestTable.currentVersion(band)
    DedupIndex.applyBatch(ch1, 7L, fp, band, scope = "dedupstream")
    ClusterIndex.applyBatch(ch1, 0L, band, memb, rep, scope = "clusterstream")
    assert(ManifestTable.currentVersion(band) == vB, "scoped replays must skip")
  }
}
