package graft

import graft.sources.{ClusterIndex, DedupIndex, DfIndex, EntityIndex,
  ManifestTable, ModalityIndex, SpanIndex, StatsIndex, VecIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[graft.sources.MaintainedIndex.refreshBatched]] (VERDICT r18
  * #6): over a 20-commit history, ONE snapshot-diff catch-up commit
  * must land the index on exactly the rows 20 per-version refreshes
  * produce — including the case the diff base makes or breaks: a doc
  * updated BOTH before and after the watermark (diffing from below it
  * would leave the watermark state's facts live forever). The
  * lifecycle includes a mid-catch-up stop (crash analog: the merge is
  * atomic, so a crash IS a stop before the commit), a restart that
  * must resume from the watermark rather than the caller's fromV, a
  * per-version/batched interleave in one scope, and a replay that must
  * commit nothing. Driven through both protocol collapse shapes —
  * exact-fact ([[SpanIndex]]) and live-row-wins ([[ModalityIndex]]). */
class BatchedRefreshSpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def randomText(rng: scala.util.Random): String =
    Seq.fill(rng.nextInt(16))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  /** A 20-commit seeded history over a 30-id universe: mixed upserts
    * and deletes, with doc 0 REWRITTEN in every upsert commit so the
    * updated-across-the-watermark case is guaranteed, not left to the
    * seed. Returns the final version. */
  private def buildHistory(corpus: String, seed: Int): Int = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    var v = 0
    (1 to 20).foreach { _ =>
      val live = if (v == 0) Array.empty[Long]
        else ManifestTable.read(spark, corpus)
          .select($"doc_id").as[Long].collect()
      v = if (rng.nextInt(4) == 0 && live.length > 1) {
        val drop = rng.shuffle(live.toSeq).take(1 + rng.nextInt(2))
          .filterNot(_ == 0L).toSet
        if (drop.isEmpty) mergeUpserts(corpus, rng)
        else ManifestTable.commit(
          ManifestTable.read(spark, corpus)
            .where(!$"doc_id".isin(drop.toSeq: _*)).localCheckpoint(), corpus)
      } else mergeUpserts(corpus, rng)
    }
    v
  }

  private def mergeUpserts(corpus: String, rng: scala.util.Random): Int = {
    import spark.implicits._
    val n = 3 + rng.nextInt(6)
    val rows = (Seq.fill(n)((rng.nextInt(30).toLong, randomText(rng))) :+
        (0L, randomText(rng)))
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
    ManifestTable.merge(rows.toDF("doc_id", "text"), corpus, Seq("doc_id"))
  }

  private def snapshot(corpus: String): DataFrame =
    ManifestTable.read(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        col("text"))

  private def assertSame(clue: String, got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().map(_.toString).sorted
    val w = want.collect().map(_.toString).sorted
    assert(g.sameElements(w),
      s"$clue (got ${g.length} rows, want ${w.length})")
  }

  test("exact-fact front (SpanIndex): batched catch-up ≡ per-version ≡ " +
    "recomputed over 20 commits, with a mid-catch-up stop, a " +
    "per-version interleave and a replay") {
    val work = Files.createTempDirectory("graft-batched-span").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 51)
    assert(v == 20)
    // A: the per-version path, one commit per corpus version
    SpanIndex.refresh(spark, corpus, s"$work/a", 0, v)
    // B: three per-version steps, then a batched catch-up to v10 (the
    // "crash" is simply stopping there — the merge is atomic), then a
    // second catch-up that must resume from the watermark, not fromV=0
    SpanIndex.refresh(spark, corpus, s"$work/b", 0, 3)
    SpanIndex.refreshBatched(spark, corpus, s"$work/b", 0, 10)
    SpanIndex.refreshBatched(spark, corpus, s"$work/b", 0, v)
    val read = (r: String) => SpanIndex.readSpanIndex(spark, s"$work/$r")
    assertSame("batched diverged from per-version", read("b"), read("a"))
    assertSame("batched diverged from recompute", read("b"),
      SpanIndex.computeSpanIndex(snapshot(corpus).select(col("doc_id"), col("text")))
        .select(col("h"), col("doc_id"), col("p")))
    // replay: the whole range re-requested commits NOTHING
    val vIdx = ManifestTable.currentVersion(s"$work/b")
    SpanIndex.refreshBatched(spark, corpus, s"$work/b", 0, v)
    assert(ManifestTable.currentVersion(s"$work/b") == vIdx,
      "a replayed batched catch-up committed")
  }

  test("ref-count protocol (DedupIndex fp + band): batched catch-up ≡ " +
    "per-version ≡ recomputed over 20 commits, including a SPLIT " +
    "watermark (fp one commit ahead of band — the crash-between-the-" +
    "two-commits shape, where each table must diff from ITS OWN " +
    "watermark)") {
    val work = Files.createTempDirectory("graft-batched-dedup").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 53)
    assert(v == 20)
    DedupIndex.refreshIndexes(spark, corpus, s"$work/afp", s"$work/aband", 0, v)
    // B: per-version to 5, then a simulated crash at version 6 — the fp
    // commit landed, the band commit did not
    DedupIndex.refreshIndexes(spark, corpus, s"$work/bfp", s"$work/bband", 0, 5)
    val ch6 = ManifestTable.readChanges(spark, corpus, 5, 6, Seq("doc_id"),
      preimages = true).localCheckpoint()
    DedupIndex.maintainFpIndex(spark, ch6, s"$work/bfp",
      Some(ManifestTable.batchTag(DedupIndex.PollScope, 6L)))
    // batched catch-up: fp must diff from 6, band from 5 — a shared
    // diff base would double-count version 6's fps
    DedupIndex.refreshIndexesBatched(spark, corpus, s"$work/bfp", s"$work/bband", 0, 10)
    DedupIndex.refreshIndexesBatched(spark, corpus, s"$work/bfp", s"$work/bband", 0, v)
    import org.apache.spark.sql.functions.col
    def fp(r: String) = DedupIndex.readFpIndex(spark, s"$work/$r")
      .select(col("fp"), col("n_docs"))
    def band(r: String) = DedupIndex.readBandIndex(spark, s"$work/$r")
    assertSame("fp: batched diverged from per-version", fp("bfp"), fp("afp"))
    assertSame("band: batched diverged from per-version", band("bband"), band("aband"))
    val snap = ManifestTable.read(spark, corpus)
    assertSame("fp: batched diverged from recompute", fp("bfp"),
      DedupIndex.computeFpIndex(snap).select(col("fp"), col("n_docs")))
    assertSame("band: batched diverged from recompute", band("bband"),
      DedupIndex.computeBandIndex(snap).where(col("live"))
        .select(col("doc_id"), col("band"), col("bucket")))
    // replay commits nothing to either table
    val (vF, vB) = (ManifestTable.currentVersion(s"$work/bfp"),
      ManifestTable.currentVersion(s"$work/bband"))
    DedupIndex.refreshIndexesBatched(spark, corpus, s"$work/bfp", s"$work/bband", 0, v)
    assert(ManifestTable.currentVersion(s"$work/bfp") == vF &&
      ManifestTable.currentVersion(s"$work/bband") == vB,
      "a replayed batched catch-up committed")
  }

  test("live-row-wins front (ModalityIndex): batched catch-up ≡ " +
    "per-version ≡ recomputed over 20 commits (payload churn across " +
    "the watermark nets to the final payload, never an intermediate)") {
    val work = Files.createTempDirectory("graft-batched-mod").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 52)
    assert(v == 20)
    ModalityIndex.refresh(spark, corpus, s"$work/a", 0, v)
    ModalityIndex.refreshBatched(spark, corpus, s"$work/b", 0, 10)
    ModalityIndex.refreshBatched(spark, corpus, s"$work/b", 0, v)
    val read = (r: String) => ModalityIndex.readModalityIndex(spark, s"$work/$r")
    assertSame("batched diverged from per-version", read("b"), read("a"))
    assertSame("batched diverged from recompute", read("b"),
      ModalityIndex.computeModalityIndex(
        snapshot(corpus).select(col("doc_id"), col("n_chars")))
        .select(col("bk"), col("media_id"), col("hi"), col("lo")))
  }

  test("df ref-counts (DfIndex): batched catch-up ≡ per-version ≡ " +
    "recomputed over 20 commits — per-(doc, token) signs and the " +
    "corpus-size meta row telescope over the state diff") {
    val work = Files.createTempDirectory("graft-batched-df").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 54)
    DfIndex.refresh(spark, corpus, s"$work/a", 0, v)
    DfIndex.refreshBatched(spark, corpus, s"$work/b", 0, 10)
    DfIndex.refreshBatched(spark, corpus, s"$work/b", 0, v)
    def read(r: String) = DfIndex.readDfIndex(spark, s"$work/$r")
    assertSame("batched diverged from per-version", read("b"), read("a"))
  }

  test("affected-cluster re-solve (ClusterIndex band+memb+rep): batched " +
    "catch-up ≡ per-version ≡ recomputed over 20 commits, including a " +
    "SPLIT watermark (band one commit ahead — its prefix re-applies as " +
    "an idempotent keyed merge)") {
    val work = Files.createTempDirectory("graft-batched-cluster").toString
    val corpus = s"$work/corpus"
    val v = buildHistory(corpus, seed = 55)
    ClusterIndex.refresh(spark, corpus, s"$work/ab", s"$work/am", s"$work/ar", 0, v)
    ClusterIndex.refresh(spark, corpus, s"$work/bb", s"$work/bm", s"$work/br", 0, 5)
    // crash shape: version 6's band delta landed, the cluster re-solve
    // did not — the batched call must diff the clusters from 5 and
    // tolerate re-applying the band's already-written prefix
    val ch6 = ManifestTable.readChanges(spark, corpus, 5, 6, Seq("doc_id"),
      preimages = true).localCheckpoint()
    DedupIndex.maintainBandIndex(spark, ch6, s"$work/bb",
      Some(ManifestTable.batchTag(ClusterIndex.PollScope, 6L)))
    ClusterIndex.refreshBatched(spark, corpus, s"$work/bb", s"$work/bm",
      s"$work/br", 0, 12)
    ClusterIndex.refreshBatched(spark, corpus, s"$work/bb", s"$work/bm",
      s"$work/br", 0, v)
    def memb(r: String) = ClusterIndex.readMembership(spark, s"$work/$r")
    def band(r: String) = DedupIndex.readBandIndex(spark, s"$work/$r")
    assertSame("membership: batched diverged from per-version",
      memb("bm"), memb("am"))
    assertSame("band: batched diverged from per-version", band("bb"), band("ab"))
    assertSame("membership: batched diverged from recompute", memb("bm"),
      ClusterIndex.computeMembership(
        ManifestTable.read(spark, corpus).select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("rep")))
  }

  /** A 10-commit seeded history of (p_partkey, p_name) records —
    * two-word names over the tiny vocab, so blocking slots collide and
    * the levenshtein gate fires. */
  private def buildRecordsHistory(corpus: String, seed: Int): Int = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    def name(): String =
      s"${vocab(rng.nextInt(vocab.size))} ${vocab(rng.nextInt(vocab.size))}"
    var v = 0
    (1 to 10).foreach { _ =>
      val n = 2 + rng.nextInt(4)
      val rows = Seq.fill(n)((rng.nextInt(20).toLong, name()))
        .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
      v = if (rng.nextInt(4) == 0 && v > 0) {
        val live = ManifestTable.read(spark, corpus)
          .select($"p_partkey").as[Long].collect()
        if (live.length < 2) ManifestTable.merge(
          rows.toDF("p_partkey", "p_name"), corpus, Seq("p_partkey"))
        else ManifestTable.commit(
          ManifestTable.read(spark, corpus)
            .where($"p_partkey" =!= live(rng.nextInt(live.length)))
            .localCheckpoint(), corpus)
      } else ManifestTable.merge(
        rows.toDF("p_partkey", "p_name"), corpus, Seq("p_partkey"))
    }
    v
  }

  test("affected-entity re-solve (EntityIndex block+memb+ent): batched " +
    "catch-up ≡ per-version ≡ recomputed over a 10-commit record " +
    "history — net arrivals/retractions are computed against the " +
    "stored membership, which IS the watermark state") {
    val work = Files.createTempDirectory("graft-batched-entity").toString
    val corpus = s"$work/corpus"
    val v = buildRecordsHistory(corpus, seed = 56)
    assert(v == 10)
    EntityIndex.refresh(spark, corpus, s"$work/abl", s"$work/am", s"$work/ae", 0, v)
    EntityIndex.refreshBatched(spark, corpus, s"$work/bbl", s"$work/bm",
      s"$work/be", 0, 5)
    EntityIndex.refreshBatched(spark, corpus, s"$work/bbl", s"$work/bm",
      s"$work/be", 0, v)
    def memb(r: String) = EntityIndex.readMembership(spark, s"$work/$r")
    assertSame("membership: batched diverged from per-version",
      memb("bm"), memb("am"))
    assertSame("membership: batched diverged from recompute", memb("bm"),
      EntityIndex.computeEntities(
        ManifestTable.read(spark, corpus).select(col("p_partkey"), col("p_name")))
        .select(col("name"), col("entity"), col("n_records")))
  }

  test("frozen-quantizer cells (VecIndex) batched ≡ per-version ≡ " +
    "recomputed, and centered moments (StatsIndex) batched ≡ " +
    "per-version within float residue — a vector that churned N times " +
    "inside the range contributes one retraction + one addition") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val work = Files.createTempDirectory("graft-batched-vec").toString
    val (vecCorpus, statCorpus) = (s"$work/vcorpus", s"$work/scorpus")
    val rng = new scala.util.Random(58)
    val dims = 4
    def emb(id: Long, salt: Int): Seq[Double] =
      Seq.tabulate(dims)(k => ((id * 31 + k * 7 + salt * 13) % 11).toDouble / 3.0)
    val statSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = true))))
    def statRows(rows: Seq[(Long, Int)]): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(
        rows.map { case (id, s) => Row(id, emb(id, s)) }: _*), statSchema)
    def vecRows(rows: Seq[(Long, Int)]): org.apache.spark.sql.DataFrame =
      rows.map { case (id, s) =>
        (id, emb(id, s).map(_.toFloat), (id % 3).toInt) }
        .toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>"))
    // v1 seeds both corpora; 9 more commits of upserts (salt churn)
    val base = (0L until 12L).map(_ -> 0)
    var vv = ManifestTable.merge(vecRows(base), vecCorpus, Seq("vec_id"))
    var sv = ManifestTable.merge(statRows(base), statCorpus, Seq("vec_id"))
    (1 to 9).foreach { s =>
      val churn = Seq.fill(3)((rng.nextInt(12).toLong, s))
        .groupBy(_._1).map(_._2.head).toSeq
      vv = ManifestTable.merge(vecRows(churn), vecCorpus, Seq("vec_id"))
      sv = ManifestTable.merge(statRows(churn), statCorpus, Seq("vec_id"))
    }
    // VecIndex: both sides bootstrap the SAME frozen quantizer from v1
    def vboot(cent: String, idx: String): Unit = VecIndex.bootstrap(
      ManifestTable.readVersion(spark, vecCorpus, 1), cent, idx)
    vboot(s"$work/acent", s"$work/aidx")
    VecIndex.refresh(spark, vecCorpus, s"$work/acent", s"$work/aidx", 1, vv)
    vboot(s"$work/bcent", s"$work/bidx")
    VecIndex.refreshBatched(spark, vecCorpus, s"$work/bcent", s"$work/bidx", 1, 5)
    VecIndex.refreshBatched(spark, vecCorpus, s"$work/bcent", s"$work/bidx", 1, vv)
    def cells(r: String) = VecIndex.readCellIndex(spark, s"$work/$r")
      .select(col("vec_id"), col("cell"))
    assertSame("cells: batched diverged from per-version",
      cells("bidx"), cells("aidx"))
    // StatsIndex: same shape, float-tolerant compare
    def sboot(root: String): Unit = { StatsIndex.bootstrap(
      ManifestTable.readVersion(spark, statCorpus, 1), root, dims,
      tag = Some(ManifestTable.batchTag(StatsIndex.PollScope, 1L))); () }
    sboot(s"$work/astat")
    StatsIndex.refresh(spark, statCorpus, s"$work/astat", 1, sv)
    sboot(s"$work/bstat")
    StatsIndex.refreshBatched(spark, statCorpus, s"$work/bstat", 1, 5)
    StatsIndex.refreshBatched(spark, statCorpus, s"$work/bstat", 1, sv)
    def stats(r: String): Map[(Int, Int), Double] =
      StatsIndex.readStats(spark, s"$work/$r").collect()
        .map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    val (sa, sb) = (stats("astat"), stats("bstat"))
    assert(sa.keySet == sb.keySet)
    sa.foreach { case (k, va) =>
      val vb = sb(k)
      assert(math.abs(va - vb) <= 1e-9 * math.max(1.0, math.abs(va)),
        s"moment $k drifted beyond float residue: $va vs $vb")
    }
  }

  test("cluster band-ahead crash with an in-range REVERT (ADVICE r19): " +
    "a doc A→B in the crashed commit reverting B→A inside the catch-up " +
    "range nets to NOTHING from the cluster watermark — only the band " +
    "table's own diff carries the B→A event that retracts its stored B " +
    "rows") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-batched-cluster-revert").toString
    val corpus = s"$work/corpus"
    val textA = "alpha beta gamma delta epsilon"
    val textB = "zeta eta theta iota kappa"
    ManifestTable.merge(Seq((1L, textA), (2L, "alpha beta gamma delta zeta"))
      .toDF("doc_id", "text"), corpus, Seq("doc_id"))
    ClusterIndex.refresh(spark, corpus, s"$work/b", s"$work/m", s"$work/r", 0, 1)
    // v2: doc 1 A→B; the crash lands the band commit, not the re-solve
    ManifestTable.merge(Seq((1L, textB)).toDF("doc_id", "text"), corpus,
      Seq("doc_id"))
    val ch2 = ManifestTable.readChanges(spark, corpus, 1, 2, Seq("doc_id"),
      preimages = true).localCheckpoint()
    DedupIndex.maintainBandIndex(spark, ch2, s"$work/b",
      Some(ManifestTable.batchTag(ClusterIndex.PollScope, 2L)))
    // v3: doc 1 reverts B→A; an unrelated doc arrives too
    ManifestTable.merge(Seq((1L, textA), (3L, "kappa iota theta mu nu"))
      .toDF("doc_id", "text"), corpus, Seq("doc_id"))
    ClusterIndex.refreshBatched(spark, corpus, s"$work/b", s"$work/m",
      s"$work/r", 0, 3)
    val snap = ManifestTable.read(spark, corpus)
    assertSame("band rows diverged from recompute after a band-ahead revert " +
      "(B's rows were never retracted)",
      DedupIndex.readBandIndex(spark, s"$work/b"),
      DedupIndex.computeBandIndex(snap).where(col("live"))
        .select(col("doc_id"), col("band"), col("bucket")))
    assertSame("membership diverged from recompute",
      ClusterIndex.readMembership(spark, s"$work/m"),
      ClusterIndex.computeMembership(snap.select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("rep")))
    // both watermarks track toV (the metadata-only closer)
    assert(ManifestTable.lastBatchTag(s"$work/b", ClusterIndex.PollScope) == 3L)
    assert(ManifestTable.lastBatchTag(s"$work/m", ClusterIndex.PollScope) == 3L)
  }

  test("entity block-ahead crash with an in-range RE-ARRIVAL (ADVICE " +
    "r19): the crashed commit's block retraction is stored, the " +
    "membership one is not, and another part takes the name inside the " +
    "catch-up range — the net transition is count-only, so only the " +
    "per-version alignment replay re-marks the blocking keys live") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-batched-entity-revive").toString
    val corpus = s"$work/corpus"
    ManifestTable.merge(Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("p_partkey", "p_name"), corpus, Seq("p_partkey"))
    EntityIndex.refresh(spark, corpus, s"$work/bl", s"$work/m", s"$work/e", 0, 1)
    // v2: part 1 deleted — its name retracted; the injected crash lands
    // the block retraction (rows marked dead) but not the membership
    ManifestTable.commit(ManifestTable.read(spark, corpus)
      .where($"p_partkey" =!= 1L).localCheckpoint(), corpus)
    EntityIndex.injectCrashBetweenCommits = true
    intercept[Exception] {
      EntityIndex.refresh(spark, corpus, s"$work/bl", s"$work/m", s"$work/e", 1, 2)
    }
    assert(ManifestTable.lastBatchTag(s"$work/bl", EntityIndex.PollScope) == 2L &&
      ManifestTable.lastBatchTag(s"$work/m", EntityIndex.PollScope) == 1L,
      "crash shape not established: block must be one ahead of membership")
    // v3: part 3 takes the same name — the re-arrival
    ManifestTable.merge(Seq((3L, "alpha beta")).toDF("p_partkey", "p_name"),
      corpus, Seq("p_partkey"))
    EntityIndex.refreshBatched(spark, corpus, s"$work/bl", s"$work/m",
      s"$work/e", 0, 3)
    val snap = ManifestTable.read(spark, corpus)
    // the name's blocking keys must generate candidates again: live
    // stored block rows ≡ the blocks of the live name set
    assertSame("live block rows diverged from recompute (the retracted " +
      "name's keys were never revived)",
      ManifestTable.read(spark, s"$work/bl").where(col("live"))
        .select(col("slot"), col("key"), col("name")),
      graft.functions.EntityOps.blocksOfNames(
        snap.select(col("p_name").as("name")).distinct())
        .select(col("slot"), col("key"), col("name")))
    assertSame("membership diverged from recompute",
      EntityIndex.readMembership(spark, s"$work/m"),
      EntityIndex.computeEntities(
        snap.select(col("p_partkey"), col("p_name")))
        .select(col("name"), col("entity"), col("n_records")))
    assert(ManifestTable.lastBatchTag(s"$work/m", EntityIndex.PollScope) == 3L)
    assert(ManifestTable.lastBatchTag(s"$work/bl", EntityIndex.PollScope) == 3L)
  }

  test("empty-net catch-up advances the watermark with a METADATA-ONLY " +
    "commit (ADVICE r19), so the diff base tracks toV and a vacuumed " +
    "corpus no longer strands a fully-current index") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-batched-tagonly").toString
    val corpus = s"$work/corpus"
    val idx = s"$work/idx"
    val longText = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa alpha gamma epsilon eta iota beta delta zeta theta kappa"
    ManifestTable.merge(Seq((1L, longText)).toDF("doc_id", "text"), corpus,
      Seq("doc_id"))
    SpanIndex.refresh(spark, corpus, idx, 0, 1)
    val before = SpanIndex.readSpanIndex(spark, idx).collect()
      .map(_.toString).sorted
    assert(before.nonEmpty, "fixture must seed span facts")
    // v2, v3: a doc arrives and leaves — the range diff nets to zero
    ManifestTable.merge(Seq((9L, "delta epsilon zeta eta theta iota kappa " +
      "alpha beta gamma delta epsilon")).toDF("doc_id", "text"), corpus,
      Seq("doc_id"))
    ManifestTable.commit(ManifestTable.read(spark, corpus)
      .where($"doc_id" =!= 9L).localCheckpoint(), corpus)
    SpanIndex.refreshBatched(spark, corpus, idx, 0, 3)
    assert(ManifestTable.lastBatchTag(idx, SpanIndex.PollScope) == 3L,
      "empty-net catch-up must still advance the watermark")
    // pure metadata: the index rows are untouched
    val after = SpanIndex.readSpanIndex(spark, idx).collect()
      .map(_.toString).sorted
    assert(after.sameElements(before), "a metadata-only advance changed rows")
    // the payoff: vacuum the corpus past the OLD base, keep only the
    // current version — catch-up from the advanced watermark still works
    ManifestTable.vacuum(corpus, keepVersions = 1, orphanGraceMs = 0L)
    ManifestTable.merge(Seq((2L, "eta theta iota kappa alpha beta gamma " +
      "delta epsilon zeta eta kappa")).toDF("doc_id", "text"), corpus,
      Seq("doc_id"))
    SpanIndex.refreshBatched(spark, corpus, idx, 0, 4)
    assertSame("post-vacuum catch-up diverged from recompute",
      SpanIndex.readSpanIndex(spark, idx),
      SpanIndex.computeSpanIndex(ManifestTable.read(spark, corpus)
        .select(col("doc_id"), col("text")))
        .select(col("h"), col("doc_id"), col("p")))
    // and a replay of the advanced range commits nothing
    val vIdx = ManifestTable.currentVersion(idx)
    SpanIndex.refreshBatched(spark, corpus, idx, 0, 4)
    assert(ManifestTable.currentVersion(idx) == vIdx,
      "a replay after a metadata-only advance committed")
  }
}
