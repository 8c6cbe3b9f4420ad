package graft

import graft.sources.{EntityIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained ENTITY RESOLUTION lifecycle: record CDC in, resolved
  * name→entity catalog out, kept current by affected-entity-bounded
  * maintenance. The gate everywhere is maintained ≡ recomputed
  * ([[EntityIndex.computeEntities]] over the current record snapshot) —
  * across arrivals, a variant-name entity MERGE, a rename
  * (retraction + arrival, split + merge in one batch), count-only
  * deltas, a full retraction, block-cap crossings in both directions,
  * the injected crash between the two entity commits, replay rejection,
  * and turnkey-stream parity on the real part table. */
class EntityIndexSpec extends SparkSpec {

  private def recs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("p_partkey", "p_name")
  }

  private def membSet(membRoot: String): Set[(String, String, Long)] =
    EntityIndex.readMembership(spark, membRoot).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def expected(corpus: String, cap: Long = 10000L): Set[(String, String, Long)] =
    EntityIndex.computeEntities(ManifestTable.read(spark, corpus), cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def roll(corpus: String, blocks: String, memb: String, ents: String,
      fromV: Int, toV: Int, cap: Long = 10000L): Unit =
    EntityIndex.refresh(spark, corpus, blocks, memb, ents, fromV, toV, cap)

  test("maintained entities equal recomputed across arrival / variant-" +
    "merge / rename-split / count-delta / retraction commits, replay rejected") {
    val work = Files.createTempDirectory("graft-entidx").toString
    val (corpus, blocks, memb, ents) =
      (s"$work/corpus", s"$work/blocks", s"$work/memb", s"$work/ents")

    // v1: three entities, one with two records
    val v1 = ManifestTable.merge(
      recs(1L -> "alpha one", 2L -> "alpha one", 3L -> "beta two",
        4L -> "gamma three"), corpus, Seq("p_partkey"))
    roll(corpus, blocks, memb, ents, 0, v1)
    assert(membSet(memb) == expected(corpus), "after v1")
    assert(membSet(memb) == Set(("alpha one", "alpha one", 2L),
      ("beta two", "beta two", 1L), ("gamma three", "gamma three", 1L)))

    // v2: a typo VARIANT arrives (lev 1, shared adjective block) and
    // merges into the alpha entity; a duplicate record bumps beta's
    // count without touching any entity
    val v2 = ManifestTable.merge(
      recs(5L -> "alpha onee", 6L -> "beta two"), corpus, Seq("p_partkey"))
    roll(corpus, blocks, memb, ents, v1, v2)
    assert(membSet(memb) == expected(corpus), "after v2 variant arrival")
    assert(membSet(memb) == Set(("alpha one", "alpha one", 2L),
      ("alpha onee", "alpha one", 1L), ("beta two", "beta two", 2L),
      ("gamma three", "gamma three", 1L)))

    // v3: record 5 is RENAMED — "alpha onee" fully retracts (split off
    // the alpha entity) and "gamma threeq" arrives (merging into gamma):
    // a split and a merge from one update's preimage/postimage pair
    val v3 = ManifestTable.merge(recs(5L -> "gamma threeq"), corpus, Seq("p_partkey"))
    roll(corpus, blocks, memb, ents, v2, v3)
    assert(membSet(memb) == expected(corpus), "after v3 rename")
    assert(membSet(memb) == Set(("alpha one", "alpha one", 2L),
      ("beta two", "beta two", 2L), ("gamma three", "gamma three", 1L),
      ("gamma threeq", "gamma three", 1L)))

    // v4: delete one of alpha's two records — count-only
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("p_partkey") =!= 2L)
        .localCheckpoint(), corpus)
    roll(corpus, blocks, memb, ents, v3, v4)
    assert(membSet(memb) == expected(corpus), "after v4 count-only delete")
    assert(membSet(memb)(("alpha one", "alpha one", 1L)))

    // v5: delete alpha's LAST record — the name retracts and the
    // entity disappears
    val v5 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("p_partkey") =!= 1L)
        .localCheckpoint(), corpus)
    roll(corpus, blocks, memb, ents, v4, v5)
    assert(membSet(memb) == expected(corpus), "after v5 retraction")
    assert(!membSet(memb).exists(_._1 == "alpha one"))

    // replay the last version range: the membership watermark rejects
    val vM = ManifestTable.currentVersion(memb)
    roll(corpus, blocks, memb, ents, v4, v5)
    assert(ManifestTable.currentVersion(memb) == vM,
      "replayed batch must not commit a new membership version")
    assert(membSet(memb) == expected(corpus), "after replay")

    // the per-entity rollup face agrees with a recompute-side rollup
    val roll162 = EntityIndex.readEntities(spark, memb).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(roll162 == Set(("beta two", 1L, 2L), ("gamma three", 2L, 2L)))
  }

  test("the maintenance contract is blocker-generic (VERDICT r15 stretch): " +
    "under PartBlockers3 a both-token vowel typo that 2-pass token blocking " +
    "is blind to still merges through the skeleton pass, maintained ≡ " +
    "recomputed holds across its arrival and retraction, and the 2-pass " +
    "recompute over the same snapshot confirms the blindness") {
    import graft.functions.EntityOps
    val b3 = EntityOps.PartBlockers3
    val work = Files.createTempDirectory("graft-entidx3").toString
    val (corpus, blocks, memb, ents) =
      (s"$work/corpus", s"$work/blocks", s"$work/memb", s"$work/ents")
    def roll3(fromV: Int, toV: Int): Unit =
      EntityIndex.refresh(spark, corpus, blocks, memb, ents, fromV, toV,
        10000L, b3)
    def expected3(): Set[(String, String, Long)] =
      EntityIndex.computeEntities(ManifestTable.read(spark, corpus), 10000L, b3)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val v1 = ManifestTable.merge(
      recs(1L -> "arctic rose", 2L -> "beta two"), corpus, Seq("p_partkey"))
    roll3(0, v1)
    assert(membSet(memb) == expected3(), "after v1")

    // "erctic rosa": both tokens typo'd (adj and noun blocks both miss),
    // same consonant skeleton "rctc", lev 2 — only pass 3 can see it
    val v2 = ManifestTable.merge(recs(3L -> "erctic rosa"), corpus, Seq("p_partkey"))
    roll3(v1, v2)
    assert(membSet(memb) == expected3(), "after v2 skeleton-only arrival")
    assert(membSet(memb)(("erctic rosa", "arctic rose", 1L)),
      "skeleton-only variant must merge into the arctic entity")
    val twoPass = EntityIndex.computeEntities(
        ManifestTable.read(spark, corpus), 10000L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(twoPass(("erctic rosa", "erctic rosa")),
      "2-pass recompute should be blind to the variant — fixture lost its point")

    // retract the original: the variant splits back to a singleton
    val v3 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("p_partkey") =!= 1L)
        .localCheckpoint(), corpus)
    roll3(v2, v3)
    assert(membSet(memb) == expected3(), "after v3 retraction")
    assert(membSet(memb)(("erctic rosa", "erctic rosa", 1L)))

    // replay rejection holds under the wider block set too
    val vM = ManifestTable.currentVersion(memb)
    roll3(v2, v3)
    assert(ManifestTable.currentVersion(memb) == vM, "replay committed")
  }

  test("block-cap crossings re-cluster the whole block: an arrival that " +
    "pushes a block over the cap SPLITS its entities; the retraction " +
    "that brings it back under RE-MERGES them") {
    val cap = 2L
    val work = Files.createTempDirectory("graft-entidx-cap").toString
    val (corpus, blocks, memb, ents) =
      (s"$work/corpus", s"$work/blocks", s"$work/memb", s"$work/ents")

    // v1: "red a"/"red b" share the capped adjective block (size 2 ≤ 2)
    // and sit at lev 1 → one entity
    val v1 = ManifestTable.merge(
      recs(1L -> "red a", 2L -> "red b"), corpus, Seq("p_partkey"))
    roll(corpus, blocks, memb, ents, 0, v1, cap)
    assert(membSet(memb) == expected(corpus, cap), "after v1")
    assert(membSet(memb) == Set(("red a", "red a", 1L), ("red b", "red a", 1L)))

    // v2: "red c" arrives → the adjective block hits 3 > cap and is
    // DROPPED; the nouns are all distinct singleton blocks, so every
    // name splits to its own entity — including the two UNTOUCHED ones
    val v2 = ManifestTable.merge(recs(3L -> "red c"), corpus, Seq("p_partkey"))
    roll(corpus, blocks, memb, ents, v1, v2, cap)
    assert(membSet(memb) == expected(corpus, cap), "after v2 over-cap")
    assert(membSet(memb) == Set(("red a", "red a", 1L), ("red b", "red b", 1L),
      ("red c", "red c", 1L)))

    // v3: "red c" retracts → the block drops back to 2 ≤ cap and the
    // two survivors RE-MERGE — new edges with neither endpoint changed
    val v3 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("p_partkey") =!= 3L)
        .localCheckpoint(), corpus)
    roll(corpus, blocks, memb, ents, v2, v3, cap)
    assert(membSet(memb) == expected(corpus, cap), "after v3 back under cap")
    assert(membSet(memb) == Set(("red a", "red a", 1L), ("red b", "red a", 1L)))
  }

  test("crash BETWEEN the two entity commits (members-by-entity " +
    "committed, membership not): the replay re-enters and converges") {
    val work = Files.createTempDirectory("graft-entidx-crash").toString
    val (corpus, blocks, memb, ents) =
      (s"$work/corpus", s"$work/blocks", s"$work/memb", s"$work/ents")
    val v1 = ManifestTable.merge(
      recs(1L -> "alpha one", 2L -> "beta two"), corpus, Seq("p_partkey"))
    roll(corpus, blocks, memb, ents, 0, v1)

    // v2 merges a variant into alpha — and the JVM "dies" after the
    // members-by-entity commit, before membership
    val v2 = ManifestTable.merge(recs(3L -> "alpha onee"), corpus, Seq("p_partkey"))
    val ch = ManifestTable.readChanges(
      spark, corpus, v1, v2, Seq("p_partkey"), preimages = true)
    EntityIndex.injectCrashBetweenCommits = true
    intercept[IllegalStateException] {
      EntityIndex.applyBatch(ch, v2.toLong, blocks, memb, ents)
    }
    assert(ManifestTable.lastBatchTag(memb) < v2.toLong,
      "membership must NOT carry the batch tag after the injected crash")

    // replay converges and the two tables agree
    EntityIndex.applyBatch(ch, v2.toLong, blocks, memb, ents)
    assert(membSet(memb) == expected(corpus), "membership after crash+replay")
    val byEnt = ManifestTable.read(spark, ents).where(col("live"))
      .select(col("name"), col("entity")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(byEnt == membSet(memb).map(t => (t._1, t._2)),
      s"entity table diverged: ents=$byEnt memb=${membSet(memb)}")

    // second replay of the SAME id: watermark skips
    val vM = ManifestTable.currentVersion(memb)
    EntityIndex.applyBatch(ch, v2.toLong, blocks, memb, ents)
    assert(ManifestTable.currentVersion(memb) == vM)
  }

  test("turnkey startMaintenance keeps entities current across commits " +
    "and a restart, matching the recompute on the real part table") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-entidx2").toString
    val (corpus, blocks, memb, ents) =
      (s"$work/corpus", s"$work/blocks", s"$work/memb", s"$work/ents")
    val ckpt = s"$work/ckpt"
    val all = Tables(spark, sf0001, "part").select($"p_partkey", $"p_name")
    ManifestTable.merge(all.where($"p_partkey" % 2 === 0), corpus, Seq("p_partkey"))
    val q = EntityIndex.startMaintenance(spark, corpus, blocks, memb, ents, ckpt)
    q.processAllAvailable()
    assert(membSet(memb) == expected(corpus), "turnkey bootstrap half")
    ManifestTable.merge(all.where($"p_partkey" % 2 === 1), corpus, Seq("p_partkey"))
    q.processAllAvailable()
    q.stop()
    assert(membSet(memb) == expected(corpus), "turnkey full corpus")

    // restart absorbs an offline rename commit (retractions + typo
    // arrivals — the EntityIndexFixtures churn shape)
    ManifestTable.merge(
      all.where(pmod(xxhash64($"p_name"), lit(5)) === 0)
        .withColumn("p_name", concat($"p_name", lit("q"))),
      corpus, Seq("p_partkey"))
    val q2 = EntityIndex.startMaintenance(spark, corpus, blocks, memb, ents, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(membSet(memb) == expected(corpus), "after restart + rename commit")
  }
}
