package graft

import graft.sources.{ManifestTable, SpanIndex}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintained span-index lifecycle: (h → doc_id, p) window rows kept
  * current from corpus CDC — arrivals add live rows, retractions
  * tombstone the preimage's rows, an update's kept windows net to zero —
  * with maintained ≡ recomputed as the gate everywhere, plus replay
  * rejection and the two report faces (duplicated spans, contamination
  * probe) checked against from-scratch recomputes. */
class SpanIndexSpec extends SparkSpec {

  // 10-token texts so every doc has 3 windows at width 8; rep shares its
  // first 8 tokens with base (a planted cross-doc duplicated run)
  private val base = "a b c d e f g h i j"
  private val rep = "a b c d e f g h x y"
  private val other = "p q r s t u v w z0 z1"

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def idxSet(idx: String): Set[(String, Long, Int)] =
    SpanIndex.readSpanIndex(spark, idx).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  private def assertMatchesSnapshot(corpus: String, idx: String, clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpus)
    val expected = SpanIndex.computeSpanIndex(snap)
      .select(col("h"), col("doc_id"), col("p")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(idxSet(idx) == expected, s"span index drifted: $clue")
  }

  test("maintained span rows equal recomputed across insert / update / " +
    "delete commits; an update's kept windows are not rewritten; replay " +
    "is rejected") {
    val work = Files.createTempDirectory("graft-spanidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/span")

    val v1 = ManifestTable.merge(
      docsDf(1L -> base, 2L -> rep, 3L -> other), corpus, Seq("doc_id"))
    SpanIndex.refresh(spark, corpus, idx, 0, v1)
    assertMatchesSnapshot(corpus, idx, "after v1")
    // the planted shared window (both docs' position 0) is in the index
    val h0 = idxSet(idx).groupBy(_._1).filter(_._2.size >= 2)
    assert(h0.nonEmpty, "planted duplicated window missing")

    // v2: update doc 2 to unshare (old windows must retract) + new doc
    val v2 = ManifestTable.merge(
      docsDf(2L -> other, 4L -> base), corpus, Seq("doc_id"))
    SpanIndex.refresh(spark, corpus, idx, v1, v2)
    assertMatchesSnapshot(corpus, idx, "after v2 update")

    // v3: delete doc 1
    val v3 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 1L)
        .localCheckpoint(), corpus)
    SpanIndex.refresh(spark, corpus, idx, v2, v3)
    assertMatchesSnapshot(corpus, idx, "after v3 delete")

    // replay / overlap: no double-apply, no new version
    val vI = ManifestTable.currentVersion(idx)
    val before = idxSet(idx)
    SpanIndex.refresh(spark, corpus, idx, 0, v3)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(idxSet(idx) == before, "rows changed on replay")
  }

  test("maintainedDupSpans and probeContamination equal from-scratch " +
    "recomputes over the committed corpus (q148's and q150's answers " +
    "read from stored positions instead of re-hashing the corpus)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-spanidx2").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/span")
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    SpanIndex.refresh(spark, corpus, idx, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    SpanIndex.refresh(spark, corpus, idx, v1, v2)

    def spans(df: DataFrame): Set[(Long, Long, Long, Long)] = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // q148's brute recompute over the committed snapshot
    val snap = ManifestTable.read(spark, corpus)
    val got148 = spans(SpanIndex.maintainedDupSpans(spark, idx))
    val posSnap = graft.functions.TextOps.windowPositions(snap)
    val dupH = posSnap.groupBy($"h").agg(count(lit(1)).as("occ"))
      .where($"occ" >= 2L)
    val exp148 = spans(graft.functions.TextOps.mergeWindowCovers(
      posSnap.join(dupH, "h").select($"doc_id", $"p")))
    assert(got148 == exp148, "maintained dup spans drifted from recompute")

    // probe: the held-out batch against the maintained index vs a
    // from-scratch windows-semi-join over the snapshot
    val batch = all.where($"doc_id" % 10 === 9)
    val got = spans(SpanIndex.probeContamination(batch, spark, idx))
    val posAll = graft.functions.TextOps.windowPositions(snap)
    val evalW = graft.functions.TextOps.windowPositions(batch)
      .select($"h").distinct()
    val exp = spans(graft.functions.TextOps.mergeWindowCovers(
      posAll.join(evalW, Seq("h"), "left_semi").select($"doc_id", $"p")))
    assert(got == exp, "contamination probe drifted from recompute")
    assert(got.nonEmpty || exp.isEmpty)
  }
}
