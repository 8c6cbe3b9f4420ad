package graft

import graft.sources.{CrossModalIndex, DedupIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lifecycle of the maintained CROSS-MODAL image index: banded aHash
  * rows of q195's content-keyed captioned images kept current from
  * corpus CDC — arrivals derive and add live rows, retractions
  * tombstone the preimage's rows, a text edit that keeps the caption's
  * minimum shingle hash keeps the image and commits NOTHING, replay is
  * rejected, the turnkey stream survives a checkpoint restart, and the
  * two read faces (q197 report against the text band index, q198
  * probe) equal from-scratch brute recomputes. */
class CrossModalIndexSpec extends SparkSpec {

  // images live on doc_id % 3 == 0; the seed is the caption's h0
  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def idxSet(idx: String): Set[(Long, Long, Long, Long)] =
    CrossModalIndex.readCrossModalIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def assertMatchesSnapshot(corpus: String, idx: String,
      clue: String): Unit = {
    val snap = ManifestTable.read(spark, corpus).select(col("doc_id"), col("text"))
    val expected = CrossModalIndex.computeCrossModalIndex(snap)
      .select(col("bk"), col("media_id"), col("hi"), col("lo")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(idxSet(idx) == expected, s"cross-modal index drifted: $clue")
  }

  test("maintained band rows equal recomputed across insert / update / " +
    "delete commits; a text edit that keeps the caption's h0 (append a " +
    "repeated token: the distinct shingle set is unchanged) commits " +
    "NOTHING; replay is rejected") {
    val work = Files.createTempDirectory("graft-xmodidx").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/xmod")

    // docs 0 and 6 carry images (identical caption -> identical seed ->
    // identical image, the planted dup_pair); 3 distinct; 2 is no-image
    val v1 = ManifestTable.merge(docsDf(
      0L -> "alpha beta gamma delta epsilon",
      6L -> "alpha beta gamma delta epsilon",
      3L -> "one two three four five six seven",
      2L -> "not an image doc"), corpus, Seq("doc_id"))
    CrossModalIndex.refresh(spark, corpus, idx, 0, v1)
    assertMatchesSnapshot(corpus, idx, "after v1")
    val rows1 = idxSet(idx)
    assert(rows1.map(_._2) == Set(0L, 3L, 6L), "media ids in index")
    val byId = rows1.groupBy(_._2)
    assert(byId(0L).map(t => (t._1, t._3, t._4)) ==
      byId(6L).map(t => (t._1, t._3, t._4)),
      "identical captions must collide on every band")

    // v2: doc 3's caption changes materially -> new seed, new bands
    val v2 = ManifestTable.merge(
      docsDf(3L -> "entirely different caption words go here now"),
      corpus, Seq("doc_id"))
    CrossModalIndex.refresh(spark, corpus, idx, v1, v2)
    assertMatchesSnapshot(corpus, idx, "after v2 update")

    // v3: doc 0's caption gains a REPEATED shingle ("b b b b" has the
    // same distinct shingle set as "b b b b b") -> h0 unchanged -> the
    // image is unchanged and the index MUST NOT commit. Seed it first.
    val v3a = ManifestTable.merge(docsDf(12L -> "b b b b"), corpus, Seq("doc_id"))
    CrossModalIndex.refresh(spark, corpus, idx, v2, v3a)
    assertMatchesSnapshot(corpus, idx, "after v3a insert")
    val vIdxBefore = ManifestTable.currentVersion(idx)
    val v3 = ManifestTable.merge(docsDf(12L -> "b b b b b"), corpus, Seq("doc_id"))
    CrossModalIndex.refresh(spark, corpus, idx, v3a, v3)
    assert(ManifestTable.currentVersion(idx) == vIdxBefore,
      "an h0-preserving caption edit wrote the index")
    assertMatchesSnapshot(corpus, idx, "after v3 no-op update")

    // v4: delete doc 6 -> its 4 band rows tombstone
    val v4 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 6L)
        .localCheckpoint(), corpus)
    CrossModalIndex.refresh(spark, corpus, idx, v3, v4)
    assertMatchesSnapshot(corpus, idx, "after v4 delete")
    assert(!idxSet(idx).map(_._2).contains(6L), "deleted media still live")

    // replay / overlap: no double-apply, no new version
    val vI = ManifestTable.currentVersion(idx)
    val before = idxSet(idx)
    CrossModalIndex.refresh(spark, corpus, idx, 0, v4)
    assert(ManifestTable.currentVersion(idx) == vI, "replay committed")
    assert(idxSet(idx) == before, "rows changed on replay")
  }

  test("turnkey startMaintenance keeps the table equal to the corpus " +
    "across commits and a checkpoint restart") {
    val work = Files.createTempDirectory("graft-xmod-turnkey").toString
    val (corpus, idx, ckpt) = (s"$work/corpus", s"$work/xmod", s"$work/ckpt")
    ManifestTable.merge(docsDf(
      0L -> "alpha beta gamma delta epsilon",
      3L -> "one two three four five"), corpus, Seq("doc_id"))
    val q = CrossModalIndex.startMaintenance(spark, corpus, idx, ckpt)
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey bootstrap")
    ManifestTable.merge(docsDf(6L -> "alpha beta gamma delta epsilon",
      0L -> "caption rewritten to a new seed"), corpus, Seq("doc_id"))
    q.processAllAvailable()
    assertMatchesSnapshot(corpus, idx, "turnkey incremental commit")
    q.stop()
    ManifestTable.merge(docsDf(9L -> "a ninth caption arrives offline"),
      corpus, Seq("doc_id"))
    val q2 = CrossModalIndex.startMaintenance(spark, corpus, idx, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assertMatchesSnapshot(corpus, idx, "turnkey restart")
  }

  test("maintainedCrossModalPairs and probeCrossModal equal brute-force " +
    "recomputes over the committed corpus (the q197/q198 answers read " +
    "the two stored tables instead of re-shingling or re-deriving " +
    "images)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-xmod-reads").toString
    val (corpus, xmod, band) = (s"$work/corpus", s"$work/xmod", s"$work/band")
    val all = Tables(spark, sf0001, "documents").select($"doc_id", $"text")
    val v1 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 0), corpus, Seq("doc_id"))
    CrossModalIndex.refresh(spark, corpus, xmod, 0, v1)
    val v2 = ManifestTable.merge(
      all.where($"doc_id" % 10 =!= 9 && $"doc_id" % 2 === 1), corpus, Seq("doc_id"))
    CrossModalIndex.refresh(spark, corpus, xmod, v1, v2)
    (0 until v2).foreach { v =>
      val ch = ManifestTable.readChanges(
        spark, corpus, v, v + 1, Seq("doc_id"), preimages = true)
      DedupIndex.maintainBandIndex(spark, ch.localCheckpoint(), band)
    }

    // brute ground truth, driver-side (tiny at sf0.001): image pairs =
    // all hash pairs at Hamming ≤ 3 (pigeonhole: ≤ 3 differing bits
    // always share a band; sf0.001 sits far under the hot-band cap),
    // caption pairs = the in-memory (band, bucket) self-join
    val snap = ManifestTable.read(spark, corpus).select($"doc_id", $"text")
    def hashes(docs: DataFrame): Array[(Long, Long, Long)] =
      graft.sources.CrossModalIndex.bandFacts(docs)
        .select($"media_id", $"hi", $"lo").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def capRows(docs: DataFrame): Array[(Long, Int, String)] =
      graft.functions.TextOps.bandRowsOf(docs)
        .where($"doc_id" % 3 === 0)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Int]("band"), r.getAs[String]("bucket")))
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
    def classify(img: Set[(Long, Long)], cap: Set[(Long, Long)]) =
      (img ++ cap).map { case (x, y) =>
        val (i, c) = (img((x, y)), cap((x, y)))
        (x, y, i, c,
          if (i && c) "dup_pair" else if (i) "recaptioned" else "reillustrated")
      }

    val ch = hashes(snap)
    val imgPairs = (for { a <- ch; b <- ch if a._1 < b._1 && ham(a, b) <= 3 }
      yield (a._1, b._1)).toSet
    val cr = capRows(snap)
    val capPairs = (for {
      a <- cr; b <- cr if a._1 < b._1 && a._2 == b._2 && a._3 == b._3
    } yield (a._1, b._1)).toSet
    val expReport = classify(imgPairs, capPairs)
    val gotReport = CrossModalIndex
      .maintainedCrossModalPairs(spark, xmod, band)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4))).toSet
    assert(gotReport == expReport, "maintained cross-modal report drifted")
    assert(gotReport.nonEmpty, "fixture should surface pairs")

    // probe: held-out batch vs corpus, brute = cross-split recompute
    val batch = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").where($"doc_id" % 10 === 9)
    val ph = hashes(batch)
    val imgProbe = (for { p <- ph; c <- ch if ham(p, c) <= 3 }
      yield (p._1, c._1)).toSet
    val pr = capRows(batch)
    val capProbe = (for {
      p <- pr; c <- cr if p._2 == c._2 && p._3 == c._3
    } yield (p._1, c._1)).toSet
    val expProbe = classify(imgProbe, capProbe)
    val gotProbe = CrossModalIndex.probeCrossModal(batch, spark, xmod, band)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4))).toSet
    assert(gotProbe == expProbe, "cross-modal probe drifted")
  }
}
