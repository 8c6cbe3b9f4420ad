package graft

import graft.sources.{MaintainedIndex, ManifestTable}
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The [[MaintainedIndex]] contract, clause by clause, on a SYNTHETIC
  * front (VERDICT r18 #7): every production front's facts are opaque
  * hashes, so their specs can assert maintained ≡ recomputed but not
  * point at an individual clause's behavior. Character bigrams are
  * exhaustively enumerable by eye — "abcd" IS {ab, bc, cd} — so each
  * documented clause gets its own direct witness, independent of any
  * production generator's incidental structure:
  *
  *  1. kept-fact ZERO-NETTING: an update's kept facts are NOT
  *     rewritten — pinned by diffing the INDEX table's own commit
  *     (the index is a ManifestTable; its version diff is the write);
  *  2. LIVE-ROW-WINS tie-break: when a merge key survives an update
  *     with a changed payload, the live row wins BECAUSE it is alive,
  *     not because its payload compares higher — pinned with a new
  *     payload that sorts BELOW the old one;
  *  3. TOMBSTONE visibility: dropped facts stay as alive=false rows in
  *     the stored table (so probes meeting the bucket see the
  *     retraction) while the live read filters them; a re-insert
  *     resurrects the same key;
  *  4. exactly-once: a replayed applyBatch commits nothing. */
class SyntheticFrontSpec extends SparkSpec {

  /** Exact-fact synthetic front: one row per DISTINCT bigram per doc. */
  private object BigramIndex extends MaintainedIndex {
    private[graft] val PollScope = "spec-bigram"
    protected def bucketKey: String = "bg"
    protected def mergeKeyCols: Seq[String] = Seq("bg", "doc_id")
    override protected def changeCols = Seq(col("doc_id"), col("text"))
    protected def facts(docs: DataFrame): DataFrame = bigrams(docs)
      .select(col("bg"), col("doc_id")).distinct()
    def boot(d: DataFrame, r: String): Int = bootstrapIndex(d, r)
    def apply(ch: DataFrame, id: Long, r: String): Unit = applyBatch(ch, id, r)
    def live(s: SparkSession, r: String): DataFrame = readLiveRows(s, r)
    def compute(d: DataFrame): DataFrame = computeIndexOf(d)
  }

  /** Live-row-wins synthetic front: the payload is the bigram's
    * occurrence count in the doc. */
  private object BigramCountIndex extends MaintainedIndex {
    private[graft] val PollScope = "spec-bigram-count"
    protected def bucketKey: String = "bg"
    protected def mergeKeyCols: Seq[String] = Seq("bg", "doc_id")
    override protected def payloadCols: Seq[String] = Seq("n")
    override protected def changeCols = Seq(col("doc_id"), col("text"))
    protected def facts(docs: DataFrame): DataFrame = bigrams(docs)
      .groupBy(col("bg"), col("doc_id")).agg(count(lit(1)).as("n"))
    def boot(d: DataFrame, r: String): Int = bootstrapIndex(d, r)
    def apply(ch: DataFrame, id: Long, r: String): Unit = applyBatch(ch, id, r)
    def live(s: SparkSession, r: String): DataFrame = readLiveRows(s, r)
  }

  private def bigrams(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, greatest(length(text) - 1, 0)), " +
        "i -> substring(text, i, 2))")).as("bg"))
    .where(length(col("bg")) === 2)

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** CDC delta of one corpus version, the shape refresh feeds. */
  private def delta(corpus: String, v: Int): DataFrame =
    ManifestTable.readChanges(spark, corpus, v - 1, v, Seq("doc_id"),
      preimages = true).localCheckpoint()

  test("clause 1 — kept-fact zero-netting: updating 'abcd' to 'abce' " +
    "writes ONLY the dropped cd tombstone and the new ce row; the kept " +
    "ab/bc rows are not touched by the index commit") {
    val work = Files.createTempDirectory("graft-syn-net").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/idx")
    val v1 = ManifestTable.merge(docsDf(1L -> "abcd"), corpus, Seq("doc_id"))
    BigramIndex.apply(delta(corpus, v1), 1L, idx)
    assert(BigramIndex.live(spark, idx).collect().map(_.getString(0)).sorted
      .sameElements(Array("ab", "bc", "cd")))
    val vIdxBefore = ManifestTable.currentVersion(idx)
    val v2 = ManifestTable.merge(docsDf(1L -> "abce"), corpus, Seq("doc_id"))
    BigramIndex.apply(delta(corpus, v2), 2L, idx)
    // the index is itself a ManifestTable: its version diff IS the write
    val written = ManifestTable.readChanges(spark, idx, vIdxBefore,
      ManifestTable.currentVersion(idx), Seq("bg", "doc_id"))
      .select(col("bg"), col("alive"), col("_change_type")).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    assert(written == Set(("cd", false, "update_postimage"), ("ce", true, "insert")),
      s"index commit touched more than the net change: $written")
    assert(BigramIndex.live(spark, idx).collect().map(_.getString(0)).sorted
      .sameElements(Array("ab", "bc", "ce")))
  }

  test("clause 2 — live-row-wins BECAUSE alive, not payload order: an " +
    "update that shrinks ab's count 4 -> 1 must store 1 (the live row " +
    "sorts below the dead one on payload alone)") {
    val work = Files.createTempDirectory("graft-syn-lrw").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/idx")
    // "ababababa": ab x4, ba x4 ; update to "abz": ab x1, bz x1
    val v1 = ManifestTable.merge(docsDf(1L -> "ababababa"), corpus, Seq("doc_id"))
    BigramCountIndex.apply(delta(corpus, v1), 1L, idx)
    val v2 = ManifestTable.merge(docsDf(1L -> "abz"), corpus, Seq("doc_id"))
    BigramCountIndex.apply(delta(corpus, v2), 2L, idx)
    val live = BigramCountIndex.live(spark, idx).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(live == Map("ab" -> 1L, "bz" -> 1L),
      s"live rows after shrink-update: $live")
    // the dropped ba key is a tombstone carrying SOME payload, not gone
    val stored = ManifestTable.read(spark, idx)
      .where(col("bg") === "ba").select(col("alive")).collect()
    assert(stored.map(_.getBoolean(0)).toSeq == Seq(false))
  }

  test("clause 3 — tombstone visibility and resurrection: a deleted " +
    "doc's facts stay stored as alive=false, vanish from the live " +
    "read, and a re-insert flips the same keys back") {
    val work = Files.createTempDirectory("graft-syn-tomb").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/idx")
    val v1 = ManifestTable.merge(docsDf(1L -> "abc", 2L -> "xy"),
      corpus, Seq("doc_id"))
    BigramIndex.apply(delta(corpus, v1), 1L, idx)
    val v2 = ManifestTable.commit(
      ManifestTable.read(spark, corpus).where(col("doc_id") =!= 1L)
        .localCheckpoint(), corpus)
    BigramIndex.apply(delta(corpus, v2), 2L, idx)
    assert(BigramIndex.live(spark, idx).collect().map(_.getString(0)).toSeq
      == Seq("xy"))
    val tombs = ManifestTable.read(spark, idx).where(!col("alive"))
      .select(col("bg")).collect().map(_.getString(0)).sorted
    assert(tombs.sameElements(Array("ab", "bc")), tombs.mkString(","))
    val v3 = ManifestTable.merge(docsDf(1L -> "abc"), corpus, Seq("doc_id"))
    BigramIndex.apply(delta(corpus, v3), 3L, idx)
    assert(BigramIndex.live(spark, idx).collect().map(_.getString(0)).sorted
      .sameElements(Array("ab", "bc", "xy")))
  }

  test("clause 4 — exactly-once: a replayed batch id commits nothing " +
    "and changes no row") {
    val work = Files.createTempDirectory("graft-syn-replay").toString
    val (corpus, idx) = (s"$work/corpus", s"$work/idx")
    val v1 = ManifestTable.merge(docsDf(1L -> "abcd"), corpus, Seq("doc_id"))
    val d = delta(corpus, v1)
    BigramIndex.apply(d, 1L, idx)
    val (vIdx, rows) = (ManifestTable.currentVersion(idx),
      BigramIndex.live(spark, idx).collect().map(_.toString).sorted)
    BigramIndex.apply(d, 1L, idx)
    assert(ManifestTable.currentVersion(idx) == vIdx, "replay committed")
    assert(BigramIndex.live(spark, idx).collect().map(_.toString).sorted
      .sameElements(rows), "replay changed rows")
  }

  test("ground truth: bootstrap ≡ computeIndexOf ≡ the enumerable " +
    "bigram sets, on a corpus small enough to check by eye") {
    val work = Files.createTempDirectory("graft-syn-boot").toString
    val docs = docsDf(1L -> "abcd", 2L -> "a", 3L -> "")
    BigramIndex.boot(docs, s"$work/idx")
    // doc 2 ("a") and doc 3 ("") contribute ZERO facts — the empty-fact
    // edge — and doc 1 contributes exactly its three bigrams
    val got = BigramIndex.live(spark, s"$work/idx").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("ab", 1L), ("bc", 1L), ("cd", 1L)), got.toString)
    val computed = BigramIndex.compute(docs)
      .select(col("bg"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(computed == got)
  }
}
