package graft.sources

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Oracle coverage for the MAINTAINED dedup indexes (VERDICT r10 #5):
  * q135/q136 answer q125/q126's questions — "is this arriving doc's
  * fingerprint already committed?" / "does it share a MinHash band
  * bucket with a committed doc?" — but through the STORED,
  * CDC-maintained [[DedupIndex]] tables instead of a single-shot
  * in-query split. The DuckDB oracle recomputes both answers from the
  * raw `documents` parquet (the q125/q126 SQL verbatim), so the whole
  * maintained path — two corpus commits, per-commit CDC deltas, merged
  * bucketed index tables, semi-first probe joins — is hash-gated
  * against an engine that never saw the index.
  *
  * Fixture lifecycle ([[IngestFixtures.ensure]]'s shape): the corpus
  * ManifestTable (docs with `doc_id % 10 != 9`, committed in TWO
  * merges so maintenance really runs incrementally) and both indexes
  * build ONCE per (sfDir, fixture-signature) under java.io.tmpdir;
  * queries then only PROBE — which is also the honest thing to time,
  * since a production probe never pays the index build. The signature
  * folds in the shingle/banding definitions, so a code change that
  * alters hashing invalidates stale on-disk fixtures instead of
  * silently probing an index built by older code. */
object DedupIndexFixtures {

  /** Bump when the fixture LAYOUT changes (not hashing — that is in the
    * signature below). v2: Spark-native bucket ids + declared bucket
    * layout (planner-visible bucketing). v3: maintained cluster tables
    * (q137) roll forward with the same CDC batches. v4: n_tokens rides
    * the membership rows (q138 keeper decisions). v5: corrupted twin of
    * the fp index (q142 audit gate). v6: maintained document-frequency
    * index (q146's IDF source). v7: maintained span index (q171's
    * duplicated-span report, q172's contamination probe). v8:
    * maintained modality-fingerprint index (q178's dedup report, q179's
    * arriving-batch probe). v9: maintained audio window-fingerprint
    * index (q183's trimmed-dup report, q184's trim probe). v10:
    * maintained video scene-keyframe index (q187's scene-dup report,
    * q188's footage probe). v11: maintained ROBUST faces — re-encode
    * scene bands (q191 report, q193 probe) and gain-robust audio
    * windows (q192 report, q194 probe). v12: maintained CROSS-MODAL
    * image index (q197's classified-pair report, q198's arriving-batch
    * probe — the caption arm reads the v1 band index). v13: same
    * CONTENT, rebuilt for the one-file-per-touched-bucket merge layout
    * (r20, guide §6) so reads stop paying 8x per-file open cost. */
  private val FixtureVersion = 13

  /** All maintained-index roots of one fixture. */
  case class Roots(fp: String, band: String, memb: String, rep: String,
      fpCorrupt: String, df: String, span: String, media: String,
      awin: String, scene: String, reenc: String, gwin: String,
      xmod: String)

  /** Idempotently build corpus + fp/band indexes + cluster tables for
    * `sfDir` ([[FixtureLifecycle.ensureOnce]] — one build per content
    * signature, half-built leftovers wiped). All four tables roll
    * forward through the SAME per-version CDC batches — maintenance,
    * not recompute, is what the fixture exercises. */
  def ensure(s: SparkSession, sfDir: String): Roots = {
    val sig = FixtureLifecycle.signature(Seq(sfDir, FixtureVersion.toString,
      DedupIndex.IndexBuckets.toString, TextOps.shinglesExpr,
      TextOps.bandStackExpr,
      // the df index bakes in the tokenizer and its own bucket count
      DfIndex.IndexBuckets.toString, TextOps.tokensSqlExpr("text"),
      // the span index bakes in the window-hash definition at width 8
      SpanIndex.IndexBuckets.toString, TextOps.spanHashesExprW(SpanIndex.Width),
      // the modality index bakes in the JVM-side fingerprint definitions
      // (no SQL expr to fold in — bump this literal when ahash64,
      // audioFp64, the media generators, or the banding change)
      s"modality-v1 ahash64+audioFp64 banded4x16 b=${ModalityIndex.IndexBuckets}",
      // the audio window index bakes in the JVM-side window grid (64/32)
      s"audiowin-v1 md5win64h32 b=${AudioWindowIndex.IndexBuckets}",
      // the scene index bakes in the keyframe rule + dim-qualified hash
      s"scene-v1 keyframeRule md5dims b=${SceneIndex.IndexBuckets}",
      // the robust faces bake in the re-encode banding and the
      // sign-of-delta window grid
      s"reenc-v1 keyframeAhash banded4x16 b=${ReencodeIndex.IndexBuckets}",
      s"gwin-v1 signbits63win64h32 b=${GainWindowIndex.IndexBuckets}",
      // the cross-modal index bakes in the h0-seeded image generator
      s"xmod-v1 h0seed ahash banded4x16 b=${CrossModalIndex.IndexBuckets}"))
    val root = FixtureLifecycle.ensureOnce("graft_dedupidx", sig) { root =>
      ManifestTable.currentVersion(s"$root/corpus") == 2 &&
        Seq("fp", "band", "memb", "rep", "fpcorrupt", "df", "span", "media",
            "awin", "scene", "reenc", "gwin", "xmod")
          .forall(t => ManifestTable.currentVersion(s"$root/$t") >= 1)
    } { root =>
      val corpus = s"$root/corpus"
      val all = Tables(s, sfDir, "documents").select(col("doc_id"), col("text"))
      val corpusDocs = all.where(col("doc_id") % 10 =!= 9)
      val v1 = ManifestTable.merge(
        corpusDocs.where(col("doc_id") % 2 === 0), corpus, Seq("doc_id"))
      val v2 = ManifestTable.merge(
        corpusDocs.where(col("doc_id") % 2 === 1), corpus, Seq("doc_id"))
      (0 until v2).foreach { v =>
        val ch = ManifestTable.readChanges(
          s, corpus, v, v + 1, Seq("doc_id"), preimages = true).localCheckpoint()
        DedupIndex.maintainFpIndex(s, ch, s"$root/fp")
        DfIndex.maintainDfIndex(s, ch, s"$root/df")
        SpanIndex.maintainSpanIndex(s, ch, s"$root/span")
        ModalityIndex.maintainModalityIndex(s, ch, s"$root/media")
        AudioWindowIndex.maintainAudioWindowIndex(s, ch, s"$root/awin")
        SceneIndex.maintainSceneIndex(s, ch, s"$root/scene")
        ReencodeIndex.maintainReencodeIndex(s, ch, s"$root/reenc")
        GainWindowIndex.maintainGainWindowIndex(s, ch, s"$root/gwin")
        CrossModalIndex.maintainCrossModalIndex(s, ch, s"$root/xmod")
        // band index + cluster tables advance together (applyBatch
        // maintains the band index first, then the components)
        ClusterIndex.applyBatch(ch, v.toLong, s"$root/band", s"$root/memb",
          s"$root/rep")
      }
      assert(v1 == 1 && v2 == 2)

      // q142's CORRUPTED twin of the fp index: take the maintained index
      // and deterministically inject the three fault classes an
      // integrity audit exists to catch — an over-counted ref (fps of
      // corpus docs with doc_id % 100 == 1: stored = n + 1), a missing
      // entry (fps of docs with doc_id % 100 == 2, minus the first set:
      // tombstoned), and a phantom (fps of the batch split, which the
      // index must not contain: stored = 1). The three fp sets are
      // pairwise disjoint by construction, so one merge writes them all.
      val correct = DedupIndex.readFpIndex(s, s"$root/fp")
        .select(col("fp"), col("n_docs")).localCheckpoint()
      val f = graft.functions.TextOps.fingerprintsOf(all)
      val corpusF = f.where(col("doc_id") % 10 =!= 9)
      val p1 = corpusF.where(col("doc_id") % 100 === 1).select(col("fp")).distinct()
      val p2 = corpusF.where(col("doc_id") % 100 === 2).select(col("fp")).distinct()
        .join(p1, Seq("fp"), "left_anti")
      val p3 = f.where(col("doc_id") % 10 === 9).select(col("fp")).distinct()
        .join(correct.select(col("fp")), Seq("fp"), "left_anti")
      val corrupted = correct.join(p1.union(p2), Seq("fp"), "left_anti")
        .union(correct.join(p1, Seq("fp"), "left_semi")
          .select(col("fp"), (col("n_docs") + 1L).as("n_docs")))
        .union(correct.join(p2, Seq("fp"), "left_semi")
          .select(col("fp"), lit(0L).as("n_docs")))
        .union(p3.select(col("fp"), lit(1L).as("n_docs")))
        .withColumn("bucket",
          ManifestTable.bucketIdColumn(col("fp"), DedupIndex.IndexBuckets))
        .select(col("bucket"), col("fp"), col("n_docs"))
      ManifestTable.declareBuckets(s"$root/fpcorrupt", "fp", DedupIndex.IndexBuckets)
      ManifestTable.mergePartitioned(
        corrupted, s"$root/fpcorrupt", Seq("bucket", "fp"), "bucket")
    }
    Roots(s"$root/fp", s"$root/band", s"$root/memb", s"$root/rep",
      s"$root/fpcorrupt", s"$root/df", s"$root/span", s"$root/media",
      s"$root/awin", s"$root/scene", s"$root/reenc", s"$root/gwin",
      s"$root/xmod")
  }

  private def batch(s: SparkSession, sfDir: String): DataFrame =
    Tables(s, sfDir, "documents").select(col("doc_id"), col("text"))
      .where(col("doc_id") % 10 === 9)

  /** q135 — q125's probe through the MAINTAINED exact-fp index. */
  def q135MaintainedExactProbe(s: SparkSession, d: String): DataFrame =
    DedupIndex.probeExact(batch(s, d), s, ensure(s, d).fp)

  /** q136 — q126's probe through the MAINTAINED band-bucket index. */
  def q136MaintainedNeardupProbe(s: SparkSession, d: String): DataFrame =
    DedupIndex.probeNearDup(batch(s, d), s, ensure(s, d).band)

  /** q137 — q54's components through the MAINTAINED cluster tables
    * ([[ClusterIndex]]): the labels were built incrementally (two
    * corpus commits rolled through affected-cluster maintenance), the
    * oracle recomputes the transitive closure from the raw parquet. */
  def q137MaintainedComponents(s: SparkSession, d: String): DataFrame =
    ClusterIndex.readComponents(s, ensure(s, d).memb)

  /** q138 — q69's keeper DECISION through the maintained cluster
    * tables: per-component longest doc, decided from token counts that
    * ride the membership rows (the corpus is not read). */
  def q138MaintainedKeepers(s: SparkSession, d: String): DataFrame =
    ClusterIndex.readKeepers(s, ensure(s, d).memb)

  /** q142 — the INTEGRITY AUDIT, oracle-gated: recompute the exact
    * index from the raw corpus parquet and full-outer-join it against
    * the stored (deliberately corrupted) index through the registered
    * format, returning every disagreeing fingerprint. The planner sees
    * the stored side's `BucketSpec`, so only the recomputed side
    * shuffles — on a 100 TB deployment the audit costs one corpus scan,
    * not corpus scan + full index shuffle (PlanSpec pins the shape).
    * The oracle recomputes the expected disagreement set — the three
    * injected fault classes — from the raw parquet alone. */
  def q142FpIndexAudit(s: SparkSession, d: String): DataFrame = {
    val corpusDocs = Tables(s, d, "documents")
      .select(col("doc_id"), col("text")).where(col("doc_id") % 10 =!= 9)
    DedupIndex.auditFpIndex(corpusDocs, s, ensure(s, d).fpCorrupt)
  }

  /** q146 — TF-IDF scoring of the ARRIVING batch with IDF from the
    * MAINTAINED document-frequency index ([[DfIndex]]): the production
    * inference shape q72 lacks — score new docs against corpus-wide IDF
    * without re-aggregating the corpus. Batch-sized tf work, a
    * bucket-pruned vocab read, a broadcast 1-row corpus size; the
    * oracle recomputes both sides from raw parquet. */
  def q146MaintainedTfidf(s: SparkSession, d: String): DataFrame =
    DfIndex.probeTfIdf(batch(s, d), s, ensure(s, d).df)

  /** q171 — q148's duplicated-span report from the MAINTAINED span
    * index ([[SpanIndex]]): the positions were built incrementally
    * (two corpus commits rolled through CDC maintenance), the report
    * reads stored rows only, and the oracle re-derives every span from
    * the raw parquet — maintained ≡ recomputed is the claim under
    * gate. */
  def q171MaintainedSpans(s: SparkSession, d: String): DataFrame =
    SpanIndex.maintainedDupSpans(s, ensure(s, d).span)

  /** q172 — the contamination PROBE through the maintained span index:
    * the held-out batch (an arriving eval set) is windowed, the index
    * contributes only the batch hashes' bucket partitions, and every
    * corpus span the batch leaks comes back island-merged — q150's
    * scrub question without re-reading the corpus. */
  def q172MaintainedSpanProbe(s: SparkSession, d: String): DataFrame =
    SpanIndex.probeContamination(batch(s, d), s, ensure(s, d).span)

  /** The arriving batch as the MEDIA generators key it. */
  private def mediaBatch(s: SparkSession, sfDir: String): DataFrame =
    Tables(s, sfDir, "documents").select(col("doc_id"), col("n_chars"))
      .where(col("doc_id") % 10 === 9)

  /** q178 — q131 ∪ q169 (visual + audio near-dup pairs) from the
    * MAINTAINED modality-fingerprint index ([[ModalityIndex]]): the
    * band rows were built incrementally across the two corpus commits,
    * the report joins STORED rows only — no payload is decoded — and
    * the oracle re-derives every pair from the raw parquet through the
    * q131/q169 band SQL. Maintained ≡ recomputed is the claim under
    * gate, on the one recompute (full-corpus media decode) that
    * dominates pipeline cost at 100 TB. */
  def q178MaintainedModalityDups(s: SparkSession, d: String): DataFrame =
    ModalityIndex.maintainedModalityDups(s, ensure(s, d).media)

  /** q179 — the modality probe: which COMMITTED media does an ARRIVING
    * doc batch near-duplicate. Batch-sized decode work, a bucket-pruned
    * index read, stored-fingerprint rescoring — the corpus media are
    * never re-decoded. */
  def q179ModalityProbe(s: SparkSession, d: String): DataFrame =
    ModalityIndex.probeModality(mediaBatch(s, d), s, ensure(s, d).media)

  /** q183 — q176's trimmed-dup report from the MAINTAINED audio window
    * index ([[AudioWindowIndex]]): pairs, trim offsets and offset
    * cardinality from stored fingerprint rows only — the corpus audio
    * is never re-decoded; the oracle re-derives every window from raw
    * parquet. */
  def q183MaintainedTrimmedDups(s: SparkSession, d: String): DataFrame =
    AudioWindowIndex.maintainedTrimmedDups(s, ensure(s, d).awin)

  /** q184 — the trim PROBE: which committed recordings does the
    * arriving batch duplicate up to a trim — batch-sized decode, a
    * bucket-pruned window read, the q176 gate. */
  def q184TrimProbe(s: SparkSession, d: String): DataFrame =
    AudioWindowIndex.probeTrims(mediaBatch(s, d), s, ensure(s, d).awin)

  /** q187 — q180's video near-dup pairs from the MAINTAINED scene
    * index ([[SceneIndex]]): shared-scene counts from stored keyframe
    * fingerprints only — no video is decoded; the oracle re-derives
    * every scene from raw parquet through the q180 SQL. */
  def q187MaintainedSceneDups(s: SparkSession, d: String): DataFrame =
    SceneIndex.maintainedSceneDups(s, ensure(s, d).scene)

  /** q188 — the footage PROBE: which committed videos share a scene
    * with the arriving batch — batch-sized decode, a bucket-pruned
    * keyframe read, corpus-side hot-fp cap. */
  def q188SceneProbe(s: SparkSession, d: String): DataFrame =
    SceneIndex.probeScenes(mediaBatch(s, d), s, ensure(s, d).scene)

  /** q191 — q189's re-encode pairs from the MAINTAINED banded
    * keyframe-aHash index ([[ReencodeIndex]]): banded-Hamming scene
    * matching with the exact-hash blindness witness, from stored rows
    * only — no video decoded; the oracle re-derives every band from
    * raw parquet through the q189 SQL. */
  def q191MaintainedReencodedDups(s: SparkSession, d: String): DataFrame =
    ReencodeIndex.maintainedReencodedDups(s, ensure(s, d).reenc)

  /** q192 — q190's gain-robust pairs from the MAINTAINED sign-of-delta
    * window index ([[GainWindowIndex]]): offsets, cardinality and the
    * exact-md5 witness from stored rows only — no audio decoded. */
  def q192MaintainedGainDups(s: SparkSession, d: String): DataFrame =
    GainWindowIndex.maintainedGainDups(s, ensure(s, d).gwin)

  /** q193 — the re-encode PROBE: which committed videos is the
    * arriving batch re-encoded footage of — batch-sized decode, a
    * bucket-pruned band read, stored-fingerprint Hamming rescore. */
  def q193ReencodeProbe(s: SparkSession, d: String): DataFrame =
    ReencodeIndex.probeReencodes(mediaBatch(s, d), s, ensure(s, d).reenc)

  /** q194 — the gain PROBE: which committed recordings does the
    * arriving batch duplicate up to gain — batch-sized decode, a
    * bucket-pruned window read, the q190 gate + witness. */
  def q194GainProbe(s: SparkSession, d: String): DataFrame =
    GainWindowIndex.probeGains(mediaBatch(s, d), s, ensure(s, d).gwin)

  /** q197 — q195's cross-modal classification from the TWO maintained
    * tables ([[CrossModalIndex]] image bands + the text family's band
    * index): nothing re-shingled, no image re-derived; the oracle
    * recomputes both arms from raw parquet over the corpus split. */
  def q197MaintainedCrossModal(s: SparkSession, d: String): DataFrame = {
    val r = ensure(s, d)
    CrossModalIndex.maintainedCrossModalPairs(s, r.xmod, r.band)
  }

  /** q198 — the cross-modal PROBE: classify the arriving batch against
    * the committed corpus (batch-sized shingle + image work, a
    * bucket-pruned image-band read, the stored caption bands). */
  def q198CrossModalProbe(s: SparkSession, d: String): DataFrame = {
    val r = ensure(s, d)
    CrossModalIndex.probeCrossModal(batch(s, d), s, r.xmod, r.band)
  }

  /** q200 — q199's split-leakage audit from the MAINTAINED band index
    * (VERDICT r17 #5): the candidate spine is the stored band rows'
    * self-join on (band, bucket) — [[DedupIndex.readBandIndex]], the
    * table the ingest lifecycle already keeps equal to the corpus — and
    * both splits are stamped onto the pair rows as per-row hash math
    * ([[TextOps.splitOf]], q55's function). The corpus is never
    * re-shingled and never joined: leakage auditing becomes an
    * index-read-sized report a scheduler can run after every commit,
    * not a corpus-sized recompute (PlanSpec pins the no-reshingle
    * shape). The oracle recomputes q199 from raw parquet over the
    * fixture's corpus split — maintained ≡ recomputed is the claim
    * under gate. */
  def q200MaintainedSplitLeakage(s: SparkSession, d: String): DataFrame =
    DedupIndex.maintainedSplitLeakage(s, ensure(s, d).band)

  /** q202 — q201's robust key-space recall report from the MAINTAINED
    * [[ReencodeIndex]]/[[GainWindowIndex]] tables (VERDICT r18 #5):
    * q201 re-derives both key spaces from the corpus through the fact
    * generators — the right anti-drift instrument, but a corpus-sized
    * recompute; the maintained tables already HOLD those facts, so the
    * same report read from stored rows is schedulable after every
    * commit, exactly as q200 is for leakage. The stat aggregate is
    * [[graft.multimodal.Multimodal.keySpaceStat]] — the same definition
    * site q201 uses — and the oracle recomputes both spaces from raw
    * parquet over the corpus split, so maintained ≡ recomputed is the
    * claim under gate; PlanSpec pins that the plan never scans the
    * corpus. */
  def q202MaintainedKeySpaces(s: SparkSession, d: String): DataFrame = {
    val r = ensure(s, d)
    maintainedKeySpaces(s, r.reenc, r.gwin)
  }

  /** The q202 composition against explicit index roots (PlanSpec pins
    * this shape on a micro index: only the two stored tables are
    * scanned, the corpus never). */
  private[graft] def maintainedKeySpaces(s: SparkSession, reenc: String,
      gwin: String): DataFrame =
    graft.multimodal.Multimodal.keySpaceStat(
        ReencodeIndex.readReencodeIndex(s, reenc), "bk",
        "reencode_bk", graft.multimodal.Multimodal.ModalityBandCap)
      .union(graft.multimodal.Multimodal.keySpaceStat(
        GainWindowIndex.readGainWindowIndex(s, gwin), "sfp",
        "gain_sfp", graft.multimodal.Multimodal.ExactFpCap))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_maintained_exact_probe" -> (q135MaintainedExactProbe _),
    "q136_maintained_neardup_probe" -> (q136MaintainedNeardupProbe _),
    "q137_maintained_components" -> (q137MaintainedComponents _),
    "q138_maintained_keepers" -> (q138MaintainedKeepers _),
    "q142_fp_index_audit" -> (q142FpIndexAudit _),
    "q146_maintained_tfidf" -> (q146MaintainedTfidf _),
    "q171_maintained_spans" -> (q171MaintainedSpans _),
    "q172_maintained_span_probe" -> (q172MaintainedSpanProbe _),
    "q178_maintained_modality_dups" -> (q178MaintainedModalityDups _),
    "q179_modality_probe" -> (q179ModalityProbe _),
    "q183_maintained_trimmed_dups" -> (q183MaintainedTrimmedDups _),
    "q184_trim_probe" -> (q184TrimProbe _),
    "q187_maintained_scene_dups" -> (q187MaintainedSceneDups _),
    "q188_scene_probe" -> (q188SceneProbe _),
    "q191_maintained_reencoded_dups" -> (q191MaintainedReencodedDups _),
    "q192_maintained_gain_dups" -> (q192MaintainedGainDups _),
    "q193_reencode_probe" -> (q193ReencodeProbe _),
    "q194_gain_probe" -> (q194GainProbe _),
    "q197_maintained_crossmodal" -> (q197MaintainedCrossModal _),
    "q198_crossmodal_probe" -> (q198CrossModalProbe _),
    "q200_maintained_split_leakage" -> (q200MaintainedSplitLeakage _),
    "q202_maintained_key_spaces" -> (q202MaintainedKeySpaces _))

  /** q54's oracle text with its `documents` base restricted to the
    * fixture's corpus split — the recursive closure runs on exactly the
    * docs the maintained tables index. */
  private def restrictToCorpus(sql: String): String =
    sql.replace("FROM documents",
      "FROM (SELECT * FROM documents WHERE doc_id % 10 <> 9) documents")

  /** The oracle never sees the index: it recomputes q125/q126/q54 from
    * the parquet — maintained ≡ recomputed is exactly the claim under
    * gate. */
  /** q142's oracle: the audit's answer derived from raw parquet alone —
    * expected counts per fp over the corpus split, then the three
    * injected fault classes reproduced by the same deterministic rules
    * the fixture used (over-count, tombstoned, phantom). */
  val q142Sql: String =
    """WITH f AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |exp AS (SELECT fp, CAST(count(*) AS BIGINT) AS n
      |        FROM f WHERE doc_id % 10 <> 9 GROUP BY fp),
      |p1 AS (SELECT DISTINCT fp FROM f
      |       WHERE doc_id % 10 <> 9 AND doc_id % 100 = 1),
      |p2 AS (SELECT DISTINCT fp FROM f
      |       WHERE doc_id % 10 <> 9 AND doc_id % 100 = 2
      |         AND fp NOT IN (SELECT fp FROM p1)),
      |p3 AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 = 9
      |         AND fp NOT IN (SELECT fp FROM exp))
      |SELECT exp.fp, exp.n AS expected_docs, exp.n + 1 AS stored_docs
      |FROM exp JOIN p1 USING (fp)
      |UNION ALL
      |SELECT exp.fp, exp.n AS expected_docs, CAST(NULL AS BIGINT) AS stored_docs
      |FROM exp JOIN p2 USING (fp)
      |UNION ALL
      |SELECT fp, CAST(NULL AS BIGINT) AS expected_docs,
      |       CAST(1 AS BIGINT) AS stored_docs
      |FROM p3""".stripMargin

  /** q146's oracle: tf over the batch split, df/n over the corpus
    * split, both from raw parquet — q72's formula with the split the
    * maintained index serves. Unseen tokens drop (inner join), q72's
    * contract. */
  val q146Sql: String =
    raw"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |             FROM documents),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok WHERE doc_id % 10 = 9 GROUP BY 1, 2),
      |cdf AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
      |        FROM tok WHERE doc_id % 10 <> 9 GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % 10 <> 9),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf,
      |         round(tf.tf * ln(n.n_docs / cdf.df_docs), 6) AS tfidf
      |  FROM tf JOIN cdf USING (token) CROSS JOIN n)
      |SELECT doc_id, token, tf, tfidf,
      |       CAST(rnk AS BIGINT) AS rnk
      |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |                 ORDER BY tfidf DESC, token) AS rnk
      |      FROM scored)
      |WHERE rnk <= 3""".stripMargin

  /** q172's oracle: q150's window/island SQL with the splits the
    * maintained index serves — eval = the held-out batch
    * (doc_id % 10 = 9), corpus = everything else — from raw parquet. */
  val q172Sql: String =
    raw"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |           FROM documents),
      |hl AS (SELECT doc_id, list_transform(generate_series(1, len(toks) - 7),
      |         i -> md5(array_to_string(list_slice(toks, i, i + 7), ' '))) AS hs
      |       FROM t WHERE len(toks) >= 8),
      |p AS (SELECT doc_id, g.i AS p, hs[g.i] AS h
      |      FROM hl, LATERAL (SELECT unnest(generate_series(1, len(hs))) AS i) g),
      |ev AS (SELECT DISTINCT h FROM p WHERE doc_id % 10 = 9),
      |dp AS (SELECT p.doc_id, p.p FROM p JOIN ev USING (h)
      |       WHERE p.doc_id % 10 <> 9),
      |b AS (SELECT doc_id, p,
      |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 8
      |             THEN 1 ELSE 0 END AS brk
      |      FROM dp),
      |g AS (SELECT doc_id, p,
      |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM b)
      |SELECT doc_id,
      |       CAST(min(p) AS BIGINT) AS span_start,
      |       CAST(max(p) + 7 AS BIGINT) AS span_end,
      |       CAST(max(p) + 8 - min(p) AS BIGINT) AS span_tokens
      |FROM g GROUP BY doc_id, gid""".stripMargin

  /** The q131/q169 band explode over a `hash` CTE — shared by the
    * q179 oracle's two modality arms. */
  private val bandCte: String =
    """band AS (SELECT doc_id, hi, lo, g.b,
      |    CASE g.b WHEN 0 THEN lo & 65535
      |             WHEN 1 THEN (lo >> 16) & 65535
      |             WHEN 2 THEN hi & 65535
      |             ELSE (hi >> 16) & 65535 END AS v
      |  FROM hash, (VALUES (0), (1), (2), (3)) g(b))""".stripMargin

  /** q178's oracle: q131 ∪ q169 recomputed from raw parquet over the
    * corpus split, each arm tagged with its modality — the engine
    * never sees the index, maintained ≡ recomputed is the gate. */
  val q178Sql: String =
    s"""SELECT 'image' AS kind, media_id_a, media_id_b, hamming FROM (
       |${restrictToCorpus(graft.multimodal.Multimodal.q131Sql)}
       |) i
       |UNION ALL
       |SELECT 'audio' AS kind, media_id_a, media_id_b, hamming FROM (
       |${restrictToCorpus(graft.multimodal.Multimodal.q169Sql)}
       |) a""".stripMargin

  /** q179's oracle: cross-split band pairs — probe = the held-out
    * batch, corpus = everything else — recomputed from raw parquet
    * through the same fingerprint SQL. The corpus arm drops bands whose
    * CORPUS membership exceeds [[Multimodal.ModalityBandCap]],
    * mirroring [[ModalityIndex.probeModality]]'s committed-side cap. */
  private def probeArm(cte: String, kind: String): String =
    s"""SELECT * FROM (
       |$cte,
       |$bandCte,
       |cband AS (SELECT doc_id, hi, lo, b, v FROM (
       |    SELECT cb.*, count(*) OVER (PARTITION BY b, v) AS bdf
       |    FROM (SELECT * FROM band WHERE doc_id % 10 <> 9) cb) bd
       |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap})
       |SELECT DISTINCT '$kind' AS kind, a.doc_id AS media_id_probe,
       |  b.doc_id AS media_id_corpus,
       |  bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
       |FROM band a JOIN cband b ON a.b = b.b AND a.v = b.v
       |WHERE a.doc_id % 10 = 9
       |  AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
       |) ${kind.take(3)}""".stripMargin

  val q179Sql: String =
    s"""${probeArm(graft.multimodal.Multimodal.ahashCte, "image")}
       |UNION ALL
       |${probeArm(graft.multimodal.Multimodal.audioFpCte, "audio")}""".stripMargin

  /** q183's oracle: q176's window self-join recomputed from raw
    * parquet over the corpus split (no global-fingerprint columns —
    * the index stores window rows only). */
  val q183Sql: String =
    s"""${restrictToCorpus(graft.multimodal.Multimodal.audioTrimCte)},
       |kwin AS (SELECT doc_id, w, fp FROM (
       |    SELECT win.*, count(*) OVER (PARTITION BY fp) AS fdf FROM win) wd
       |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
       |SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
       |  CAST(count(*) AS BIGINT) AS n_shared,
       |  CAST(min(b.w - a.w) AS BIGINT) AS offset_w,
       |  CAST(count(DISTINCT b.w - a.w) AS BIGINT) AS n_offsets
       |FROM kwin a JOIN kwin b ON b.fp = a.fp AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING count(*) >= 4""".stripMargin

  /** q184's oracle: the cross-split window join — probe = held-out
    * batch, corpus = everything else — from raw parquet. */
  val q184Sql: String =
    s"""${graft.multimodal.Multimodal.audioTrimCte},
       |cwin AS (SELECT doc_id, w, fp FROM (
       |    SELECT cw.*, count(*) OVER (PARTITION BY fp) AS fdf
       |    FROM (SELECT * FROM win WHERE doc_id % 10 <> 9) cw) wd
       |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
       |SELECT p.doc_id AS media_id_probe, c.doc_id AS media_id_corpus,
       |  CAST(count(*) AS BIGINT) AS n_shared,
       |  CAST(min(c.w - p.w) AS BIGINT) AS offset_w
       |FROM win p JOIN cwin c ON c.fp = p.fp
       |WHERE p.doc_id % 10 = 9
       |GROUP BY p.doc_id, c.doc_id
       |HAVING count(*) >= 4""".stripMargin

  /** q188's oracle: the cross-split scene join — probe = held-out
    * batch, corpus = everything else — from raw parquet, with the
    * corpus-side hot-fp cap mirrored. */
  val q188Sql: String =
    s"""${graft.multimodal.Multimodal.sceneFpCte},
       |cfp AS (SELECT doc_id, f FROM (
       |    SELECT cf.*, count(*) OVER (PARTITION BY f) AS fdf
       |    FROM (SELECT * FROM fp WHERE doc_id % 10 <> 9) cf) fd
       |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
       |SELECT p.doc_id AS media_id_probe, c.doc_id AS media_id_corpus,
       |  CAST(count(DISTINCT p.f) AS BIGINT) AS n_shared_scenes
       |FROM fp p JOIN cfp c ON c.f = p.f
       |WHERE p.doc_id % 10 = 9
       |GROUP BY p.doc_id, c.doc_id""".stripMargin

  /** q193's oracle: the cross-split banded-Hamming join — probe =
    * held-out batch, corpus = everything else — from raw parquet, with
    * the corpus-side hot-band cap mirrored. */
  val q193Sql: String =
    s"""${graft.multimodal.Multimodal.reencodeBandCte},
       |cband AS (SELECT doc_id, fp, hi, lo, b, v FROM (
       |    SELECT cb.*, count(*) OVER (PARTITION BY b, v) AS bdf
       |    FROM (SELECT * FROM band0 WHERE doc_id % 10 <> 9) cb) bd
       |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap}),
       |p AS (SELECT DISTINCT pr.doc_id AS dp, c.doc_id AS dc,
       |        pr.fp AS fpp, c.fp AS fpc,
       |        bit_count(xor(pr.hi, c.hi)) + bit_count(xor(pr.lo, c.lo)) AS hamming
       |      FROM band0 pr JOIN cband c ON pr.b = c.b AND pr.v = c.v
       |      WHERE pr.doc_id % 10 = 9
       |        AND bit_count(xor(pr.hi, c.hi)) + bit_count(xor(pr.lo, c.lo)) <= 3)
       |SELECT dp AS media_id_probe, dc AS media_id_corpus,
       |  CAST(count(DISTINCT fpp) AS BIGINT) AS n_similar_scenes,
       |  CAST(max(hamming) AS BIGINT) AS max_hamming
       |FROM p GROUP BY dp, dc""".stripMargin

  /** q194's oracle: the cross-split sign-fingerprint window join with
    * the exact-md5 witness, corpus-side hot-fp cap mirrored. */
  val q194Sql: String =
    s"""${graft.multimodal.Multimodal.gainWinCte},
       |cwin AS (SELECT doc_id, w, sfp, efp FROM (
       |    SELECT cw.*, count(*) OVER (PARTITION BY sfp) AS fdf
       |    FROM (SELECT * FROM win WHERE doc_id % 10 <> 9) cw) wd
       |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
       |SELECT p.doc_id AS media_id_probe, c.doc_id AS media_id_corpus,
       |  CAST(count(*) AS BIGINT) AS n_shared,
       |  CAST(sum(CASE WHEN p.efp = c.efp THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exact_shared,
       |  CAST(min(c.w - p.w) AS BIGINT) AS offset_w
       |FROM win p JOIN cwin c ON c.sfp = p.sfp
       |WHERE p.doc_id % 10 = 9
       |GROUP BY p.doc_id, c.doc_id
       |HAVING count(*) >= ${GainWindowIndex.MinSharedWindows}""".stripMargin

  /** q198's oracle: the cross-split cross-modal classification — both
    * arms recomputed from raw parquet (the shared q195 prefix supplies
    * the signature chain, caption bands and image band0 rows; its
    * whole-corpus `cand`/`ip`/`band` CTEs go unreferenced), with the
    * image-side hot-band cap mirrored on the CORPUS split only, the
    * probe side uncapped — exactly the stored-index read's shape. */
  val q198Sql: String =
    s"""${graft.multimodal.Multimodal.crossmodalPairCtes},
       |cband AS (SELECT doc_id, hi, lo, b, v FROM (
       |    SELECT cb.*, count(*) OVER (PARTITION BY b, v) AS bdf
       |    FROM (SELECT * FROM band0 WHERE doc_id % 10 <> 9) cb) bd
       |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap}),
       |pimg AS (SELECT DISTINCT pr.doc_id AS doc_probe, c.doc_id AS doc_corpus
       |         FROM band0 pr JOIN cband c ON pr.b = c.b AND pr.v = c.v
       |         WHERE pr.doc_id % 10 = 9
       |           AND bit_count(xor(pr.hi, c.hi)) + bit_count(xor(pr.lo, c.lo)) <= 3),
       |pcap AS (SELECT DISTINCT a.doc_id AS doc_probe, b.doc_id AS doc_corpus
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |         WHERE a.doc_id % 10 = 9 AND b.doc_id % 10 <> 9
       |           AND ${graft.multimodal.Multimodal.hasImageSql("a.doc_id")}
       |           AND ${graft.multimodal.Multimodal.hasImageSql("b.doc_id")})
       |SELECT COALESCE(i.doc_probe, c.doc_probe) AS doc_probe,
       |       COALESCE(i.doc_corpus, c.doc_corpus) AS doc_corpus,
       |       i.doc_probe IS NOT NULL AS image_dup,
       |       c.doc_probe IS NOT NULL AS caption_dup,
       |       CASE WHEN i.doc_probe IS NOT NULL AND c.doc_probe IS NOT NULL
       |              THEN 'dup_pair'
       |            WHEN i.doc_probe IS NOT NULL THEN 'recaptioned'
       |            ELSE 'reillustrated' END AS relation
       |FROM pimg i FULL OUTER JOIN pcap c
       |  ON c.doc_probe = i.doc_probe AND c.doc_corpus = i.doc_corpus""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q135_maintained_exact_probe" -> TextOps.q125Sql,
    "q136_maintained_neardup_probe" -> TextOps.q126Sql,
    "q137_maintained_components" -> restrictToCorpus(TextOps.q54Sql),
    "q138_maintained_keepers" -> restrictToCorpus(TextOps.q69Sql),
    "q142_fp_index_audit" -> q142Sql,
    "q146_maintained_tfidf" -> q146Sql,
    "q171_maintained_spans" -> restrictToCorpus(TextOps.q148Sql),
    "q172_maintained_span_probe" -> q172Sql,
    "q178_maintained_modality_dups" -> q178Sql,
    "q179_modality_probe" -> q179Sql,
    "q183_maintained_trimmed_dups" -> q183Sql,
    "q184_trim_probe" -> q184Sql,
    "q187_maintained_scene_dups" ->
      restrictToCorpus(graft.multimodal.Multimodal.q180Sql),
    "q188_scene_probe" -> q188Sql,
    "q191_maintained_reencoded_dups" ->
      restrictToCorpus(graft.multimodal.Multimodal.q189Sql),
    "q192_maintained_gain_dups" ->
      restrictToCorpus(graft.multimodal.Multimodal.q190Sql),
    "q193_reencode_probe" -> q193Sql,
    "q194_gain_probe" -> q194Sql,
    "q197_maintained_crossmodal" ->
      restrictToCorpus(graft.multimodal.Multimodal.q195Sql),
    "q198_crossmodal_probe" -> q198Sql,
    "q200_maintained_split_leakage" -> restrictToCorpus(TextOps.q199Sql),
    "q202_maintained_key_spaces" ->
      restrictToCorpus(graft.multimodal.Multimodal.q201Sql))
}
