package graft

/** The engine's SQL face: every ENGINE-NEUTRAL oracle text — the same
  * ANSI SQL the DuckDB oracle runs — also runs through `spark.sql` over
  * registered views and agrees with the DataFrame-API plan row-for-row.
  *
  * The spec enumerates `SparkEntry.oracleSql` itself, so a new query is
  * SQL-surface-covered by default; texts using DuckDB-specific dialect
  * are excluded EXPLICITLY below, each with the blocking construct named
  * (those texts are exercised on the DuckDB side by the driver's
  * correctness gate instead). */
class SqlSurfaceSpec extends SparkSpec {

  /** Oracle texts that cannot run on Spark SQL, keyed by query name with
    * the DuckDB-only construct that blocks them. */
  private val duckdbOnly: Map[String, String] = {
    def m(reason: String)(names: String*): Seq[(String, String)] =
      names.map(_ -> reason)
    (m("unnest/string_split_regex/generate_series (DuckDB array dialect)")(
      "q12_calendar_densify", "q25_doc_stats", "q26_quality_score", "q27_lang_id",
      "q30_minhash_lsh", "q31_jaccard_pairs", "q32_simhash", "q36_label_centroid",
      "q46_ivf_ann", "q47_bpe_tokens", "q50_sliding_window",
      "q56_repetition", "q57_top_tokens_per_lang",
      "q58_kmeans", "q65_chunking", "q67_contamination", "q68_token_budget",
      "q70_boilerplate_lines", "q71_sequence_pack",
      "q72_tfidf", "q74_quality_sample", "q75_source_similarity", "q77_surprisal",
      "q78_collocations", "q84_curriculum", "q85_pack_efficiency",
      "q86_cross_source_dup", "q87_zipf_slope",
      "q89_corpus_mix", "q90_source_drift", "q91_novelty",
      "q95_minhash_calibration", "q96_temperature_mix", "q97_rolling_distinct",
      "q98_bloom_decontaminate", "q99_bigram_perplexity",
      "q105_weighted_sample", "q111_gopher_rules",
      "q112_split_leakage", "q114_quality_classifier",
      "q116_containment_pairs", "q117_adaptive_quality_gate",
      "q118_repeated_spans",
      "q148_exact_substr_spans", "q152_exact_substr_spans16",
      "q171_maintained_spans", "q172_maintained_span_probe",
      "q149_exact_substr_savings",
      "q150_eval_span_scrub", "q151_scrub_apply",
      "q123_audio_energy", "q124_bpe_pairs",
      "q126_incremental_neardup", "q136_maintained_neardup_probe",
      "q146_maintained_tfidf",
      "q127_png_pixels", "q128_hybrid_rrf",
      "q129_incremental_ivf", "q130_image_ahash", "q131_image_neardup",
      "q132_image_dedup_keep", "q133_audio_energy_gate", "q134_dsir_weights",
      "q163_jpeg_pixels", "q164_cross_container_dups",
      "q165_video_frame_pixels", "q166_color_pixels",
      "q167_color_cross_dups", "q168_audio_fingerprint",
      "q169_audio_neardup", "q170_audio_dedup_keep",
      "q174_jpeg420_pixels", "q175_audio_window_fp",
      "q176_audio_trimmed_dups", "q177_scene_keyframes",
      "q178_maintained_modality_dups", "q179_modality_probe",
      "q180_video_scene_dups", "q181_trimmed_dedup_keep",
      "q182_jpeg_mixed_pixels", "q183_maintained_trimmed_dups",
      "q184_trim_probe", "q185_video_dedup_keep",
      "q186_hot_band_report", "q187_maintained_scene_dups",
      "q188_scene_probe", "q189_reencoded_scene_dups",
      "q190_gain_robust_dups", "q191_maintained_reencoded_dups",
      "q192_maintained_gain_dups", "q193_reencode_probe",
      "q194_gain_probe", "q195_crossmodal_pairs",
      "q196_crossmodal_keep", "q197_maintained_crossmodal",
      "q198_crossmodal_probe", "q201_robust_key_spaces",
      "q202_maintained_key_spaces") ++
    m("WITH RECURSIVE … UNION (distinct) — Spark 4.1 recursion accepts only " +
      "UNION ALL, and UNION ALL label propagation enumerates paths " +
      "(exponential on cyclic near-dup graphs); the twins unroll K " +
      "min-label levels with a convergence witness that fails loudly " +
      "when K is too shallow (SparkSqlTwins.ComponentLevels)")(
      "q54_neardup_components", "q69_keeper_selection", "q88_dedup_funnel",
      "q119_dedup_savings",
      "q137_maintained_components", "q138_maintained_keepers",
      "q155_er_entities", "q162_maintained_entities") ++
    m("AS MATERIALIZED on the double-referenced iteration CTEs (Spark " +
      "inlines every reference — the oracle's shape would copy the band " +
      "self-join 2^5 times); the twin restructures to single-reference " +
      "CTEs via the dangling-mass scalar recurrence")(
      "q100_pagerank") ++
    m("DuckDB list-comprehension shingle prefix (the queries themselves " +
      "are non-recursive; the twins ride the Spark candidate spine)")(
      "q103_triangles", "q199_split_leakage",
      "q200_maintained_split_leakage") ++
    m("read_json() over the raw JSON fixture (DuckDB table function; the " +
      "Spark side is the Ingest module, not a SQL text)")(
      "q52_ingest_silver") ++
    m("list_* functions on array<double> embeddings")(
      "q33_knn_bruteforce", "q34_ann_lsh", "q35_cosine_neardup",
      "q45_rolling_fingerprint", "q59_random_projection", "q82_int8_quant",
      "q83_semdedup", "q113_hard_negatives", "q153_semantic_decon") ++
    m("quantile_cont (DuckDB name for percentile_cont)")(
      "q40_percentiles", "q81_event_gaps", "q102_embedding_audit") ++
    m("strftime date formatting")("q15_monthly_summary", "q18_datetime_funcs") ++
    m("->> JSON extraction operator")("q19_json_extract") ++
    m("epoch() timestamp extraction")("q22_sessionize", "q48_session_window") ++
    m("regexp_replace 'g' flag / len() on lists")(
      "q29_fingerprint", "q64_pii_redaction", "q173_er_pairs_3pass") ++
    m("list comprehension [expr FOR x IN list]")("q42_string_funcs") ++
    m("ASOF JOIN syntax")("q49_asof_join") ++
    m("'0x'-prefixed hex string cast to BIGINT")("q55_hash_split") ++
    m("IGNORE NULLS placement (DuckDB: inside the call parens; Spark: after)")(
      "q109_attribution") ++
    m("3-arg date_diff('day', a, b)")("q61_retention") ++
    m("isoyear() extraction (Spark spells it extract(YEAROFWEEK), DuckDB " +
      "has no such field)")("q14_weekly_summary", "q63_grouping_sets") ++
    m("range() table function")("q93_dim_stats", "q139_embedding_covariance",
      "q143_whiten_top_component", "q144_maintained_covariance",
      "q145_maintained_whitening", "q147_whiten_top_two") ++
    m("list_slice/list_dot_product on array<double> embeddings")(
      "q140_matryoshka_fidelity") ++
    m("strlen()/'//' integer division")("q110_media_decode",
      "q120_frame_sample")).toMap
  }

  test("the exclusion list names only real oracle entries (no stale keys)") {
    val stale = duckdbOnly.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"excluded-but-nonexistent: $stale")
  }

  private val neutral: Seq[String] =
    SparkEntry.oracleSql.keys.toSeq.sorted.filterNot(duckdbOnly.contains)

  test(s"the neutral set is the full oracle map minus the explicit exclusions " +
    s"(${neutral.size} covered / ${duckdbOnly.size} excluded)") {
    assert(neutral.size + duckdbOnly.size == SparkEntry.oracleSql.size)
  }

  /** Both directions of the row comparison over ONE execution of each
    * plan: the two exceptAll counts used to re-execute both subtrees,
    * doubling every test's cost (q147's twin alone ran 2×~2.5 min per
    * direction); the results at sf0.001 are tiny, so materializing them
    * first is free and the comparison semantics are unchanged. */
  /** NOTE: the DataFrame side must be CONSTRUCTED first — some builders
    * register their native functions (rolling_hash_native, dot_native)
    * on the session as a construction side effect, and the SQL text
    * resolves against that registry. */
  private def assertSameRows(name: String, text: String): Unit = {
    val viaDf = SparkEntry.queries(name)(spark, sf0001)
    val viaSql = SqlSurface.sql(spark, sf0001, text)
    assert(viaSql.columns.toSeq === viaDf.columns.toSeq)
    val sqlM = viaSql.localCheckpoint()
    val dfM = viaDf.localCheckpoint()
    assert(sqlM.exceptAll(dfM).count() === 0, s"$name sql-only rows")
    assert(dfM.exceptAll(sqlM).count() === 0, s"$name df-only rows")
  }

  neutral.foreach { name =>
    test(s"$name: spark.sql(oracle text) ≡ DataFrame plan") {
      assertSameRows(name, SparkEntry.oracleSql(name))
    }
  }

  // ---- Spark-dialect twins ([[SparkSqlTwins]]) for excluded texts ----

  test("every Spark-dialect twin covers an EXCLUDED text (a twin for a neutral " +
    "text would shadow the shared-SQL gate) and names a real query") {
    val twinKeys = SparkEntry.sparkSql.keySet
    assert((twinKeys -- duckdbOnly.keySet).isEmpty,
      s"twin for non-excluded/unknown: ${twinKeys -- duckdbOnly.keySet}")
  }

  test(s"combined spark.sql coverage (neutral + twins) reaches at least 60 texts " +
    s"(${neutral.size} neutral + ${SparkEntry.sparkSql.size} twins)") {
    assert(neutral.size + SparkEntry.sparkSql.size >= 60)
  }

  SparkEntry.sparkSql.keys.toSeq.sorted.foreach { name =>
    test(s"$name: spark.sql(Spark-dialect twin) ≡ DataFrame plan") {
      assertSameRows(name, SparkEntry.sparkSql(name))
    }
  }
}
