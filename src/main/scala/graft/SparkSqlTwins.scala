package graft

/** Spark-dialect SQL TWINS for oracle texts that cannot run on Spark SQL
  * verbatim (SqlSurfaceSpec's exclusion list): the same query, written in
  * Spark's dialect, so the half of the engine a BI user touches first —
  * `spark.sql` over registered views — covers the high-traffic shapes
  * too. Each twin must produce row-for-row the DataFrame plan's answer
  * (SqlSurfaceSpec proves it), which the DuckDB oracle already
  * hash-matches — so the three faces (DataFrame, DuckDB SQL, Spark SQL)
  * agree pairwise.
  *
  * Dialect mappings used (DuckDB → Spark):
  *  - `isoyear(d)` → `extract(YEAROFWEEK FROM d)`
  *  - `strftime(d, '%b %Y' / '%Y-%m-%d')` → `date_format(d, 'MMM yyyy' / 'yyyy-MM-dd')`
  *  - `epoch(ts)` → `CAST(ts AS DOUBLE)` (keeps fractional seconds)
  *  - `date_diff('day', a, b)` → `datediff(b, a)`; `d - 6` → `date_sub(d, 6)`
  *  - `props->>'$.k'` → `get_json_object(props, '$.k')`
  *  - `quantile_cont(x, p)` → `percentile(x, pD)` (both exact interpolating)
  *  - `'0x' || hex` cast → `conv(hex, 16, 10)`
  *  - `ASOF LEFT JOIN` → union + `last(x, true)` carry-forward window
  *    (the same one-shuffle trick the DataFrame plan uses)
  *  - `range(1, 65)` / `unnest(generate_series(lo, hi))` → `explode(sequence(…))`
  *  - `v[i]` → `element_at(v, i)`; `len`/`list_*` → `size`/`filter`/`aggregate`
  *  - `string_split_regex` → `split`; `strlen` → `octet_length`; `//` → `div`
  *  - `IGNORE NULLS` clause → `last(x, true)` 2-arg form
  *  - regex literals double their backslashes (Spark's single-quoted SQL
  *    strings process escapes; DuckDB's do not); Spark regexp_replace is
  *    global by default, so the 'g' flag just drops.
  */
object SparkSqlTwins {

  /** DuckDB's `list_dot_product(a, b)` in neutral Spark SQL: the
    * higher-order-function composition [[graft.expressions.RewriteHofDotProduct]]
    * rewrites to the codegen'd `dot_native` — so the twin and the
    * DataFrame plan run the SAME sequential summation, bit for bit. */
  private def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, w) -> acc + w)"

  /** Cosine with both norms recomputed in place (the twins' spelling of
    * the precomputed-norm pair: same values, same multiply order). */
  private def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** The sign-LSH bucket over the first 8 components (0-based in Spark's
    * bracket indexing; the oracle's v[i] is 1-based). */
  private val signBucket8: String =
    (0 until 8).map(i => s"CASE WHEN v[$i] >= 0D THEN '1' ELSE '0' END").mkString(" || ")

  /** The word-3-gram shingle array over `toks` (Spark spelling of the
    * oracle's list comprehension; the DataFrame plans build the same
    * expression via TextOps.shinglesExpr). */
  private val shingleCase: String =
    """CASE WHEN size(toks) < 3 THEN array()
      |          ELSE transform(sequence(1, size(toks) - 2),
      |               i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) END""".stripMargin

  /** The 8-slice MinHash signature CTE chain over distinct doc shingles
    * (shared by the q95/q126 twins, same shape the q30 family builds). */
  private val minhashSigCtes: String =
    raw"""td AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM td
       |       LATERAL VIEW explode($shingleCase) t AS shingle),
       |hashed AS (SELECT doc_id, md5(shingle) AS h FROM sh),
       |sig AS (SELECT doc_id,
       |  min(substring(h, 1, 4)) h0, min(substring(h, 5, 4)) h1,
       |  min(substring(h, 9, 4)) h2, min(substring(h, 13, 4)) h3,
       |  min(substring(h, 17, 4)) h4, min(substring(h, 21, 4)) h5,
       |  min(substring(h, 25, 4)) h6, min(substring(h, 29, 4)) h7
       |  FROM hashed GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, h0 || h1 AS bucket FROM sig
       |  UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
       |  UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
       |  UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig)""".stripMargin

  /** The df-capped distinct-shingle view + per-doc set sizes (q31/q116
    * twins — the capped pair spine in SQL form). */
  private val cappedCtes: String =
    raw"""td AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM td
       |       LATERAL VIEW explode($shingleCase) t AS shingle),
       |h AS (SELECT DISTINCT doc_id, substring(md5(shingle), 1, 16) AS sh16 FROM sh),
       |capped AS (SELECT doc_id, sh16 FROM (
       |    SELECT doc_id, sh16, count(*) OVER (PARTITION BY sh16) AS df FROM h)
       |  WHERE df <= 30),
       |sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |           FROM capped a JOIN capped b ON a.sh16 = b.sh16 AND a.doc_id < b.doc_id
       |           GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** The q130 perceptual-hash build in Spark SQL (pixel regeneration →
    * 8×8 cell moments → integer-exact threshold bits → packed halves),
    * shared by the q130/q131/q132 twins. */
  private val ahashSparkCtes: String =
    """im AS (SELECT doc_id, CAST(n_chars % 24 + 8 AS BIGINT) AS w,
      |                   CAST(n_chars % 16 + 8 AS BIGINT) AS h
      |            FROM documents WHERE doc_id % 3 = 0),
      |px AS (SELECT im.doc_id, im.w, im.h,
      |              CAST(y.g * 8 AS BIGINT) div im.h AS cy,
      |              CAST(x.g * 8 AS BIGINT) div im.w AS cx,
      |              CAST((im.doc_id * 7 + y.g * 13 + x.g * 31) % 256 AS BIGINT) AS v
      |       FROM im,
      |            (SELECT explode(sequence(0, 22)) AS g) y,
      |            (SELECT explode(sequence(0, 30)) AS g) x
      |       WHERE y.g < im.h AND x.g < im.w),
      |cell AS (SELECT doc_id, w, h, cy * 8 + cx AS idx,
      |                sum(v) AS cs, count(1) AS cc
      |         FROM px GROUP BY doc_id, w, h, cy, cx),
      |tot AS (SELECT doc_id, sum(cs) AS ts, sum(cc) AS tc
      |        FROM cell GROUP BY doc_id),
      |bits AS (SELECT cell.doc_id, w, h, idx,
      |                CASE WHEN cs * tc >= ts * cc THEN 1L ELSE 0L END AS b
      |         FROM cell JOIN tot ON cell.doc_id = tot.doc_id),
      |hash AS (SELECT doc_id, w, h,
      |    sum(CASE WHEN idx >= 32 THEN b * shiftleft(1L, CAST(idx - 32 AS INT)) ELSE 0L END) AS hi,
      |    sum(CASE WHEN idx < 32 THEN b * shiftleft(1L, CAST(idx AS INT)) ELSE 0L END) AS lo,
      |    sum(b) AS n
      |  FROM bits GROUP BY doc_id, w, h)""".stripMargin

  /** Restrict a twin CTE's `documents` base to the maintained-index
    * fixture's corpus split (q178's recompute must see exactly the docs
    * the index was built from — the held-out batch is doc_id % 10 = 9). */
  private def corpusSplit(cte: String): String = cte.replace("FROM documents",
    "FROM (SELECT * FROM documents WHERE doc_id % 10 <> 9) documents")

  /** The banded candidate-pair spine over [[minhashSigCtes]] — the Spark
    * spelling of the oracle's shared `cand` prefix (q30's LSH join),
    * consumed by the q100/q103 graph twins. */
  private val candCte: String =
    s"""$minhashSigCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)""".stripMargin

  /** Spark twin of q100 PageRank. The oracle text needs AS MATERIALIZED
    * — each unrolled iteration r_i is read TWICE (contrib join + the
    * dangling-mass sum), and Spark inlines every CTE reference, so the
    * oracle's shape would copy the whole upstream band self-join 2^5
    * times into one plan. The twin removes the second read instead of
    * materializing: isolated nodes all carry the SAME rank at every
    * step, so the dangling mass dm_i and the isolated rank riso_i are
    * scalar recurrences in (n, niso) alone — exactly the closed form
    * the DataFrame plan tracks driver-side (TextOps.q100PageRank) —
    * computed here once in a lateral-column-alias chain (`sc`) and
    * cross-joined into each level. Every r_i is then referenced exactly
    * once and the plan grows LINEARLY in iterations. Arithmetic mirrors
    * the DataFrame expression-for-expression ((1−d)/n precomputed,
    * d·(contrib + dm/n) for ranks but (d·dm)/n for riso) so the doubles
    * agree bit-for-bit before the final round(…, 6). */
  private val pagerankTwin: String = {
    import graft.functions.TextOps.{PageRankDamping => d, PageRankIters => k}
    val scalarChain = (1 to k).map { i =>
      s"""       niso * riso${i - 1} AS dm$i,
         |       (1D - ${d}D)/n + ${d}D * dm$i / n AS riso$i""".stripMargin
    }.mkString(",\n")
    val iterCtes = (1 to k).map { i =>
      s"""r$i AS (SELECT a.doc_id, a.deg,
         |  (1D - ${d}D)/s.n + ${d}D * (COALESCE(c.contrib, 0D) + s.dm$i/s.n) AS rank
         |  FROM active a
         |  LEFT JOIN (SELECT e.dst AS doc_id, sum(r.rank / r.deg) AS contrib
         |             FROM r${i - 1} r JOIN edges e ON e.src = r.doc_id
         |             GROUP BY 1) c USING (doc_id)
         |  CROSS JOIN sc s)""".stripMargin
    }.mkString(",\n")
    s"""WITH $candCte,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |          UNION ALL SELECT doc_b, doc_a FROM cand),
       |active AS (SELECT src AS doc_id, count(*) AS deg FROM edges GROUP BY 1),
       |base AS (SELECT CAST(nd.n AS DOUBLE) AS n,
       |                CAST(nd.n AS DOUBLE) - CAST(na.k AS DOUBLE) AS niso
       |         FROM (SELECT count(*) AS n FROM documents) nd
       |         CROSS JOIN (SELECT count(*) AS k FROM active) na),
       |sc AS (SELECT n, niso, 1D / n AS riso0,
       |$scalarChain
       |       FROM base),
       |r0 AS (SELECT a.doc_id, a.deg, s.riso0 AS rank
       |       FROM active a CROSS JOIN sc s),
       |$iterCtes
       |SELECT d.doc_id, round(COALESCE(r.rank, s.riso$k) * s.n, 6) AS rank_x_n
       |FROM documents d
       |LEFT JOIN r$k r USING (doc_id)
       |CROSS JOIN sc s""".stripMargin
  }

  /** Unrolled levels for the CONNECTED-COMPONENTS twins (VERDICT r17
    * #3 — the q100 trick applied to label propagation): recursion-free
    * SQL cannot iterate to fixpoint, but K synchronous min-label
    * levels are EXACT whenever the graph's propagation depth is ≤ K,
    * and the convergence witness below makes a too-shallow K loudly
    * wrong instead of quietly approximate. COST MODEL (corrected,
    * ADVICE r18 — the original note claimed linear plan growth in K):
    * each l$i is referenced once by l$(i+1), but l$K is referenced
    * THREE times (twice by the witness's unconv, once by comp) and
    * `edges` — which inlines the full minhash/LSH candidate self-join
    * — is referenced once per level plus twice in unconv, so Spark's
    * CTE inlining replicates the candidate spine roughly 3·(K+1) times
    * for the component twins (more for q88's funnel, which re-reads
    * comp). That multiplier is affordable ONLY because these texts run
    * solely in the oracle-parity suite; size any K bump against
    * 3·(K+1) spine builds, not K. Measured propagation depth of the
    * fixture graphs (min-label rounds to fixpoint): the q30 near-dup
    * candidate graph needs 1 / 2 / 4 rounds at sf0.001 / 0.01 / 0.1;
    * the ER match graph (q155's levenshtein-gated blocking pairs)
    * needs 4 at every SF — 6 covers both families with margin, and
    * ComponentDepthSpec re-measures both graphs with the engine and
    * fails locally if a fixture regeneration erodes the 2-round
    * margin. A real crawl's near-dup graph is cliquish (depth grows
    * with chain-shaped templates, not corpus size), but this constant
    * is a FIXTURE property, not a law: the witness is the guarantee,
    * K is the budget. */
  private[graft] val ComponentLevels = 6

  /** The K-level chain: expects `edges(src, dst)` (symmetrized, WITH
    * self-loops so every node carries its own label) and `l0(node,
    * lbl)` upstream; ends in `comp(node, lbl)`. The witness counts
    * edges whose endpoints still disagree at level K — zero iff one
    * more level would change nothing (min-propagation is monotone) —
    * and `assert_true` fails the query rather than return an
    * under-propagated labeling. */
  private[graft] def labelPropChain(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""l$i AS (SELECT e.dst AS node, min(l.lbl) AS lbl
         |  FROM l${i - 1} l JOIN edges e ON e.src = l.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""$iters,
       |unconv AS (SELECT count(*) AS nc
       |  FROM edges e
       |  JOIN l$k a ON a.node = e.src
       |  JOIN l$k b ON b.node = e.dst
       |  WHERE a.lbl <> b.lbl),
       |comp AS (SELECT l.node, l.lbl
       |  FROM l$k l CROSS JOIN unconv w
       |  WHERE COALESCE(assert_true(w.nc = 0,
       |    'label propagation not converged in $k levels'), true))""".stripMargin
  }

  /** The near-dup component spine: q30 candidates symmetrized with
    * self-loops, identity labels, [[ComponentLevels]] propagation
    * levels — `comp(node, lbl)` = q54's (doc_id, component_id).
    * Shared by the q54/q69/q88/q119 twins and, corpus-split, by their
    * maintained faces q137/q138. */
  private val componentTwinCtes: String =
    s"""$candCte,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |          UNION ALL SELECT doc_b, doc_a FROM cand
       |          UNION ALL SELECT doc_id, doc_id FROM documents),
       |l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents),
       |${labelPropChain(ComponentLevels)}""".stripMargin

  /** Token counts per doc (the q69/q88/q119 keeper-length input),
    * reusing `td` from the minhash prefix. */
  private val tokdCte: String =
    "tokd AS (SELECT doc_id, CAST(size(toks) AS BIGINT) AS n_tokens FROM td)"

  /** q199's twin (also, corpus-split, q200's): the candidate spine
    * with both q55 splits stamped inline on the pair rows. */
  private val splitLeakageTwin: String =
    s"""WITH $candCte,
       |sp AS (SELECT c.doc_a, c.doc_b,
       |  CASE WHEN CAST(conv(substring(md5(CAST(c.doc_a AS STRING)), 1, 4), 16, 10) AS BIGINT) < 52429 THEN 'train'
       |       WHEN CAST(conv(substring(md5(CAST(c.doc_a AS STRING)), 1, 4), 16, 10) AS BIGINT) < 58982 THEN 'val'
       |       ELSE 'test' END AS split_a,
       |  CASE WHEN CAST(conv(substring(md5(CAST(c.doc_b AS STRING)), 1, 4), 16, 10) AS BIGINT) < 52429 THEN 'train'
       |       WHEN CAST(conv(substring(md5(CAST(c.doc_b AS STRING)), 1, 4), 16, 10) AS BIGINT) < 58982 THEN 'val'
       |       ELSE 'test' END AS split_b
       |  FROM cand c),
       |pe AS (SELECT doc_a AS doc_id, split_a AS split, doc_b AS train_doc
       |       FROM sp WHERE split_a <> 'train' AND split_b = 'train'
       |       UNION ALL
       |       SELECT doc_b, split_b, doc_a
       |       FROM sp WHERE split_b <> 'train' AND split_a = 'train')
       |SELECT doc_id, split, count(DISTINCT train_doc) AS n_train_dups
       |FROM pe GROUP BY doc_id, split""".stripMargin

  /** q54's twin (also, corpus-split, q137's). */
  private val componentsTwin: String =
    s"""WITH $componentTwinCtes
       |SELECT node AS doc_id, lbl AS component_id,
       |       count(*) OVER (PARTITION BY lbl) AS component_size
       |FROM comp""".stripMargin

  /** q69's twin (also, corpus-split, q138's). */
  private val keepersTwin: String =
    s"""WITH $componentTwinCtes,
       |$tokdCte,
       |ranked AS (SELECT c.lbl AS component_id, c.node AS doc_id, t.n_tokens,
       |                  row_number() OVER (PARTITION BY c.lbl
       |                    ORDER BY t.n_tokens DESC, c.node) AS rn,
       |                  count(*) OVER (PARTITION BY c.lbl) AS component_size
       |           FROM comp c JOIN tokd t ON t.doc_id = c.node)
       |SELECT component_id, doc_id AS keeper_id, n_tokens AS keeper_tokens,
       |       CAST(component_size AS BIGINT) AS component_size
       |FROM ranked WHERE rn = 1""".stripMargin

  /** q88's twin: the five-stage funnel over the same spine (keepers →
    * contamination anti-filter → quality gate). Lazy: reads
    * [[graft.functions.CurationOps.BenchmarkShingles]], whose object
    * init must not run during this object's own (the TextOps
    * precedent). D-suffixed literals keep the quality score in DOUBLE
    * (a bare 100.0 computes in DECIMAL and can flip the >= 0.5 gate on
    * boundary docs). */
  private lazy val funnelTwin: String = {
    val inlist = graft.functions.CurationOps.BenchmarkShingles
      .map(b => s"'$b'").mkString(", ")
    s"""WITH $componentTwinCtes,
       |$tokdCte,
       |ranked AS (SELECT c.node AS doc_id,
       |                  row_number() OVER (PARTITION BY c.lbl
       |                    ORDER BY t.n_tokens DESC, c.node) AS rn
       |           FROM comp c JOIN tokd t ON t.doc_id = c.node),
       |keepers AS (SELECT doc_id FROM ranked WHERE rn = 1),
       |contaminated AS (SELECT DISTINCT doc_id FROM sh
       |                 WHERE shingle IN ($inlist)),
       |clean AS (SELECT doc_id FROM keepers
       |          WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |quality AS (SELECT doc_id FROM td
       |            WHERE least(size(toks) / 100.0D, 1.0D)
       |                  * (1.0D - size(filter(toks,
       |                       x -> x IN ('the', 'a', 'of', 'and')))
       |                       / size(toks)) >= 0.5D)
       |SELECT '1_raw' AS stage, count(*) AS n_docs FROM documents
       |UNION ALL SELECT '2_exact',
       |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')))
       |  FROM documents
       |UNION ALL SELECT '3_near_dup', count(*) FROM keepers
       |UNION ALL SELECT '4_decontaminated', count(*) FROM clean
       |UNION ALL SELECT '5_quality', count(*) FROM clean JOIN quality USING (doc_id)""".stripMargin
  }

  /** The ER entity spine (q155/q162): the q154 blocking + levenshtein
    * match graph, then the same unrolled propagation over name nodes.
    * `nmExtra` supplies the per-name extras each twin rolls up
    * (min p_partkey nid for q155, record counts for q162); `edgeSrc`
    * supplies the `edges`/`l0` CTE pair picking the node key (numeric
    * nid vs the name string — min over strings is the q162 oracle's
    * own label order). */
  private def erChain(nmExtra: String, edgeSrc: String): String =
    s"""nm AS (
       |  SELECT p_name AS name, $nmExtra,
       |         CASE WHEN instr(p_name, ' ') = 0 THEN p_name
       |              ELSE substr(p_name, 1, instr(p_name, ' ') - 1)
       |         END AS adj,
       |         CASE WHEN instr(p_name, ' ') = 0 THEN p_name
       |              ELSE substr(p_name, length(p_name) - instr(reverse(p_name), ' ') + 2)
       |         END AS noun
       |  FROM part GROUP BY p_name
       |),
       |blocks AS (
       |  SELECT name, 'adj' AS slot, adj AS key FROM nm
       |  UNION ALL
       |  SELECT name, 'noun' AS slot, noun AS key FROM nm
       |),
       |sized AS (
       |  SELECT slot, key FROM blocks GROUP BY slot, key
       |  HAVING count(*) <= ${graft.functions.EntityOps.MaxBlockSize}
       |),
       |cand AS (
       |  SELECT a.name AS name_a, b.name AS name_b
       |  FROM blocks a
       |  JOIN sized s ON s.slot = a.slot AND s.key = a.key
       |  JOIN blocks b ON b.slot = a.slot AND b.key = a.key AND a.name < b.name
       |  GROUP BY a.name, b.name
       |),
       |mtch AS (
       |  SELECT name_a, name_b FROM cand
       |  WHERE levenshtein(name_a, name_b) <= ${graft.functions.EntityOps.MatchMaxDist}
       |),
       |$edgeSrc,
       |${labelPropChain(ComponentLevels)}""".stripMargin

  /** The scene-fingerprint regeneration in Spark dialect (`im`/`sc`/
    * `px`/`fp`), shared by the q180/q185/q187/q188 twins. */
  private val sceneFpSparkCtes: String =
      """im AS (SELECT doc_id, doc_id div 4 AS gid,
        |                   CAST(((doc_id div 4) % 3 + 2) * 8 AS BIGINT) AS w,
        |                   CAST(((doc_id div 4) % 2 + 2) * 8 AS BIGINT) AS h,
        |                   n_chars % 4 + 4 AS k
        |            FROM documents WHERE doc_id % 3 = 2),
        |sc AS (SELECT im.doc_id, im.gid, im.w, im.h, c.g AS c
        |       FROM im, (SELECT explode(sequence(0, 2)) AS g) c
        |       WHERE c.g <= 1 OR im.k >= 5),
        |px AS (SELECT sc.doc_id, sc.c, sc.w, sc.h, yy.g AS y, xx.g AS x,
        |              CAST((sc.gid * 7 + sc.c * 11 + (yy.g div 8) * 13 +
        |                    (xx.g div 8) * 31) % 256 AS BIGINT) AS v
        |       FROM sc,
        |            (SELECT explode(sequence(0, 23)) AS g) yy,
        |            (SELECT explode(sequence(0, 31)) AS g) xx
        |       WHERE yy.g < sc.h AND xx.g < sc.w),
        |fp AS (SELECT doc_id, c,
        |              md5(concat(CAST(w AS STRING), 'x', CAST(h AS STRING), ':',
        |                  array_join(transform(
        |                    array_sort(collect_list(struct(y, x, v))),
        |                    e -> CAST(e.v AS STRING)), ','))) AS f
        |       FROM px GROUP BY doc_id, c, w, h)""".stripMargin

  /** The q180 recompute text, shared by the q185 keeper twin. */
  private val videoSceneTwin: String =
      s"""WITH $sceneFpSparkCtes,
        |kfp AS (SELECT doc_id, f FROM (
        |    SELECT fp.*, count(1) OVER (PARTITION BY f) AS fdf FROM fp) fd
        |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
        |SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
        |       count(DISTINCT a.f) AS n_shared_scenes
        |FROM kfp a JOIN kfp b ON b.f = a.f AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id""".stripMargin

  /** The q174 recompute text, shared verbatim by the q182 twin
    * (the mixed-subsampling corpus carries the same pixels). */
  private val jpeg420Twin: String =
      """WITH im AS (SELECT doc_id, CAST((n_chars % 2 + 1) * 16 AS BIGINT) AS w,
        |                   CAST((n_chars % 3 + 1) * 16 AS BIGINT) AS h
        |            FROM documents),
        |yb AS (SELECT im.doc_id, im.w, im.h,
        |              CAST((im.doc_id * 7 + yy.g * 13 + xx.g * 31) % 256 AS BIGINT) AS v
        |       FROM im,
        |            (SELECT explode(sequence(0, 5)) AS g) yy,
        |            (SELECT explode(sequence(0, 3)) AS g) xx
        |       WHERE yy.g < im.h div 8 AND xx.g < im.w div 8),
        |ya AS (SELECT doc_id, w, h, CAST(sum(v) * 64 AS DOUBLE) AS s,
        |              CAST(sum(v * v) * 64 AS DOUBLE) AS ss
        |       FROM yb GROUP BY doc_id, w, h),
        |cb AS (SELECT im.doc_id, im.w, im.h, cc.g AS c,
        |              CAST((im.doc_id * (CASE cc.g WHEN 1 THEN 11 ELSE 5 END) +
        |                    yy.g * (CASE cc.g WHEN 1 THEN 17 ELSE 29 END) +
        |                    xx.g * (CASE cc.g WHEN 1 THEN 23 ELSE 37 END)) % 256
        |                   AS BIGINT) AS v
        |       FROM im,
        |            (SELECT explode(sequence(1, 2)) AS g) cc,
        |            (SELECT explode(sequence(0, 2)) AS g) yy,
        |            (SELECT explode(sequence(0, 1)) AS g) xx
        |       WHERE yy.g < im.h div 16 AND xx.g < im.w div 16),
        |ca AS (SELECT doc_id, w, h, c, CAST(sum(v) * 256 AS DOUBLE) AS s,
        |              CAST(sum(v * v) * 256 AS DOUBLE) AS ss
        |       FROM cb GROUP BY doc_id, w, h, c)
        |SELECT ya.doc_id AS media_id, ya.w AS width, ya.h AS height,
        |  round(ya.s / (ya.w * ya.h), 4) AS mean_y,
        |  round(c1.s / (ya.w * ya.h), 4) AS mean_cb,
        |  round(c2.s / (ya.w * ya.h), 4) AS mean_cr,
        |  round(ya.ss / (ya.w * ya.h) -
        |        (ya.s / (ya.w * ya.h)) * (ya.s / (ya.w * ya.h)), 4) AS var_y,
        |  round(c1.ss / (ya.w * ya.h) -
        |        (c1.s / (ya.w * ya.h)) * (c1.s / (ya.w * ya.h)), 4) AS var_cb,
        |  round(c2.ss / (ya.w * ya.h) -
        |        (c2.s / (ya.w * ya.h)) * (c2.s / (ya.w * ya.h)), 4) AS var_cr
        |FROM ya
        |JOIN ca c1 ON c1.doc_id = ya.doc_id AND c1.c = 1
        |JOIN ca c2 ON c2.doc_id = ya.doc_id AND c2.c = 2""".stripMargin


  /** The 4×16-bit band explode over `hash` (q131/q132 twins). */
  private val ahashBandCte: String =
    """band AS (SELECT doc_id, hi, lo, g.b,
      |    CASE g.b WHEN 0 THEN lo & 65535L
      |             WHEN 1 THEN shiftright(lo, 16) & 65535L
      |             WHEN 2 THEN hi & 65535L
      |             ELSE shiftright(hi, 16) & 65535L END AS v
      |  FROM hash, (SELECT explode(array(0, 1, 2, 3)) AS b) g)""".stripMargin

  /** Hot-band drop over `band` at [[graft.multimodal.Multimodal
    * .ModalityBandCap]] — mirrors the DataFrame plans' degenerate-band
    * cap (VERDICT r16 #1) so the twins stay plan-faithful. */
  private val cappedBandCte: String =
    s"""kband AS (SELECT doc_id, hi, lo, b, v FROM (
       |    SELECT band.*, count(1) OVER (PARTITION BY b, v) AS bdf FROM band) bd
       |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap})""".stripMargin

  /** [[cappedBandCte]] for the probe twins: the cap is computed over the
    * CORPUS split only (the committed side is what concentrates). */
  private val corpusCappedBandCte: String =
    s"""cband AS (SELECT doc_id, hi, lo, b, v FROM (
       |    SELECT cb.*, count(1) OVER (PARTITION BY b, v) AS bdf
       |    FROM (SELECT * FROM band WHERE doc_id % 10 <> 9) cb) bd
       |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap})""".stripMargin

  /** Hot-fp drop over `win` at [[graft.multimodal.Multimodal
    * .ExactFpCap]] (q176/q181/q183 twins). */
  private val cappedWinCte: String =
    s"""kwin AS (SELECT doc_id, w, fp FROM (
       |    SELECT win.*, count(1) OVER (PARTITION BY fp) AS fdf FROM win) wd
       |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})""".stripMargin

  /** [[cappedWinCte]] with the cap over the corpus split (q184 twin). */
  private val corpusCappedWinCte: String =
    s"""cwin AS (SELECT doc_id, w, fp FROM (
       |    SELECT cw.*, count(1) OVER (PARTITION BY fp) AS fdf
       |    FROM (SELECT * FROM win WHERE doc_id % 10 <> 9) cw) wd
       |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})""".stripMargin

  /** Spark side of Multimodal.audioFpCte: the quad-keyed gated PCM,
    * 64 energy windows, integer-exact threshold bits, packed halves. */
  private val audioFpSparkCtes: String =
    """a AS (SELECT doc_id, doc_id div 4 AS gid FROM documents
      |           WHERE doc_id % 3 = 1),
      |s AS (SELECT a.doc_id, g.i, (g.i * 64) div 768 AS wi,
      |        CASE WHEN ((a.gid * 2654435761L + (g.i div 12) * 2246822519L) % 2147483648L)
      |                  * ((a.gid * 2654435761L + (g.i div 12) * 2246822519L) % 2147483648L)
      |                  % 2147483647L % 64 < 24
      |             THEN 0L
      |             ELSE CAST(((a.gid * 31 + g.i * 17) % 65536) - 32768 AS BIGINT)
      |        END AS v
      |      FROM a, (SELECT explode(sequence(0, 767)) AS i) g),
      |win AS (SELECT doc_id, wi, sum(v * v) AS es, count(1) AS ec
      |        FROM s GROUP BY doc_id, wi),
      |tot AS (SELECT doc_id, sum(es) AS ts, sum(ec) AS tc
      |        FROM win GROUP BY doc_id),
      |bits AS (SELECT win.doc_id, wi,
      |                CASE WHEN es * tc >= ts * ec THEN 1L ELSE 0L END AS b
      |         FROM win JOIN tot ON win.doc_id = tot.doc_id),
      |hash AS (SELECT doc_id,
      |    sum(CASE WHEN wi >= 32 THEN b * shiftleft(1L, CAST(wi - 32 AS INT)) ELSE 0L END) AS hi,
      |    sum(CASE WHEN wi < 32 THEN b * shiftleft(1L, CAST(wi AS INT)) ELSE 0L END) AS lo,
      |    sum(b) AS n
      |  FROM bits GROUP BY doc_id)""".stripMargin

  /** The trimmed-audio fixture + hop-32 window grid in Spark dialect
    * (q175/q176 twins): regenerate [[graft.multimodal.Multimodal
    * .audioWithTrimmedDups]]'s quad-keyed PCM and md5 each 64-sample
    * window's comma-joined samples — `array_sort(collect_list(struct))`
    * stands in for DuckDB's `string_agg(… ORDER BY)`. */
  private val audioTrimSparkCtes: String =
    """a AS (SELECT doc_id, doc_id div 4 AS gid, (doc_id % 4) * 96 AS off
      |           FROM documents WHERE doc_id % 3 = 1),
      |s AS (SELECT a.doc_id, g.i,
      |        ((a.gid * 2654435761L + a.off + g.i) % 2147483647L)
      |        * ((a.gid * 2654435761L + a.off + g.i) % 2147483647L)
      |        % 2147483647L % 65536L - 32768L AS v
      |      FROM a, (SELECT explode(sequence(0, 767)) AS i) g),
      |wj AS (SELECT w.g AS w, j.g AS j, w.g * 32 + j.g AS i
      |       FROM (SELECT explode(sequence(0, 22)) AS g) w,
      |            (SELECT explode(sequence(0, 63)) AS g) j),
      |win AS (SELECT s.doc_id, wj.w,
      |          md5(array_join(transform(
      |            array_sort(collect_list(struct(wj.j AS j, s.v AS v))),
      |            x -> CAST(x.v AS STRING)), ',')) AS fp
      |        FROM wj JOIN s ON s.i = wj.i
      |        GROUP BY s.doc_id, wj.w)""".stripMargin

  /** The ExactSubstr twin at min-match width w — same generator
    * discipline as TextOps.exactSubstrSql so the two widths (q148 = 8,
    * q152 = 16) can't drift from each other in Spark dialect either. */
  private def exactSubstrTwin(w: Int): String =
    // the window list rides a CASE, not the WHERE alone: Spark may
    // evaluate the projection on pre-filter rows (observed on the
    // parquet scan path), and for a doc under w tokens
    // sequence(1, size-w+1) is a DESCENDING sequence through 0 that
    // feeds slice an illegal start — the If branch is lazily evaluated,
    // so short docs never reach the slice (DuckDB's generate_series is
    // empty there, which is why the oracle text needs no guard)
    raw"""WITH t AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
       |hl AS (SELECT doc_id,
       |         CASE WHEN size(toks) >= $w
       |              THEN transform(sequence(1, size(toks) - ${w - 1}),
       |                     i -> md5(concat_ws(' ', slice(toks, i, $w))))
       |              ELSE array() END AS hs
       |       FROM t WHERE size(toks) >= $w),
       |p AS (SELECT doc_id, p0 + 1 AS p, h
       |      FROM hl LATERAL VIEW posexplode(hs) t2 AS p0, h),
       |d AS (SELECT h FROM p GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT p.doc_id, p.p FROM p JOIN d USING (h)),
       |b AS (SELECT doc_id, p,
       |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > $w
       |             THEN 1 ELSE 0 END AS brk
       |      FROM dp),
       |g AS (SELECT doc_id, p,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM b)
       |SELECT doc_id,
       |       CAST(min(p) AS BIGINT) AS span_start,
       |       CAST(max(p) + ${w - 1} AS BIGINT) AS span_end,
       |       CAST(max(p) + $w - min(p) AS BIGINT) AS span_tokens
       |FROM g GROUP BY doc_id, gid""".stripMargin

  /** q189's Spark-dialect pixel/aHash/banding prefix, ending in the
    * UNCAPPED rows `band0(doc_id, fp, hi, lo, b, v)` — shared by the
    * q189/q191 twins and the q193 probe twin. */
  private val reencodeBandTwinCte: String =
    s"""WITH im AS (SELECT doc_id, doc_id div 4 AS gid,
         |                   CAST(((doc_id div 4) % 3 + 2) * 16 AS BIGINT) AS w,
         |                   CAST(((doc_id div 4) % 2 + 2) * 16 AS BIGINT) AS h,
         |                   n_chars % 4 + 4 AS k,
         |                   CASE WHEN doc_id % 4 = 3 THEN 1L ELSE 0L END AS shift
         |            FROM documents
         |            WHERE doc_id % 3 = 2 AND (doc_id div 4) % 3 = 2),
         |sc AS (SELECT im.*, c.g AS c
         |       FROM im, (SELECT explode(sequence(0, 2)) AS g) c
         |       WHERE c.g <= 1 OR im.k >= 5),
         |px AS (SELECT sc.doc_id, sc.c, sc.w, sc.h, yy.g AS y, xx.g AS x,
         |              CAST(yy.g * 8 AS BIGINT) div sc.h AS cy,
         |              CAST(xx.g * 8 AS BIGINT) div sc.w AS cx,
         |              ((sc.gid * 2654435761L + sc.c * 97L +
         |                (yy.g div 8) * 13L + (xx.g div 8) * 31L) % 2147483647L)
         |              * ((sc.gid * 2654435761L + sc.c * 97L +
         |                  (yy.g div 8) * 13L + (xx.g div 8) * 31L) % 2147483647L)
         |              % 2147483647L % 255L + sc.shift AS v
         |       FROM sc,
         |            (SELECT explode(sequence(0, 63)) AS g) yy,
         |            (SELECT explode(sequence(0, 63)) AS g) xx
         |       WHERE yy.g < sc.h AND xx.g < sc.w),
         |exact AS (SELECT doc_id, c,
         |              md5(concat(CAST(w AS STRING), 'x', CAST(h AS STRING), ':',
         |                  array_join(transform(
         |                    array_sort(collect_list(struct(y, x, v))),
         |                    e -> CAST(e.v AS STRING)), ','))) AS fp
         |          FROM px GROUP BY doc_id, c, w, h),
         |cell AS (SELECT doc_id, c, cy * 8 + cx AS idx,
         |                sum(v) AS cs, count(1) AS cc
         |         FROM px GROUP BY doc_id, c, cy, cx),
         |tot AS (SELECT doc_id, c, sum(cs) AS ts, sum(cc) AS tc
         |        FROM cell GROUP BY doc_id, c),
         |bits AS (SELECT cell.doc_id, cell.c, idx,
         |                CASE WHEN cs * tc >= ts * cc THEN 1L ELSE 0L END AS b
         |         FROM cell JOIN tot ON cell.doc_id = tot.doc_id AND cell.c = tot.c),
         |hash AS (SELECT doc_id, c,
         |    sum(CASE WHEN idx >= 32 THEN b * shiftleft(1L, CAST(idx - 32 AS INT)) ELSE 0L END) AS hi,
         |    sum(CASE WHEN idx < 32 THEN b * shiftleft(1L, CAST(idx AS INT)) ELSE 0L END) AS lo
         |  FROM bits GROUP BY doc_id, c),
         |fr AS (SELECT hash.doc_id, exact.fp, hash.hi, hash.lo
         |       FROM hash JOIN exact ON hash.doc_id = exact.doc_id
         |         AND hash.c = exact.c),
         |band0 AS (SELECT doc_id, fp, hi, lo, g.b,
         |    CASE g.b WHEN 0 THEN lo & 65535L
         |             WHEN 1 THEN shiftright(lo, 16) & 65535L
         |             WHEN 2 THEN hi & 65535L
         |             ELSE shiftright(hi, 16) & 65535L END AS v
         |  FROM fr, (SELECT explode(array(0, 1, 2, 3)) AS b) g)""".stripMargin

  /** q189's full Spark-dialect twin (the q191 maintained face reuses
    * it via corpusSplit). */
  private val reencodeTwin: String =
    s"""$reencodeBandTwinCte,
       |band AS (SELECT doc_id, fp, hi, lo, b, v FROM (
         |    SELECT band0.*, count(1) OVER (PARTITION BY b, v) AS bdf FROM band0) bd
         |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap}),
         |p AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
         |        a.fp AS fpa, b.fp AS fpb,
         |        bit_count(a.hi ^ b.hi) + bit_count(a.lo ^ b.lo) AS hamming
         |      FROM band a JOIN band b ON a.b = b.b AND a.v = b.v
         |        AND a.doc_id < b.doc_id
         |      WHERE bit_count(a.hi ^ b.hi) + bit_count(a.lo ^ b.lo) <= 3)
         |SELECT da AS media_id_a, db AS media_id_b,
         |  count(DISTINCT fpa) AS n_similar_scenes,
         |  count(DISTINCT CASE WHEN fpa = fpb THEN fpa END) AS n_exact_shared,
         |  CAST(max(hamming) AS BIGINT) AS max_hamming
         |FROM p GROUP BY da, db""".stripMargin

  /** q190's Spark-dialect PCM/sign-fingerprint prefix, ending in the
    * UNCAPPED rows `win(doc_id, w, sfp, efp)` — shared by the
    * q190/q192 twins and the q194 probe twin. */
  private val gainWinTwinCte: String =
    s"""WITH a AS (SELECT doc_id, doc_id div 4 AS gid,
         |                  CASE WHEN doc_id % 4 = 3 THEN 2L ELSE 1L END AS gain
         |           FROM documents WHERE doc_id % 3 = 1),
         |s0 AS (SELECT a.doc_id, a.gain, g.i,
         |         (a.gid * 2654435761L + g.i * 2246822519L) % 2147483647L AS t
         |       FROM a, (SELECT explode(sequence(0, 767)) AS i) g),
         |s1 AS (SELECT doc_id, gain, i, (t * t + t) % 2147483647L AS u FROM s0),
         |s AS (SELECT doc_id, i,
         |        (u * u % 2147483647L % 32768L - 16384L) * gain AS v
         |      FROM s1),
         |d AS (SELECT doc_id, i, v,
         |             lead(v) OVER (PARTITION BY doc_id ORDER BY i) AS nv
         |      FROM s),
         |wj AS (SELECT w.g AS w, j.g AS j, w.g * 32 + j.g AS i
         |       FROM (SELECT explode(sequence(0, 22)) AS g) w,
         |            (SELECT explode(sequence(0, 63)) AS g) j),
         |win AS (SELECT d.doc_id, wj.w,
         |          sum(CASE WHEN wj.j < 63 AND d.nv > d.v
         |                   THEN shiftleft(1L, CAST(wj.j AS INT)) ELSE 0L END) AS sfp,
         |          md5(array_join(transform(
         |            array_sort(collect_list(struct(wj.j AS j, d.v AS v))),
         |            x -> CAST(x.v AS STRING)), ',')) AS efp
         |        FROM wj JOIN d ON d.i = wj.i
         |        GROUP BY d.doc_id, wj.w)""".stripMargin

  /** q190's full Spark-dialect twin (the q192 maintained face reuses
    * it via corpusSplit). */
  private val gainTwin: String =
    s"""$gainWinTwinCte,
       |kwin AS (SELECT doc_id, w, sfp, efp FROM (
         |    SELECT win.*, count(1) OVER (PARTITION BY sfp) AS fdf FROM win) wd
         |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
         |SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
         |  count(1) AS n_shared,
         |  sum(CASE WHEN a.efp = b.efp THEN 1L ELSE 0L END) AS n_exact_shared,
         |  CAST(min(b.w - a.w) AS BIGINT) AS offset_w,
         |  count(DISTINCT b.w - a.w) AS n_offsets
         |FROM kwin a JOIN kwin b ON b.sfp = a.sfp AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(1) >= 4""".stripMargin

  /** The robust key-space instrument's Spark twin (q201; the q202
    * maintained face reuses it via corpusSplit): both families' Spark
    * prefixes — their CTE name spaces are disjoint — then the same
    * per-space key-population aggregate the engine computes. */
  private val robustKeySpacesTwin: String = {
    val bandCap = graft.multimodal.Multimodal.ModalityBandCap
    val fpCap = graft.multimodal.Multimodal.ExactFpCap
    s"""$reencodeBandTwinCte,
       |${gainWinTwinCte.stripPrefix("WITH ")},
       |bkdf AS (SELECT b, v, count(1) AS df FROM band0 GROUP BY b, v),
       |sfdf AS (SELECT sfp, count(1) AS df FROM win GROUP BY sfp)
       |SELECT 'reencode_bk' AS space,
       |  CAST($bandCap AS BIGINT) AS cap,
       |  count(1) AS n_keys,
       |  max(df) AS max_key_size,
       |  sum(CASE WHEN df > $bandCap THEN 1L ELSE 0L END) AS n_hot_keys,
       |  sum(CASE WHEN df > $bandCap THEN df ELSE 0L END) AS n_dropped_rows
       |FROM bkdf
       |UNION ALL
       |SELECT 'gain_sfp',
       |  CAST($fpCap AS BIGINT),
       |  count(1), max(df),
       |  sum(CASE WHEN df > $fpCap THEN 1L ELSE 0L END),
       |  sum(CASE WHEN df > $fpCap THEN df ELSE 0L END)
       |FROM sfdf""".stripMargin
  }

  /** The cross-modal family's Spark-dialect prefix (q195/q196): the
    * shared signature chain feeding caption candidates AND the h0
    * image seed, seed-keyed pixels, integer aHash, capped band join —
    * ending in `cand` and `ip`. */
  private val crossmodalTwinCtes: String =
    s"""WITH $minhashSigCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |         WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 = 0),
         |seed AS (SELECT d.doc_id,
         |           COALESCE(CAST(conv(s.h0, 16, 10) AS BIGINT), 0L) AS seed
         |         FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
         |         LEFT JOIN sig s ON s.doc_id = d.doc_id),
         |im AS (SELECT doc_id, seed, CAST(seed % 24 + 8 AS BIGINT) AS w,
         |              CAST(seed % 16 + 8 AS BIGINT) AS h
         |       FROM seed),
         |px AS (SELECT im.doc_id, im.w, im.h,
         |              CAST(y.g * 8 AS BIGINT) div im.h AS cy,
         |              CAST(x.g * 8 AS BIGINT) div im.w AS cx,
         |              CAST((im.seed * 7 + y.g * 13 + x.g * 31) % 256 AS BIGINT) AS v
         |       FROM im,
         |            (SELECT explode(sequence(0, 22)) AS g) y,
         |            (SELECT explode(sequence(0, 30)) AS g) x
         |       WHERE y.g < im.h AND x.g < im.w),
         |cell AS (SELECT doc_id, w, h, cy * 8 + cx AS idx,
         |                sum(v) AS cs, count(1) AS cc
         |         FROM px GROUP BY doc_id, w, h, cy, cx),
         |tot AS (SELECT doc_id, sum(cs) AS ts, sum(cc) AS tc
         |        FROM cell GROUP BY doc_id),
         |bits AS (SELECT cell.doc_id, idx,
         |                CASE WHEN cs * tc >= ts * cc THEN 1L ELSE 0L END AS b
         |         FROM cell JOIN tot ON cell.doc_id = tot.doc_id),
         |hash AS (SELECT doc_id,
         |    sum(CASE WHEN idx >= 32 THEN b * shiftleft(1L, CAST(idx - 32 AS INT)) ELSE 0L END) AS hi,
         |    sum(CASE WHEN idx < 32 THEN b * shiftleft(1L, CAST(idx AS INT)) ELSE 0L END) AS lo
         |  FROM bits GROUP BY doc_id),
         |band0 AS (SELECT doc_id, hi, lo, g.b,
         |    CASE g.b WHEN 0 THEN lo & 65535L
         |             WHEN 1 THEN shiftright(lo, 16) & 65535L
         |             WHEN 2 THEN hi & 65535L
         |             ELSE shiftright(hi, 16) & 65535L END AS v
         |  FROM hash, (SELECT explode(array(0, 1, 2, 3)) AS b) g),
         |band AS (SELECT doc_id, hi, lo, b, v FROM (
         |    SELECT band0.*, count(1) OVER (PARTITION BY b, v) AS bdf FROM band0) bd
         |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap}),
         |ip AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |       FROM band a JOIN band b ON a.b = b.b AND a.v = b.v
         |         AND a.doc_id < b.doc_id
         |       WHERE bit_count(a.hi ^ b.hi) + bit_count(a.lo ^ b.lo) <= 3)""".stripMargin

  /** The classified pair set (q195's final select; q196 wraps it as
    * a CTE). */
  private val crossmodalTwinRelSelect: String =
    s"""SELECT COALESCE(ip.doc_a, c.doc_a) AS doc_a,
         |       COALESCE(ip.doc_b, c.doc_b) AS doc_b,
         |       ip.doc_a IS NOT NULL AS image_dup,
         |       c.doc_a IS NOT NULL AS caption_dup,
         |       CASE WHEN ip.doc_a IS NOT NULL AND c.doc_a IS NOT NULL THEN 'dup_pair'
         |            WHEN ip.doc_a IS NOT NULL THEN 'recaptioned'
         |            ELSE 'reillustrated' END AS relation
         |FROM ip FULL OUTER JOIN cand c
         |  ON c.doc_a = ip.doc_a AND c.doc_b = ip.doc_b""".stripMargin

  /** One power step y = M·x over a FLAT row-major 64×64 matrix, each
    * row summed j-ascending from 0 — the exact fold the DataFrame
    * path's driver loop runs (VectorOps.powerDirection). */
  private def matvec64(m: String, x: String): String =
    s"""transform(sequence(1, 64), i -> aggregate(
       |        zip_with(slice($m, (i - 1) * 64 + 1, 64), $x, (a, b) -> a * b),
       |        0D, (acc, y) -> acc + y))""".stripMargin

  private def norm64(g: String): String =
    s"sqrt(aggregate(transform($g, y -> y * y), 0D, (acc, y) -> acc + y))"

  /** First-nonzero-positive sign rule (VectorOps.powerDirection's):
    * sign of the first component with |y| > 1e-12, 1 when none —
    * guarded so the empty filter never indexes under ANSI. */
  private def sign64(g: String): String =
    s"""CASE WHEN size(filter($g, y -> abs(y) > 1e-12)) > 0
       |          THEN CASE WHEN element_at(filter($g, y -> abs(y) > 1e-12), 1) < 0
       |                    THEN -1D ELSE 1D END
       |          ELSE 1D END""".stripMargin

  /** Spark twin of q147 ("all-but-the-top-2" whitening). The oracle
    * needs AS MATERIALIZED: its two-level power/deflation ladder reads
    * the covariance CTE from ~10 places, and with Spark inlining every
    * reference the copies MULTIPLY through the levels (hundreds of
    * inlined corpus aggregates; measured >10 min to plan at sf0.001).
    * The twin makes the ladder single-reference instead: the snapped
    * means and covariance are PACKED into one-row arrays (a 64-array
    * and a flat row-major 4096-array via a keyed map), and the whole
    * eigensolve — three power steps, normalize, sign, snap, λ₁,
    * deflation, three more steps, Gram–Schmidt, snap — runs as
    * higher-order-function algebra over one-row CTEs, so the plan grows
    * linearly and the corpus is scanned exactly three times (means,
    * covariance, projection), the DataFrame plan's own shape. Each
    * ladder step is its own CTE behind a REPARTITION(1) barrier (r21):
    * in a single lateral-alias SELECT the optimizer inlines each alias
    * into its consumer, and a matvec lambda then re-evaluates BOTH its
    * inputs once per output element — a ×64 EVALUATION multiplier per
    * ladder level that turned the one-row algebra into ~210 s of
    * interpreted array math (measured at sf0.001). The exchanges are
    * one ~33 KB row each; every fold expression is byte-identical, so
    * the arithmetic (and the snap rounding) is unchanged.
    * Every fold is ordered to match the driver-side
    * loops term for term (j-ascending matvec accumulation,
    * (w₁ᵢ·Cᵢⱼ)·w₁ⱼ association in λ₁, (x/nrm)·sgn in the snap), so the
    * engine-computed directions equal VectorOps' driver doubles
    * bit-for-bit and the final projection — the same zip_with/dot
    * composition the optimizer rewrites to dot_native — agrees before
    * the display round. */
  private val whitenTopTwoTwin: String = {
    val ones = "array_repeat(1D, 64)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
       |dims AS (SELECT explode(sequence(1, 64)) AS i),
       |mu0 AS (SELECT i, round(sum(element_at(v, i)) / count(*), 6) AS mu
       |        FROM e CROSS JOIN dims GROUP BY i),
       |muP AS (SELECT transform(array_sort(collect_list(struct(i, mu))), x -> x.mu) AS mu
       |        FROM mu0),
       |d AS (SELECT a.i AS i, b.i AS j FROM dims a CROSS JOIN dims b WHERE a.i <= b.i),
       |c0 AS (SELECT d.i, d.j,
       |         round(sum((element_at(e.v, d.i) - element_at(m.mu, d.i))
       |                   * (element_at(e.v, d.j) - element_at(m.mu, d.j))) / count(*), 7) AS c
       |       FROM e CROSS JOIN muP m CROSS JOIN d
       |       GROUP BY d.i, d.j),
       |cP AS (SELECT map_from_entries(collect_list(struct(i * 65 + j, c))) AS cm
       |       FROM (SELECT i, j, c FROM c0
       |             UNION ALL SELECT j AS i, i AS j, c FROM c0 WHERE i <> j)),
       |alg0 AS (SELECT /*+ REPARTITION(1) */ m.mu,
       |  transform(sequence(1, 4096),
       |    k -> p.cm[CAST(((k - 1) div 64 + 1) * 65 + ((k - 1) % 64 + 1) AS INT)]) AS cf
       |  FROM muP m CROSS JOIN cP p),
       |alg1 AS (SELECT /*+ REPARTITION(1) */ mu, cf, ${matvec64("cf", ones)} AS p1 FROM alg0),
       |alg2 AS (SELECT /*+ REPARTITION(1) */ mu, cf, ${matvec64("cf", "p1")} AS p2 FROM alg1),
       |alg3 AS (SELECT /*+ REPARTITION(1) */ mu, cf, ${matvec64("cf", "p2")} AS p3 FROM alg2),
       |alg4 AS (SELECT /*+ REPARTITION(1) */ mu, cf,
       |  ${norm64("p3")} AS nrm1,
       |  ${sign64("p3")} AS sg1,
       |  transform(p3, y -> round(y / nrm1 * sg1, 6)) AS w1 FROM alg3),
       |alg5 AS (SELECT /*+ REPARTITION(1) */ mu, cf, w1,
       |  transform(sequence(1, 4096),
       |    k -> element_at(w1, CAST((k - 1) div 64 + 1 AS INT))
       |         * element_at(cf, k)) AS cfw,
       |  round(aggregate(${matvec64("cfw", "w1")}, 0D, (acc, y) -> acc + y), 7) AS lam
       |  FROM alg4),
       |alg6 AS (SELECT /*+ REPARTITION(1) */ mu, w1,
       |  transform(sequence(1, 4096), k -> round(element_at(cf, k)
       |    - lam * element_at(w1, CAST((k - 1) div 64 + 1 AS INT))
       |          * element_at(w1, CAST((k - 1) % 64 + 1 AS INT)), 7)) AS c2m
       |  FROM alg5),
       |alg7 AS (SELECT /*+ REPARTITION(1) */ mu, w1, c2m, ${matvec64("c2m", ones)} AS u1 FROM alg6),
       |alg8 AS (SELECT /*+ REPARTITION(1) */ mu, w1, c2m, ${matvec64("c2m", "u1")} AS u2 FROM alg7),
       |alg9 AS (SELECT /*+ REPARTITION(1) */ mu, w1, ${matvec64("c2m", "u2")} AS u3 FROM alg8),
       |alg AS (SELECT /*+ REPARTITION(1) */ mu, w1,
       |  aggregate(zip_with(u3, w1, (a, b) -> a * b), 0D, (acc, y) -> acc + y) AS gsd,
       |  zip_with(u3, w1, (a, b) -> a - gsd * b) AS gq,
       |  ${norm64("gq")} AS nrm2,
       |  ${sign64("gq")} AS sg2,
       |  transform(gq, y -> round(y / nrm2 * sg2, 6)) AS w2
       |FROM alg9),
       |pr AS (SELECT e.vec_id,
       |         zip_with(e.v, a.mu, (x, y) -> x - y) AS vc,
       |         a.w1 AS w1a, a.w2 AS w2a
       |       FROM e CROSS JOIN alg a),
       |f AS (SELECT vec_id,
       |        ${dot("vc", "w1a")} AS c1,
       |        ${dot("vc", "w2a")} AS c2,
       |        ${dot("vc", "vc")} AS ss
       |      FROM pr)
       |SELECT vec_id, round(c1, 6) AS top_coef,
       |       round(c2, 6) AS second_coef,
       |       round(sqrt(greatest(0D, ss - c1 * c1 - c2 * c2)), 6) AS resid_norm
       |FROM f""".stripMargin
  }

  private val base: Map[String, String] = Map(
    "q134_dsir_weights" ->
      raw"""WITH tok AS (SELECT doc_id, source, token
         |       FROM documents LATERAL VIEW explode(split(trim(text), '\\s+')) t AS token),
         |tb AS (SELECT doc_id, source,
         |         CAST(conv(substring(md5(token), 1, 4), 16, 10) AS BIGINT) % 256 AS b
         |       FROM tok),
         |bc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr,
         |         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |       FROM tb GROUP BY b),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS r_tot, CAST(sum(ct) AS BIGINT) AS t_tot
         |        FROM bc),
         |lw AS (SELECT b, ln(((ct + 1.0D) * (r_tot + 256)) / ((cr + 1.0D) * (t_tot + 256))) AS lw
         |       FROM bc CROSS JOIN tot)
         |SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       round(sum(lw.lw), 6) AS logw,
         |       round(sum(lw.lw) / count(*), 6) AS avg_lw,
         |       CAST(CASE WHEN round(sum(lw.lw), 6) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM tb JOIN lw USING (b)
         |GROUP BY tb.doc_id""".stripMargin,

    "q31_jaccard_pairs" ->
      s"""WITH $cappedCtes
         |SELECT doc_a, doc_b, n_shared,
         |       n_shared / (sa.n + sb.n - n_shared) AS jaccard
         |FROM shared
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE n_shared / (sa.n + sb.n - n_shared) >= 0.10D""".stripMargin,

    "q116_containment_pairs" ->
      s"""WITH $cappedCtes
         |SELECT CASE WHEN sb.n < sa.n THEN doc_b ELSE doc_a END AS doc_contained,
         |       CASE WHEN sb.n < sa.n THEN doc_a ELSE doc_b END AS doc_container,
         |       n_shared,
         |       n_shared / least(sa.n, sb.n) AS containment,
         |       n_shared / (sa.n + sb.n - n_shared) AS jaccard
         |FROM shared
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE n_shared / least(sa.n, sb.n) >= 0.8D""".stripMargin,

    "q32_simhash" ->
      raw"""SELECT doc_id, simhash_native(split(trim(text), '\\s+')) AS simhash
         |FROM documents""".stripMargin,

    "q45_rolling_fingerprint" ->
      """SELECT doc_id, rolling_hash_native(trim(text)) AS rolling_hash
        |FROM documents""".stripMargin,

    "q42_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_type) AS ltype,
        |  lpad(CAST(p_partkey AS STRING), 8, '0') AS padded_key,
        |  regexp_replace(p_name, ' ', '_') AS snake_name,
        |  substring_index(p_brand, '#', -1) AS brand_num,
        |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |  levenshtein(p_name, 'small widget') AS edit_dist,
        |  format_string('%s [%s]', p_name, p_brand) AS label,
        |  reverse(p_name) AS rname,
        |  initcap(regexp_replace(p_type, 'PROMO', 'promoted')) AS type_label,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part""".stripMargin,

    "q78_collocations" ->
      raw"""WITH dt AS (SELECT doc_id,
         |              array_sort(array_distinct(split(trim(text), '\\s+'))) AS toks
         |            FROM documents),
         |tok AS (SELECT doc_id, tok FROM dt LATERAL VIEW explode(toks) t AS tok),
         |co AS (SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
         |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |       GROUP BY a.tok, b.tok),
         |df AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT tok_a, tok_b, n_ab,
         |       round(ln((n_ab * n_docs) / (da.df * db.df)), 6) AS pmi
         |FROM co JOIN df da ON co.tok_a = da.tok
         |        JOIN df db ON co.tok_b = db.tok
         |        CROSS JOIN n
         |ORDER BY pmi DESC, tok_a, tok_b
         |LIMIT 20""".stripMargin,

    "q84_curriculum" ->
      raw"""WITH t AS (SELECT doc_id, lang,
         |         CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |       FROM documents),
         |q AS (SELECT lang, n_tokens,
         |             ntile(4) OVER (PARTITION BY lang
         |                            ORDER BY n_tokens, doc_id) AS quartile
         |      FROM t)
         |SELECT lang, CAST(quartile AS BIGINT) AS quartile,
         |       count(*) AS n_docs,
         |       round(avg(n_tokens), 4) AS avg_tokens,
         |       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
         |FROM q GROUP BY lang, quartile""".stripMargin,

    "q85_pack_efficiency" ->
      raw"""WITH t AS (SELECT CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n
         |       FROM documents),
         |b AS (SELECT n, least(CAST(floor(n / 32) AS BIGINT), 7L) AS bucket FROM t)
         |SELECT bucket, (bucket + 1) * 32 AS cap,
         |       count(*) AS n_docs, sum(n) AS sum_tokens,
         |       round(sum(n) / sum(greatest((bucket + 1) * 32, n)), 6) AS efficiency
         |FROM b GROUP BY bucket, cap""".stripMargin,

    "q95_minhash_calibration" ->
      s"""WITH $minhashSigCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |est AS (SELECT c.doc_a, c.doc_b,
         |  (CAST(sa.h0 = sb.h0 AS INT) + CAST(sa.h1 = sb.h1 AS INT)
         |   + CAST(sa.h2 = sb.h2 AS INT) + CAST(sa.h3 = sb.h3 AS INT)
         |   + CAST(sa.h4 = sb.h4 AS INT) + CAST(sa.h5 = sb.h5 AS INT)
         |   + CAST(sa.h6 = sb.h6 AS INT) + CAST(sa.h7 = sb.h7 AS INT)) / 8.0D AS est
         |  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
         |              JOIN sig sb ON sb.doc_id = c.doc_b),
         |hd AS (SELECT DISTINCT doc_id, substring(md5(shingle), 1, 16) AS sh16 FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM hd GROUP BY doc_id),
         |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_shared
         |          FROM cand c JOIN hd a ON a.doc_id = c.doc_a
         |                      JOIN hd b ON b.doc_id = c.doc_b AND b.sh16 = a.sh16
         |          GROUP BY c.doc_a, c.doc_b),
         |ex AS (SELECT e.doc_a, e.doc_b, e.est,
         |         COALESCE(i.n_shared, 0L) / (sa.n + sb.n - COALESCE(i.n_shared, 0L)) AS exact
         |       FROM est e LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
         |       JOIN sizes sa ON sa.doc_id = e.doc_a JOIN sizes sb ON sb.doc_id = e.doc_b)
         |SELECT floor(exact * 10) / 10.0D AS bucket, count(*) AS n_pairs,
         |       round(avg(exact), 6) AS mean_exact, round(avg(est), 6) AS mean_est,
         |       round(avg(abs(est - exact)), 6) AS mae
         |FROM ex GROUP BY bucket""".stripMargin,

    "q126_incremental_neardup" ->
      s"""WITH $minhashSigCtes
         |SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS corpus_doc
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bucket = b.bucket
         |WHERE a.doc_id % 10 = 9 AND b.doc_id % 10 <> 9""".stripMargin,

    // q136 answers q126's question through the MAINTAINED band index;
    // the twin is the same from-scratch recompute — proving via
    // SqlSurfaceSpec that a spark.sql recompute over raw parquet equals
    // the probe of the CDC-maintained stored index.
    "q136_maintained_neardup_probe" ->
      s"""WITH $minhashSigCtes
         |SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS corpus_doc
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bucket = b.bucket
         |WHERE a.doc_id % 10 = 9 AND b.doc_id % 10 <> 9""".stripMargin,

    "q98_bloom_decontaminate" ->
      raw"""WITH td AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |sh AS (SELECT DISTINCT doc_id, shingle FROM td
         |       LATERAL VIEW explode($shingleCase) t AS shingle),
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 19 = 0)
         |SELECT tr.doc_id, count(DISTINCT tr.shingle) AS n_matched
         |FROM sh tr JOIN ev USING (shingle)
         |WHERE tr.doc_id % 19 <> 0
         |GROUP BY tr.doc_id""".stripMargin,

    "q117_adaptive_quality_gate" ->
      raw"""WITH sc AS (
         |  SELECT doc_id, source,
         |    least(size(toks) / 100.0D, 1.0D)
         |      * (1.0D - size(filter(toks, x -> x IN ('the', 'a', 'of', 'and')))
         |          / size(toks)) AS quality_score
         |  FROM (SELECT doc_id, source, split(trim(text), '\\s+') AS toks
         |        FROM documents)),
         |th AS (SELECT source, percentile(quality_score, 0.25D) AS src_p25
         |       FROM sc GROUP BY source)
         |SELECT sc.doc_id, sc.source,
         |       round(sc.quality_score, 6) AS quality_score,
         |       round(th.src_p25, 6) AS src_p25,
         |       round(sc.quality_score, 6) >= round(th.src_p25, 6) AS keep
         |FROM sc JOIN th ON th.source = sc.source""".stripMargin,

    "q173_er_pairs_3pass" ->
      s"""WITH nm AS (
        |  SELECT p_name AS name,
        |         CASE WHEN instr(p_name, ' ') = 0 THEN p_name
        |              ELSE substr(p_name, 1, instr(p_name, ' ') - 1)
        |         END AS adj,
        |         CASE WHEN instr(p_name, ' ') = 0 THEN p_name
        |              ELSE substr(p_name, length(p_name) - instr(reverse(p_name), ' ') + 2)
        |         END AS noun,
        |         substr(regexp_replace(lower(p_name), '[aeiou ]', ''), 1, 4) AS skel
        |  FROM part GROUP BY p_name
        |),
        |blocks AS (
        |  SELECT name, 'adj' AS slot, adj AS key FROM nm
        |  UNION ALL
        |  SELECT name, 'noun' AS slot, noun AS key FROM nm
        |  UNION ALL
        |  SELECT name, 'skel' AS slot, skel AS key FROM nm
        |),
        |sized AS (
        |  SELECT slot, key FROM blocks GROUP BY slot, key
        |  HAVING count(*) <= ${graft.functions.EntityOps.MaxBlockSize}
        |),
        |cand AS (
        |  SELECT a.name AS name_a, b.name AS name_b,
        |         CAST(count(*) AS BIGINT) AS shared_blocks
        |  FROM blocks a
        |  JOIN sized s ON s.slot = a.slot AND s.key = a.key
        |  JOIN blocks b ON b.slot = a.slot AND b.key = a.key AND a.name < b.name
        |  GROUP BY a.name, b.name
        |)
        |SELECT name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev_dist,
        |       shared_blocks
        |FROM cand
        |WHERE levenshtein(name_a, name_b) <= ${graft.functions.EntityOps.MatchMaxDist}""".stripMargin,

    "q148_exact_substr_spans" -> exactSubstrTwin(8),

    // the maintained span family answers q148's / q150's questions over
    // the fixture's corpus/batch split — same twin texts, split rebased
    "q171_maintained_spans" -> exactSubstrTwin(8).replace("FROM documents",
      "FROM (SELECT * FROM documents WHERE doc_id % 10 <> 9) documents"),

    "q172_maintained_span_probe" ->
      // same CASE guard as exactSubstrTwin: Spark may project on
      // pre-filter parquet rows, where a short doc's descending
      // sequence feeds slice an illegal 0 start
      raw"""WITH t AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |hl AS (SELECT doc_id,
         |         CASE WHEN size(toks) >= 8
         |              THEN transform(sequence(1, size(toks) - 7),
         |                     i -> md5(concat_ws(' ', slice(toks, i, 8))))
         |              ELSE array() END AS hs
         |       FROM t WHERE size(toks) >= 8),
         |p AS (SELECT doc_id, p0 + 1 AS p, h
         |      FROM hl LATERAL VIEW posexplode(hs) t2 AS p0, h),
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
         |FROM g GROUP BY doc_id, gid""".stripMargin,
    "q152_exact_substr_spans16" -> exactSubstrTwin(16),

    "q149_exact_substr_savings" ->
      raw"""WITH t AS (SELECT doc_id, source,
         |             split(trim(text), '\\s+') AS toks FROM documents),
         |hl AS (SELECT doc_id, transform(sequence(1, size(toks) - 7),
         |         i -> md5(concat_ws(' ', slice(toks, i, 8)))) AS hs
         |       FROM t WHERE size(toks) >= 8),
         |p AS (SELECT doc_id, p0 + 1 AS p, h
         |      FROM hl LATERAL VIEW posexplode(hs) t2 AS p0, h),
         |d AS (SELECT h FROM p GROUP BY h HAVING count(*) >= 2),
         |dp AS (SELECT p.doc_id, p.p FROM p JOIN d USING (h)),
         |b AS (SELECT doc_id, p,
         |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 8
         |             THEN 1 ELSE 0 END AS brk
         |      FROM dp),
         |g AS (SELECT doc_id, p,
         |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM b),
         |sp AS (SELECT doc_id, max(p) + 8 - min(p) AS span_tokens
         |       FROM g GROUP BY doc_id, gid),
         |tot AS (SELECT source, CAST(sum(size(toks)) AS BIGINT) AS total_tokens
         |        FROM t GROUP BY source),
         |sav AS (SELECT t.source,
         |          CAST(count(DISTINCT sp.doc_id) AS BIGINT) AS docs_affected,
         |          CAST(sum(sp.span_tokens) AS BIGINT) AS removable_tokens
         |        FROM sp JOIN t ON sp.doc_id = t.doc_id
         |        GROUP BY t.source)
         |SELECT tot.source,
         |       coalesce(sav.docs_affected, 0L) AS docs_affected,
         |       tot.total_tokens,
         |       coalesce(sav.removable_tokens, 0L) AS removable_tokens,
         |       round(coalesce(sav.removable_tokens, 0L) / tot.total_tokens, 6)
         |         AS removable_ratio
         |FROM tot LEFT JOIN sav USING (source)""".stripMargin,

    "q150_eval_span_scrub" ->
      raw"""WITH t AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |hl AS (SELECT doc_id, transform(sequence(1, size(toks) - 7),
         |         i -> md5(concat_ws(' ', slice(toks, i, 8)))) AS hs
         |       FROM t WHERE size(toks) >= 8),
         |p AS (SELECT doc_id, p0 + 1 AS p, h
         |      FROM hl LATERAL VIEW posexplode(hs) t2 AS p0, h),
         |ev AS (SELECT DISTINCT h FROM p WHERE doc_id % 19 = 0),
         |dp AS (SELECT p.doc_id, p.p FROM p JOIN ev USING (h)
         |       WHERE p.doc_id % 19 <> 0),
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
         |FROM g GROUP BY doc_id, gid""".stripMargin,

    "q151_scrub_apply" ->
      raw"""WITH t AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |hl AS (SELECT doc_id, transform(sequence(1, size(toks) - 7),
         |         i -> md5(concat_ws(' ', slice(toks, i, 8)))) AS hs
         |       FROM t WHERE size(toks) >= 8),
         |p AS (SELECT doc_id, p0 + 1 AS p, h
         |      FROM hl LATERAL VIEW posexplode(hs) t2 AS p0, h),
         |ev AS (SELECT DISTINCT h FROM p WHERE doc_id % 19 = 0),
         |dp AS (SELECT p.doc_id, p.p FROM p JOIN ev USING (h)
         |       WHERE p.doc_id % 19 <> 0),
         |b AS (SELECT doc_id, p,
         |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 8
         |             THEN 1 ELSE 0 END AS brk
         |      FROM dp),
         |g AS (SELECT doc_id, p,
         |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM b),
         |q AS (SELECT doc_id, CAST(min(p) AS BIGINT) AS a,
         |             CAST(max(p) + 7 AS BIGINT) AS b
         |      FROM g GROUP BY doc_id, gid),
         |cl AS (SELECT doc_id, collect_list(named_struct('a', a, 'b', b)) AS cuts,
         |              count(*) AS n_cuts FROM q GROUP BY doc_id),
         |j AS (SELECT t.doc_id, t.toks, cl.cuts, coalesce(cl.n_cuts, 0L) AS n_cuts
         |      FROM t LEFT JOIN cl USING (doc_id) WHERE t.doc_id % 19 <> 0),
         |k AS (SELECT doc_id, n_cuts,
         |        filter(toks, (tk, i) -> NOT coalesce(
         |          exists(cuts, c -> i + 1 >= c.a AND i + 1 <= c.b), false)) AS kept
         |      FROM j)
         |SELECT doc_id, n_cuts,
         |       CAST(size(kept) AS BIGINT) AS kept_tokens,
         |       md5(concat_ws(' ', kept)) AS clean_md5
         |FROM k""".stripMargin,

    "q118_repeated_spans" ->
      raw"""WITH t AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |h AS (SELECT doc_id,
         |             transform(sequence(1, size(toks) - 7),
         |               i -> md5(concat_ws(' ', slice(toks, i, 8)))) AS hashes
         |      FROM t WHERE size(toks) >= 11),
         |w AS (SELECT doc_id, span_hash
         |      FROM h LATERAL VIEW explode(array_distinct(
         |        transform(sequence(1, size(hashes) - 3),
         |          j -> array_min(slice(hashes, j, 4))))) t2 AS span_hash),
         |df AS (SELECT span_hash, count(DISTINCT doc_id) AS span_df
         |       FROM w GROUP BY span_hash)
         |SELECT w.doc_id,
         |       count(*) AS n_spans,
         |       sum(CASE WHEN df.span_df >= 2 THEN 1L ELSE 0L END) AS n_shared_spans,
         |       round(sum(CASE WHEN df.span_df >= 2 THEN 1 ELSE 0 END) / count(*), 6)
         |         AS shared_ratio
         |FROM w JOIN df USING (span_hash)
         |GROUP BY w.doc_id""".stripMargin,

    "q123_audio_energy" ->
      """WITH a AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT a.doc_id, a.n_chars, g.i,
        |        CAST(((a.doc_id * 31 + g.i * 17) % 65536) - 32768 AS DOUBLE) AS v
        |      FROM a, (SELECT explode(sequence(0, 767)) AS i) g)
        |SELECT doc_id AS media_id,
        |  CAST(i div 256 AS BIGINT) AS window_idx,
        |  round(sqrt(avg(v * v)), 4) AS rms,
        |  CAST(max(CAST(abs(v) AS BIGINT)) AS BIGINT) AS peak,
        |  CAST(8000 + (n_chars % 8) * 1000 AS BIGINT) AS sample_rate,
        |  CAST(1536000 div (2 * (8000 + (n_chars % 8) * 1000)) AS BIGINT) AS duration_ms
        |FROM s GROUP BY doc_id, n_chars, i div 256""".stripMargin,

    "q127_png_pixels" ->
      """WITH im AS (SELECT doc_id, CAST(n_chars % 24 + 8 AS BIGINT) AS w,
        |                   CAST(n_chars % 16 + 8 AS BIGINT) AS h
        |            FROM documents WHERE doc_id % 3 = 0),
        |px AS (SELECT im.doc_id, im.w, im.h,
        |              CAST((im.doc_id * 7 + y.g * 13 + x.g * 31) % 256 AS BIGINT) AS v
        |       FROM im,
        |            (SELECT explode(sequence(0, 22)) AS g) y,
        |            (SELECT explode(sequence(0, 30)) AS g) x
        |       WHERE y.g < im.h AND x.g < im.w),
        |a AS (SELECT doc_id, w, h, CAST(sum(v) AS DOUBLE) AS s,
        |             CAST(sum(v * v) AS DOUBLE) AS ss, count(*) AS n
        |      FROM px GROUP BY doc_id, w, h)
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |  round(s / n, 4) AS mean_lum,
        |  round(ss / n - (s / n) * (s / n), 4) AS var_lum
        |FROM a""".stripMargin,

    "q163_jpeg_pixels" ->
      """WITH im AS (SELECT doc_id, CAST((n_chars % 3 + 2) * 8 AS BIGINT) AS w,
        |                   CAST((n_chars % 2 + 2) * 8 AS BIGINT) AS h
        |            FROM documents WHERE doc_id % 3 = 2),
        |bl AS (SELECT im.doc_id, im.w, im.h,
        |              CAST((im.doc_id * 7 + yy.g * 13 + xx.g * 31) % 256 AS BIGINT) AS v
        |       FROM im,
        |            (SELECT explode(sequence(0, 2)) AS g) yy,
        |            (SELECT explode(sequence(0, 3)) AS g) xx
        |       WHERE yy.g < im.h div 8 AND xx.g < im.w div 8),
        |a AS (SELECT doc_id, w, h, CAST(sum(v) * 64 AS DOUBLE) AS s,
        |             CAST(sum(v * v) * 64 AS DOUBLE) AS ss, count(*) * 64 AS n
        |      FROM bl GROUP BY doc_id, w, h)
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |  round(s / n, 4) AS mean_lum,
        |  round(ss / n - (s / n) * (s / n), 4) AS var_lum
        |FROM a""".stripMargin,

    "q164_cross_container_dups" ->
      """WITH im AS (SELECT doc_id, CAST((n_chars % 3 + 2) * 8 AS BIGINT) AS w,
        |                   CAST((n_chars % 2 + 2) * 8 AS BIGINT) AS h,
        |                   doc_id div 4 AS gid,
        |                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS container
        |            FROM documents),
        |px AS (SELECT im.doc_id, im.w, im.h, im.container, yy.g AS y, xx.g AS x,
        |              CAST((im.gid * 7 + (yy.g div 8) * 13 + (xx.g div 8) * 31) % 256
        |                   AS BIGINT) AS v
        |       FROM im,
        |            (SELECT explode(sequence(0, 23)) AS g) yy,
        |            (SELECT explode(sequence(0, 31)) AS g) xx
        |       WHERE yy.g < im.h AND xx.g < im.w),
        |fp AS (SELECT doc_id AS media_id, container, w, h,
        |              md5(concat(CAST(w AS STRING), 'x', CAST(h AS STRING), ':',
        |                  array_join(transform(array_sort(collect_list(struct(y, x, v))),
        |                                       s -> CAST(s.v AS STRING)), ','))) AS f
        |       FROM px GROUP BY doc_id, container, w, h)
        |SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
        |       a.container AS container_a, b.container AS container_b,
        |       a.w AS width, a.h AS height
        |FROM fp a JOIN fp b ON b.f = a.f AND a.media_id < b.media_id
        |WHERE a.container <> b.container""".stripMargin,

    "q165_video_frame_pixels" ->
      """WITH im AS (SELECT doc_id, CAST((n_chars % 3 + 2) * 8 AS BIGINT) AS w,
        |                   CAST((n_chars % 2 + 2) * 8 AS BIGINT) AS h,
        |                   CAST(n_chars % 5 + 2 AS BIGINT) AS k
        |            FROM documents WHERE doc_id % 3 = 2),
        |sf AS (SELECT im.doc_id, im.w, im.h, im.k, g.g AS i,
        |              ((2 * g.g) % 4) div 2 AS c
        |       FROM im, (SELECT explode(sequence(0, 2)) AS g) g
        |       WHERE g.g < (im.k + 1) div 2),
        |bl AS (SELECT sf.doc_id, sf.w, sf.h, sf.k, sf.i, sf.c,
        |              CAST((sf.doc_id * 7 + sf.c * 11 + yy.g * 13 + xx.g * 31) % 256
        |                   AS BIGINT) AS v
        |       FROM sf,
        |            (SELECT explode(sequence(0, 2)) AS g) yy,
        |            (SELECT explode(sequence(0, 3)) AS g) xx
        |       WHERE yy.g < sf.h div 8 AND xx.g < sf.w div 8),
        |a AS (SELECT doc_id, w, h, max(k) AS k,
        |             CAST(count(DISTINCT i) AS BIGINT) AS ns,
        |             CAST(count(DISTINCT c) AS BIGINT) AS nu,
        |             CAST(sum(v) * 64 AS DOUBLE) AS s,
        |             CAST(sum(v * v) * 64 AS DOUBLE) AS ss, count(*) * 64 AS n
        |      FROM bl GROUP BY doc_id, w, h)
        |SELECT doc_id AS media_id, k AS n_frames, ns AS n_sampled, nu AS n_unique,
        |       w AS width, h AS height,
        |       round(s / n, 4) AS mean_lum,
        |       round(ss / n - (s / n) * (s / n), 4) AS var_lum
        |FROM a""".stripMargin,

    "q166_color_pixels" ->
      """WITH im AS (SELECT doc_id, CAST((n_chars % 3 + 2) * 8 AS BIGINT) AS w,
        |                   CAST((n_chars % 2 + 2) * 8 AS BIGINT) AS h,
        |                   doc_id div 4 AS gid,
        |                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS container
        |            FROM documents),
        |bl AS (SELECT im.doc_id, im.w, im.h, im.container, cc.g AS c,
        |              CAST((im.gid * 7 + cc.g * 97 + yy.g * 13 + xx.g * 31) % 256
        |                   AS BIGINT) AS v
        |       FROM im,
        |            (SELECT explode(sequence(0, 2)) AS g) cc,
        |            (SELECT explode(sequence(0, 2)) AS g) yy,
        |            (SELECT explode(sequence(0, 3)) AS g) xx
        |       WHERE yy.g < im.h div 8 AND xx.g < im.w div 8),
        |a AS (SELECT doc_id, w, h, container, c, CAST(sum(v) * 64 AS DOUBLE) AS s,
        |             CAST(sum(v * v) * 64 AS DOUBLE) AS ss, count(*) * 64 AS n
        |      FROM bl GROUP BY doc_id, w, h, container, c),
        |m AS (SELECT doc_id, w, h, container, c, round(s / n, 4) AS mc,
        |             round(ss / n - (s / n) * (s / n), 4) AS vc FROM a)
        |SELECT doc_id AS media_id, container, w AS width, h AS height,
        |  max(CASE WHEN c = 0 THEN mc END) AS mean_r,
        |  max(CASE WHEN c = 1 THEN mc END) AS mean_g,
        |  max(CASE WHEN c = 2 THEN mc END) AS mean_b,
        |  max(CASE WHEN c = 0 THEN vc END) AS var_r,
        |  max(CASE WHEN c = 1 THEN vc END) AS var_g,
        |  max(CASE WHEN c = 2 THEN vc END) AS var_b
        |FROM m GROUP BY doc_id, container, w, h""".stripMargin,

    "q167_color_cross_dups" ->
      """WITH im AS (SELECT doc_id, CAST((n_chars % 3 + 2) * 8 AS BIGINT) AS w,
        |                   CAST((n_chars % 2 + 2) * 8 AS BIGINT) AS h,
        |                   doc_id div 4 AS gid,
        |                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS container
        |            FROM documents),
        |px AS (SELECT im.doc_id, im.w, im.h, im.container, yy.g AS y, xx.g AS x,
        |              cc.g AS c,
        |              CAST((im.gid * 7 + cc.g * 97 + (yy.g div 8) * 13 + (xx.g div 8) * 31)
        |                   % 256 AS BIGINT) AS v
        |       FROM im,
        |            (SELECT explode(sequence(0, 23)) AS g) yy,
        |            (SELECT explode(sequence(0, 31)) AS g) xx,
        |            (SELECT explode(sequence(0, 2)) AS g) cc
        |       WHERE yy.g < im.h AND xx.g < im.w),
        |fp AS (SELECT doc_id AS media_id, container, w, h,
        |              md5(concat(CAST(w AS STRING), 'x', CAST(h AS STRING), ':',
        |                  array_join(transform(array_sort(collect_list(struct(y, x, c, v))),
        |                                       s -> CAST(s.v AS STRING)), ','))) AS f
        |       FROM px GROUP BY doc_id, container, w, h)
        |SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
        |       a.container AS container_a, b.container AS container_b,
        |       a.w AS width, a.h AS height
        |FROM fp a JOIN fp b ON b.f = a.f AND a.media_id < b.media_id
        |WHERE a.container <> b.container""".stripMargin,

    "q174_jpeg420_pixels" -> jpeg420Twin,

    // q182: q174's recompute (mode-independent pixels) + the mode tag
    "q182_jpeg_mixed_pixels" -> jpeg420Twin.replace(
      "SELECT ya.doc_id AS media_id,",
      "SELECT ya.doc_id AS media_id,\n" +
        "  CASE ya.doc_id % 3 WHEN 0 THEN '444' WHEN 1 THEN '420' " +
        "ELSE '422' END AS mode,"),


    "q128_hybrid_rrf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |vsc AS (SELECT e.vec_id AS doc_id, ${cosine("q.qv", "e.v")} AS sim
         |        FROM e CROSS JOIN q WHERE e.vec_id <> 0),
         |vrank AS (SELECT doc_id,
         |            row_number() OVER (ORDER BY sim DESC, doc_id) AS vec_rank FROM vsc),
         |vtop AS (SELECT doc_id, CAST(vec_rank AS BIGINT) AS vec_rank
         |         FROM vrank WHERE vec_rank <= 50),
         |toksrc AS (SELECT doc_id,
         |             array_distinct(split(trim(text), '\\\\s+')) AS tk FROM documents),
         |toks AS (SELECT doc_id, tok FROM toksrc LATERAL VIEW explode(tk) t AS tok),
         |dfv AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
         |qt AS (SELECT t.tok, dfv.df FROM toks t JOIN dfv USING (tok) WHERE t.doc_id = 0),
         |ksc AS (SELECT t.doc_id, sum(1000000 div qt.df) AS kw_score
         |        FROM toks t JOIN qt USING (tok) WHERE t.doc_id <> 0 GROUP BY t.doc_id),
         |krank AS (SELECT doc_id,
         |            row_number() OVER (ORDER BY kw_score DESC, doc_id) AS kw_rank FROM ksc),
         |ktop AS (SELECT doc_id, CAST(kw_rank AS BIGINT) AS kw_rank
         |         FROM krank WHERE kw_rank <= 50),
         |fused AS (
         |  SELECT coalesce(v.doc_id, k.doc_id) AS doc_id, k.kw_rank, v.vec_rank,
         |         round(coalesce(CAST(1 AS DOUBLE) / (k.kw_rank + 60), 0D)
         |               + coalesce(CAST(1 AS DOUBLE) / (v.vec_rank + 60), 0D), 6) AS rrf
         |  FROM vtop v FULL OUTER JOIN ktop k ON v.doc_id = k.doc_id)
         |SELECT doc_id, kw_rank, vec_rank, rrf
         |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    "q129_incremental_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |corpus AS (SELECT * FROM e WHERE vec_id % 10 <> 9),
         |dims AS (SELECT label, vec_id, dim, x
         |         FROM corpus LATERAL VIEW posexplode(v) t AS dim, x),
         |cd AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY label, dim),
         |cent AS (SELECT CAST(label AS BIGINT) AS cell,
         |           transform(array_sort(collect_list(struct(dim, c))), p -> p.c) AS cv
         |         FROM cd GROUP BY label),
         |adist AS (
         |  SELECT c.vec_id, c.v, cent.cell,
         |         sqrt(greatest(${dot("c.v", "c.v")} - 2 * ${dot("c.v", "cent.cv")}
         |              + ${dot("cent.cv", "cent.cv")}, 0D)) AS dist
         |  FROM corpus c CROSS JOIN cent),
         |idx AS (SELECT vec_id, v, cell FROM (
         |    SELECT vec_id, v, cell,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS pr
         |    FROM adist) WHERE pr = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 10 = 9),
         |qdist AS (
         |  SELECT q_id, qv, cell,
         |         sqrt(greatest(${dot("qv", "qv")} - 2 * ${dot("qv", "cv")}
         |              + ${dot("cv", "cv")}, 0D)) AS dist
         |  FROM q CROSS JOIN cent),
         |probes AS (SELECT q_id, qv, cell FROM (
         |    SELECT q_id, qv, cell,
         |           row_number() OVER (PARTITION BY q_id ORDER BY dist, cell) AS pr
         |    FROM qdist) WHERE pr <= 2),
         |scored AS (
         |  SELECT p.q_id, i.vec_id, ${cosine("p.qv", "i.v")} AS sim
         |  FROM idx i JOIN probes p USING (cell)),
         |ranked AS (SELECT q_id, vec_id, sim,
         |                  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         |       round(sim, 6) AS sim
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q75_source_similarity" ->
      raw"""WITH td AS (SELECT source, split(trim(text), '\\s+') AS toks FROM documents),
         |shs AS (SELECT source, shingle FROM td
         |        LATERAL VIEW explode(CASE WHEN size(toks) < 3 THEN array()
         |          ELSE transform(sequence(1, size(toks) - 2),
         |               i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) END) t AS shingle),
         |h AS (SELECT source, md5(shingle) AS h FROM shs),
         |sig AS (SELECT source,
         |  min(substring(h, 1, 4)) h0, min(substring(h, 5, 4)) h1,
         |  min(substring(h, 9, 4)) h2, min(substring(h, 13, 4)) h3,
         |  min(substring(h, 17, 4)) h4, min(substring(h, 21, 4)) h5,
         |  min(substring(h, 25, 4)) h6, min(substring(h, 29, 4)) h7
         |  FROM h GROUP BY source),
         |m AS (SELECT a.source AS source_a, b.source AS source_b,
         |        CAST(a.h0 = b.h0 AS BIGINT) + CAST(a.h1 = b.h1 AS BIGINT)
         |        + CAST(a.h2 = b.h2 AS BIGINT) + CAST(a.h3 = b.h3 AS BIGINT)
         |        + CAST(a.h4 = b.h4 AS BIGINT) + CAST(a.h5 = b.h5 AS BIGINT)
         |        + CAST(a.h6 = b.h6 AS BIGINT) + CAST(a.h7 = b.h7 AS BIGINT) AS sig_matches
         |      FROM sig a JOIN sig b ON a.source < b.source)
         |SELECT source_a, source_b, sig_matches,
         |       round(sig_matches / 8.0D, 6) AS est_jaccard
         |FROM m""".stripMargin,

    "q77_surprisal" ->
      raw"""WITH td AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |tok AS (SELECT doc_id, token FROM td LATERAL VIEW explode(toks) t AS token),
         |uni AS (SELECT token, count(*) AS ctf FROM tok GROUP BY token),
         |n AS (SELECT count(*) AS ntot FROM tok)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(avg(-ln(ctf / ntot)), 6) AS surprisal
         |FROM tok JOIN uni USING (token) CROSS JOIN n
         |GROUP BY doc_id""".stripMargin,

    "q86_cross_source_dup" ->
      raw"""WITH p AS (SELECT DISTINCT source,
         |         md5(concat_ws(' ', slice(split(trim(text), '\\s+'), 1, 8))) AS fp
         |       FROM documents)
         |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
         |FROM p a JOIN p b ON a.fp = b.fp AND a.source < b.source
         |GROUP BY a.source, b.source""".stripMargin,

    "q87_zipf_slope" ->
      raw"""WITH td AS (SELECT lang, split(trim(text), '\\s+') AS toks FROM documents),
         |tok AS (SELECT lang, token FROM td LATERAL VIEW explode(toks) t AS token),
         |c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token),
         |r AS (SELECT lang, cnt,
         |        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
         |      FROM c)
         |SELECT lang, count(*) AS n_ranks,
         |       round(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6)
         |         AS zipf_slope
         |FROM r WHERE rnk <= 100 GROUP BY lang""".stripMargin,

    "q90_source_drift" ->
      raw"""WITH td AS (SELECT source, split(trim(text), '\\s+') AS toks
         |            FROM documents WHERE source IS NOT NULL),
         |tok AS (SELECT source, token FROM td LATERAL VIEW explode(toks) t AS token),
         |st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY source, token),
         |stot AS (SELECT source, sum(c) AS n FROM st GROUP BY source),
         |ct AS (SELECT token, sum(c) AS cc FROM st GROUP BY token),
         |ctot AS (SELECT sum(cc) AS nn FROM ct)
         |SELECT st.source, stot.n AS n_tokens,
         |       round(sum((st.c / stot.n) * ln((st.c / stot.n) / (ct.cc / ctot.nn))), 6)
         |         AS kl_vs_corpus
         |FROM st JOIN stot USING (source) JOIN ct USING (token) CROSS JOIN ctot
         |GROUP BY st.source, stot.n""".stripMargin,

    "q91_novelty" ->
      raw"""WITH td AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |sh AS (SELECT DISTINCT doc_id, substring(md5(shingle), 1, 16) AS h
         |       FROM td LATERAL VIEW explode(CASE WHEN size(toks) < 3 THEN array()
         |          ELSE transform(sequence(1, size(toks) - 2),
         |               i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) END) t AS shingle),
         |df AS (SELECT h, count(*) AS df FROM sh GROUP BY h)
         |SELECT doc_id, count(*) AS n_shingles,
         |       count(if(df >= 5, 1, NULL)) AS n_common,
         |       round(1.0D - count(if(df >= 5, 1, NULL)) / count(*), 6) AS novelty
         |FROM sh JOIN df USING (h) GROUP BY doc_id""".stripMargin,

    "q99_bigram_perplexity" ->
      raw"""WITH tokd AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |vocab AS (SELECT w FROM (
         |    SELECT tk AS w FROM tokd LATERAL VIEW explode(toks) t AS tk) u
         |  GROUP BY w ORDER BY count(*) DESC, w LIMIT 500),
         |bi AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2
         |       FROM (SELECT doc_id, toks FROM tokd WHERE size(toks) >= 2) f
         |       LATERAL VIEW explode(transform(sequence(1, size(toks) - 1),
         |         i -> named_struct('w1', toks[i-1], 'w2', toks[i]))) t AS p),
         |m AS (SELECT doc_id,
         |             CASE WHEN v1.w IS NULL THEN '<unk>' ELSE bi.w1 END AS u1,
         |             CASE WHEN v2.w IS NULL THEN '<unk>' ELSE bi.w2 END AS u2
         |      FROM bi LEFT JOIN vocab v1 ON bi.w1 = v1.w
         |               LEFT JOIN vocab v2 ON bi.w2 = v2.w),
         |c2 AS (SELECT u1, u2, count(*) AS c2 FROM m GROUP BY u1, u2),
         |c1 AS (SELECT u1, sum(c2) AS c1 FROM c2 GROUP BY u1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |       round(exp(avg(ln(CAST(c1 AS DOUBLE) / c2))), 6) AS ppl
         |FROM m JOIN c2 USING (u1, u2) JOIN c1 USING (u1)
         |GROUP BY doc_id""".stripMargin,

    "q111_gopher_rules" ->
      raw"""WITH t AS (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents),
         |m AS (SELECT doc_id,
         |        CAST(size(toks) AS BIGINT) AS n_tokens,
         |        aggregate(toks, 0L, (a, x) -> a + length(x)) AS sum_len,
         |        CAST(size(array_distinct(toks)) AS BIGINT) AS n_distinct,
         |        CAST(size(filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT)
         |          AS n_stop
         |      FROM t),
         |r AS (SELECT *, round(sum_len / n_tokens, 6) AS mean_word_len,
         |             round(n_distinct / n_tokens, 6) AS ttr
         |      FROM m),
         |r2 AS (SELECT *,
         |        CAST(n_tokens >= 5 AND n_tokens <= 10000 AS BIGINT) AS r_len,
         |        CAST(mean_word_len >= 3.0D AND mean_word_len <= 10.0D AS BIGINT) AS r_wordlen,
         |        CAST(ttr >= 0.3D AS BIGINT) AS r_ttr,
         |        CAST(n_stop >= 1 AS BIGINT) AS r_stop
         |      FROM r)
         |SELECT doc_id, n_tokens, mean_word_len, ttr, n_stop,
         |       r_len, r_wordlen, r_ttr, r_stop,
         |       CAST(r_len + r_wordlen + r_ttr + r_stop = 4 AS BIGINT) AS keep
         |FROM r2""".stripMargin,

    "q112_split_leakage" ->
      raw"""WITH f AS (SELECT doc_id,
         |         md5(concat_ws(' ', slice(split(trim(text), '\\s+'), 1, 8))) AS fp,
         |         CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)
         |           AS bucket
         |       FROM documents),
         |a AS (SELECT fp, CASE WHEN bucket < 52429 THEN 'train'
         |                     WHEN bucket < 58982 THEN 'val'
         |                     ELSE 'test' END AS split
         |      FROM f),
         |d AS (SELECT DISTINCT fp, split FROM a)
         |SELECT a.split AS split_a, b.split AS split_b, count(*) AS n_fingerprints
         |FROM d a JOIN d b ON a.fp = b.fp AND a.split < b.split
         |GROUP BY a.split, b.split""".stripMargin,

    "q114_quality_classifier" ->
      raw"""WITH f AS (SELECT doc_id, array_distinct(split(trim(text), '\\s+')) AS feats
         |       FROM documents),
         |m AS (SELECT doc_id,
         |        CAST(size(feats) AS BIGINT) AS n_feats,
         |        aggregate(feats, 0D, (a, x) ->
         |          a + ((CAST(conv(substring(md5(x), 1, 2), 16, 10) AS BIGINT) * 37 + 11) % 256
         |               - 127.5D) / 512D) AS logit_sum
         |      FROM f)
         |SELECT doc_id, n_feats,
         |       round(logit_sum / n_feats, 6) AS logit,
         |       round(1.0D / (1.0D + exp(-logit_sum / n_feats)), 6) AS score,
         |       CAST(round(1.0D / (1.0D + exp(-logit_sum / n_feats)), 6) >= 0.5D AS BIGINT)
         |         AS keep
         |FROM m""".stripMargin,

    "q124_bpe_pairs" ->
      raw"""WITH td AS (SELECT split(trim(text), '\\s+') AS toks FROM documents),
         |tok AS (SELECT w FROM td LATERAL VIEW explode(toks) t AS w),
         |wf AS (SELECT w, count(*) AS f FROM tok WHERE length(w) >= 2 GROUP BY w),
         |p AS (SELECT substr(w, i, 2) AS pair, f FROM wf
         |      LATERAL VIEW explode(sequence(1, length(w) - 1)) g AS i)
         |SELECT pair, sum(f) AS freq
         |FROM p GROUP BY pair ORDER BY freq DESC, pair LIMIT 50""".stripMargin,

    "q33_knn_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, e.vec_id, ${cosine("q.qv", "e.v")} AS sim
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, vec_id, sim,
         |                  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         |       round(sim, 6) AS sim
         |FROM ranked WHERE rank <= 5""".stripMargin,

    "q34_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $signBucket8 AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 50),
         |scored AS (
         |  SELECT q.q_id, b.vec_id, ${cosine("q.qv", "b.v")} AS sim
         |  FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, vec_id, sim,
         |                  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         |       round(sim, 6) AS sim
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q35_cosine_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $signBucket8 AS bucket FROM e)
         |SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |       round(${cosine("a.v", "c.v")}, 6) AS sim
         |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
         |WHERE ${cosine("a.v", "c.v")} >= 0.40D""".stripMargin,

    "q36_label_centroid" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |dims AS (SELECT label, vec_id, dim, x FROM e LATERAL VIEW posexplode(v) t AS dim, x),
         |cd AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY label, dim),
         |cent AS (SELECT label,
         |           transform(array_sort(collect_list(struct(dim, c))), p -> p.c) AS cv
         |         FROM cd GROUP BY label),
         |dist AS (
         |  SELECT e.label, e.vec_id,
         |         sqrt(greatest(${dot("e.v", "e.v")} - 2.0D * ${dot("e.v", "cent.cv")}
         |           + ${dot("cent.cv", "cent.cv")}, 0D)) AS dist
         |  FROM e JOIN cent ON e.label = cent.label)
         |SELECT label, count(1) AS n_vectors,
         |       round(avg(dist), 6) AS avg_dist_to_centroid,
         |       round(max(dist), 6) AS max_dist_to_centroid
         |FROM dist GROUP BY label""".stripMargin,

    "q46_ivf_ann" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |dims AS (SELECT label, vec_id, dim, x FROM e LATERAL VIEW posexplode(v) t AS dim, x),
         |cd AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY label, dim),
         |cent AS (SELECT label AS cell,
         |           transform(array_sort(collect_list(struct(dim, c))), p -> p.c) AS cv
         |         FROM cd GROUP BY label),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 50),
         |qdist AS (
         |  SELECT q_id, qv, cell,
         |         sqrt(greatest(${dot("qv", "qv")} - 2.0D * ${dot("qv", "cv")}
         |           + ${dot("cv", "cv")}, 0D)) AS dist
         |  FROM q CROSS JOIN cent),
         |probes AS (SELECT q_id, qv, cell FROM (
         |    SELECT q_id, qv, cell,
         |           row_number() OVER (PARTITION BY q_id ORDER BY dist, cell) AS pr
         |    FROM qdist) WHERE pr <= 2),
         |scored AS (
         |  SELECT p.q_id, e.vec_id, ${cosine("p.qv", "e.v")} AS sim
         |  FROM e JOIN probes p ON e.label = p.cell AND e.vec_id <> p.q_id),
         |ranked AS (SELECT q_id, vec_id, sim,
         |                  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
         |       round(sim, 6) AS sim
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q58_kmeans" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
         |a1 AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c0.cell,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             ${dot("e.v", "e.v")} - 2 * ${dot("e.v", "c0.cv")}
         |               + ${dot("c0.cv", "c0.cv")}, cell) AS rn
         |    FROM e CROSS JOIN c0) WHERE rn = 1),
         |dims AS (SELECT vec_id, dim, x FROM e LATERAL VIEW posexplode(v) t AS dim, x),
         |c1 AS (SELECT cell,
         |           transform(array_sort(collect_list(struct(dim, c))), p -> p.c) AS cv
         |       FROM (SELECT a1.cell, dims.dim, round(avg(dims.x), 6) AS c
         |             FROM dims JOIN a1 USING (vec_id)
         |             GROUP BY a1.cell, dims.dim) GROUP BY cell),
         |a2 AS (SELECT vec_id, cell, dist2 FROM (
         |    SELECT e.vec_id, c1.cell,
         |           ${dot("e.v", "e.v")} - 2 * ${dot("e.v", "c1.cv")}
         |             + ${dot("c1.cv", "c1.cv")} AS dist2,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             ${dot("e.v", "e.v")} - 2 * ${dot("e.v", "c1.cv")}
         |               + ${dot("c1.cv", "c1.cv")}, cell) AS rn
         |    FROM e CROSS JOIN c1) WHERE rn = 1)
         |SELECT cell, count(1) AS n_vectors,
         |       round(avg(sqrt(greatest(dist2, 0D))), 6) AS avg_dist
         |FROM a2 GROUP BY cell""".stripMargin,

    "q59_random_projection" -> {
      val cols = functions.VectorOps.projWeights.zipWithIndex.map { case (w, j) =>
        val arr = s"array(${w.map(x => s"${x}D").mkString(", ")})"
        s"round(${dot("v", arr)}, 6) AS r$j"
      }.mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings)
         |SELECT vec_id,
         |  $cols
         |FROM e""".stripMargin
    },

    "q82_int8_quant" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, array_max(transform(v, x -> abs(x))) AS maxabs FROM e)
        |SELECT vec_id, round(maxabs / 127.0D, 6) AS scale,
        |  CASE WHEN maxabs = 0D THEN 0.0D
        |       ELSE round(array_max(transform(v,
        |              x -> abs(x - round(x * 127.0D / maxabs) * maxabs / 127.0D))), 6)
        |  END AS max_abs_err
        |FROM m""".stripMargin,

    "q83_semdedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v, label FROM embeddings),
         |n AS (SELECT vec_id, label, v, sqrt(${dot("v", "v")}) AS nrm FROM e),
         |dup AS (SELECT DISTINCT b.vec_id
         |        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |        WHERE ${dot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.30D)
         |SELECT label, count(1) AS n_vectors,
         |       count(1) FILTER (WHERE d.vec_id IS NULL) AS n_kept
         |FROM n LEFT JOIN dup d ON n.vec_id = d.vec_id
         |GROUP BY label""".stripMargin,

    "q113_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v, label FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, e.vec_id, e.label, ${cosine("q.qv", "e.v")} AS sim
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id AND e.label <> q.q_label),
         |ranked AS (SELECT q_id, vec_id, label, sim,
         |                  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, vec_id AS neighbor_id, CAST(label AS BIGINT) AS neighbor_label,
         |       CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q130_image_ahash" ->
      s"""WITH $ahashSparkCtes
         |SELECT doc_id AS media_id, w AS width, h AS height,
         |  hi AS ahash_hi, lo AS ahash_lo, CAST(n AS INT) AS n_set
         |FROM hash""".stripMargin,

    "q131_image_neardup" ->
      s"""WITH $ahashSparkCtes,
         |$ahashBandCte,
         |$cappedBandCte
         |SELECT DISTINCT a.doc_id AS media_id_a, c.doc_id AS media_id_b,
         |  CAST(bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) AS INT) AS hamming
         |FROM kband a JOIN kband c ON a.b = c.b AND a.v = c.v
         |  AND a.doc_id < c.doc_id
         |WHERE bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3""".stripMargin,

    "q132_image_dedup_keep" ->
      s"""WITH $ahashSparkCtes,
         |$ahashBandCte,
         |$cappedBandCte,
         |removed AS (SELECT DISTINCT c.doc_id
         |            FROM kband a JOIN kband c ON a.b = c.b AND a.v = c.v
         |              AND a.doc_id < c.doc_id
         |            WHERE bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3)
         |SELECT h.doc_id AS media_id, h.hi AS ahash_hi, h.lo AS ahash_lo,
         |  r.doc_id IS NULL AS keep
         |FROM hash h LEFT JOIN removed r ON h.doc_id = r.doc_id""".stripMargin,

    "q133_audio_energy_gate" ->
      """WITH a AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT a.doc_id, g.i,
        |        CAST(((a.doc_id * 31 + g.i * 17) % 65536) - 32768 AS DOUBLE) AS v
        |      FROM a, (SELECT explode(sequence(0, 767)) AS i) g),
        |w AS (SELECT doc_id, i div 256 AS window_idx, round(sqrt(avg(v * v)), 4) AS rms
        |      FROM s GROUP BY doc_id, i div 256),
        |med AS (SELECT percentile(rms, 0.5D) AS med FROM w)
        |SELECT doc_id AS media_id,
        |  count(*) AS n_windows,
        |  sum(CASE WHEN rms >= med THEN 1L ELSE 0L END) AS n_active,
        |  round(max(rms), 4) AS peak_rms,
        |  sum(CASE WHEN rms >= med THEN 1 ELSE 0 END) >= 2 AS keep
        |FROM w CROSS JOIN med
        |GROUP BY doc_id""".stripMargin,

    "q168_audio_fingerprint" ->
      s"""WITH $audioFpSparkCtes
         |SELECT doc_id AS media_id, CAST(768 AS BIGINT) AS n_samples,
         |  hi AS fp_hi, lo AS fp_lo, n AS n_set
         |FROM hash""".stripMargin,

    "q169_audio_neardup" ->
      s"""WITH $audioFpSparkCtes,
         |$ahashBandCte,
         |$cappedBandCte
         |SELECT DISTINCT a.doc_id AS media_id_a, c.doc_id AS media_id_b,
         |  CAST(bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) AS INT) AS hamming
         |FROM kband a JOIN kband c ON a.b = c.b AND a.v = c.v
         |  AND a.doc_id < c.doc_id
         |WHERE bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3""".stripMargin,

    "q170_audio_dedup_keep" ->
      s"""WITH $audioFpSparkCtes,
         |$ahashBandCte,
         |$cappedBandCte,
         |removed AS (SELECT DISTINCT c.doc_id
         |            FROM kband a JOIN kband c ON a.b = c.b AND a.v = c.v
         |              AND a.doc_id < c.doc_id
         |            WHERE bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3)
         |SELECT h.doc_id AS media_id, h.hi AS fp_hi, h.lo AS fp_lo,
         |  r.doc_id IS NULL AS keep
         |FROM hash h LEFT JOIN removed r ON h.doc_id = r.doc_id""".stripMargin,

    "q175_audio_window_fp" ->
      s"""WITH $audioTrimSparkCtes
         |SELECT doc_id AS media_id, CAST(w AS BIGINT) AS w,
         |  CAST(23 AS BIGINT) AS n_windows, fp
         |FROM win""".stripMargin,

    "q176_audio_trimmed_dups" ->
      s"""WITH $audioTrimSparkCtes,
         |wen AS (SELECT doc_id, (i * 64) div 768 AS wi, sum(v * v) AS es,
         |               count(1) AS ec
         |        FROM s GROUP BY doc_id, (i * 64) div 768),
         |tot AS (SELECT doc_id, sum(es) AS ts, sum(ec) AS tc
         |        FROM wen GROUP BY doc_id),
         |bits AS (SELECT wen.doc_id, wi,
         |                CASE WHEN es * tc >= ts * ec THEN 1L ELSE 0L END AS b
         |         FROM wen JOIN tot ON wen.doc_id = tot.doc_id),
         |gfp AS (SELECT doc_id,
         |    sum(CASE WHEN wi >= 32 THEN b * shiftleft(1L, CAST(wi - 32 AS INT)) ELSE 0L END) AS hi,
         |    sum(CASE WHEN wi < 32 THEN b * shiftleft(1L, CAST(wi AS INT)) ELSE 0L END) AS lo
         |  FROM bits GROUP BY doc_id),
         |$cappedWinCte
         |SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
         |  count(1) AS n_shared,
         |  CAST(min(b.w - a.w) AS BIGINT) AS offset_w,
         |  count(DISTINCT b.w - a.w) AS n_offsets,
         |  CAST(bit_count(max(ga.hi) ^ max(gb.hi)) +
         |       bit_count(max(ga.lo) ^ max(gb.lo)) AS BIGINT) AS global_hamming
         |FROM kwin a JOIN kwin b ON b.fp = a.fp AND a.doc_id < b.doc_id
         |JOIN gfp ga ON ga.doc_id = a.doc_id
         |JOIN gfp gb ON gb.doc_id = b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(1) >= 4""".stripMargin,

    // q52: the ingest twin (VERDICT r15 stretch #8) — the one holdout
    // that was a TABLE FUNCTION, not dialect: Spark SQL reads the raw
    // JSON fixture through `text.`...`` and reproduces the whole
    // bronze→silver pipeline with from_json over literal schemas: the
    // envelope's food_entry captured as verbatim TEXT (the dict-or-list
    // quirk), normalized with a CASE wrap, re-parsed as array<struct>,
    // then the P2/P3 drops and F12 lenient 0-fills via try_cast.
    "q52_ingest_silver" ->
      s"""WITH raw AS (SELECT value AS json
         |             FROM text.`${graft.sources.IngestFixtures.root}/day=*/data.json`),
         |env AS (SELECT from_json(json,
         |          'food_entries STRUCT<food_entry: STRING>').food_entries.food_entry AS fe
         |        FROM raw),
         |payload AS (SELECT CASE WHEN substr(trim(fe), 1, 1) = '[' THEN trim(fe)
         |                        ELSE concat('[', trim(fe), ']') END AS arr
         |            FROM env WHERE fe IS NOT NULL),
         |parsed AS (SELECT from_json(arr, 'array<struct<food_entry_id: string, id: string, date_int: string, `timestamp`: string, meal: string, food_entry_name: string, food_entry_description: string, calories: string, carbohydrate: string, fat: string, protein: string, fiber: string, sugar: string, sodium: string, number_of_units: string>>') AS entries
         |           FROM payload),
         |ex AS (SELECT explode(entries) AS e FROM parsed WHERE entries IS NOT NULL),
         |typed AS (SELECT e.food_entry_id, e.id,
         |    try_cast(try_cast(e.date_int AS DOUBLE) AS INT) AS date_int,
         |    date_add(DATE '1970-01-01',
         |             try_cast(try_cast(e.date_int AS DOUBLE) AS INT)) AS date,
         |    try_cast(e.`timestamp` AS BIGINT) AS `timestamp`,
         |    e.meal, e.food_entry_name, e.food_entry_description,
         |    coalesce(try_cast(e.calories AS DOUBLE), 0.0D) AS calories,
         |    coalesce(try_cast(e.carbohydrate AS DOUBLE), 0.0D) AS carbohydrate,
         |    coalesce(try_cast(e.fat AS DOUBLE), 0.0D) AS fat,
         |    coalesce(try_cast(e.protein AS DOUBLE), 0.0D) AS protein,
         |    coalesce(try_cast(e.fiber AS DOUBLE), 0.0D) AS fiber,
         |    coalesce(try_cast(e.sugar AS DOUBLE), 0.0D) AS sugar,
         |    coalesce(try_cast(e.sodium AS DOUBLE), 0.0D) AS sodium,
         |    coalesce(try_cast(e.number_of_units AS DOUBLE), 0.0D) AS number_of_units
         |  FROM ex WHERE e.food_entry_id IS NOT NULL)
         |SELECT * FROM typed WHERE date_int IS NOT NULL""".stripMargin,

    "q178_maintained_modality_dups" ->
      s"""SELECT 'image' AS kind, media_id_a, media_id_b, hamming FROM (
         |WITH ${corpusSplit(ahashSparkCtes)},
         |$ahashBandCte,
         |$cappedBandCte
         |SELECT DISTINCT a.doc_id AS media_id_a, c.doc_id AS media_id_b,
         |  CAST(bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) AS INT) AS hamming
         |FROM kband a JOIN kband c ON a.b = c.b AND a.v = c.v
         |  AND a.doc_id < c.doc_id
         |WHERE bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3) i
         |UNION ALL
         |SELECT 'audio' AS kind, media_id_a, media_id_b, hamming FROM (
         |WITH ${corpusSplit(audioFpSparkCtes)},
         |$ahashBandCte,
         |$cappedBandCte
         |SELECT DISTINCT a.doc_id AS media_id_a, c.doc_id AS media_id_b,
         |  CAST(bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) AS INT) AS hamming
         |FROM kband a JOIN kband c ON a.b = c.b AND a.v = c.v
         |  AND a.doc_id < c.doc_id
         |WHERE bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3) u""".stripMargin,

    "q179_modality_probe" ->
      s"""SELECT * FROM (
         |WITH $ahashSparkCtes,
         |$ahashBandCte,
         |$corpusCappedBandCte
         |SELECT DISTINCT 'image' AS kind, a.doc_id AS media_id_probe,
         |  c.doc_id AS media_id_corpus,
         |  CAST(bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) AS INT) AS hamming
         |FROM band a JOIN cband c ON a.b = c.b AND a.v = c.v
         |WHERE a.doc_id % 10 = 9
         |  AND bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3) i
         |UNION ALL
         |SELECT * FROM (
         |WITH $audioFpSparkCtes,
         |$ahashBandCte,
         |$corpusCappedBandCte
         |SELECT DISTINCT 'audio' AS kind, a.doc_id AS media_id_probe,
         |  c.doc_id AS media_id_corpus,
         |  CAST(bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) AS INT) AS hamming
         |FROM band a JOIN cband c ON a.b = c.b AND a.v = c.v
         |WHERE a.doc_id % 10 = 9
         |  AND bit_count(a.hi ^ c.hi) + bit_count(a.lo ^ c.lo) <= 3) u""".stripMargin,

    "q183_maintained_trimmed_dups" ->
      s"""WITH ${corpusSplit(audioTrimSparkCtes)},
         |$cappedWinCte
         |SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
         |  count(1) AS n_shared,
         |  CAST(min(b.w - a.w) AS BIGINT) AS offset_w,
         |  count(DISTINCT b.w - a.w) AS n_offsets
         |FROM kwin a JOIN kwin b ON b.fp = a.fp AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(1) >= 4""".stripMargin,

    "q184_trim_probe" ->
      s"""WITH $audioTrimSparkCtes,
         |$corpusCappedWinCte
         |SELECT p.doc_id AS media_id_probe, c.doc_id AS media_id_corpus,
         |  count(1) AS n_shared,
         |  CAST(min(c.w - p.w) AS BIGINT) AS offset_w
         |FROM win p JOIN cwin c ON c.fp = p.fp
         |WHERE p.doc_id % 10 = 9
         |GROUP BY p.doc_id, c.doc_id
         |HAVING count(1) >= 4""".stripMargin,

    "q181_trimmed_dedup_keep" ->
      s"""WITH $audioTrimSparkCtes,
         |$cappedWinCte,
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db
         |          FROM kwin a JOIN kwin b ON b.fp = a.fp AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id HAVING count(1) >= 4),
         |removed AS (SELECT DISTINCT db AS doc_id FROM pairs)
         |SELECT a.doc_id AS media_id, r.doc_id IS NULL AS keep
         |FROM a LEFT JOIN removed r ON a.doc_id = r.doc_id""".stripMargin,

    "q180_video_scene_dups" -> videoSceneTwin,

    // q187: q180's recompute over the fixture's corpus split
    "q187_maintained_scene_dups" -> corpusSplit(videoSceneTwin),

    // q188: the cross-split scene join with the corpus-side hot-fp cap
    "q188_scene_probe" ->
      s"""WITH $sceneFpSparkCtes,
         |cfp AS (SELECT doc_id, f FROM (
         |    SELECT cf.*, count(1) OVER (PARTITION BY f) AS fdf
         |    FROM (SELECT * FROM fp WHERE doc_id % 10 <> 9) cf) fd
         |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
         |SELECT p.doc_id AS media_id_probe, c.doc_id AS media_id_corpus,
         |  count(DISTINCT p.f) AS n_shared_scenes
         |FROM fp p JOIN cfp c ON c.f = p.f
         |WHERE p.doc_id % 10 = 9
         |GROUP BY p.doc_id, c.doc_id""".stripMargin,

    // q185: q180's pairs (>= 2 shared scenes) + the greedy keeper
    "q185_video_dedup_keep" ->
      s"""WITH pairs AS (
         |$videoSceneTwin
         |),
         |removed AS (SELECT DISTINCT media_id_b AS doc_id FROM pairs
         |            WHERE n_shared_scenes >= 2)
         |SELECT im.doc_id AS media_id, r.doc_id IS NULL AS keep
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 2) im
         |LEFT JOIN removed r ON im.doc_id = r.doc_id""".stripMargin,


    // q186: the hot-band instrument — regular hashes via ahashSparkCtes,
    // the flat cohort's closed-form all-ones hash, band stats + the
    // capped join at the same demonstration cap as the DataFrame plan
    "q186_hot_band_report" ->
      s"""WITH $ahashSparkCtes,
         |flat AS (SELECT doc_id, CAST(4294967295 AS BIGINT) AS hi,
         |                CAST(4294967295 AS BIGINT) AS lo
         |         FROM documents WHERE doc_id % 15 = 1),
         |allh AS (SELECT doc_id, hi, lo FROM hash
         |         UNION ALL SELECT doc_id, hi, lo FROM flat),
         |band2 AS (SELECT doc_id, hi, lo, g.b,
         |    CASE g.b WHEN 0 THEN lo & 65535L
         |             WHEN 1 THEN shiftright(lo, 16) & 65535L
         |             WHEN 2 THEN hi & 65535L
         |             ELSE shiftright(hi, 16) & 65535L END AS v
         |  FROM allh, (SELECT explode(array(0, 1, 2, 3)) AS b) g),
         |bst AS (SELECT b, v, count(1) AS df FROM band2 GROUP BY b, v),
         |stat AS (SELECT b, count(1) AS n_bands, max(df) AS max_band_size,
         |       sum(CASE WHEN df > ${graft.multimodal.Multimodal.InstrumentBandCap}
         |                THEN 1L ELSE 0L END) AS n_hot_bands,
         |       sum(CASE WHEN df > ${graft.multimodal.Multimodal.InstrumentBandCap}
         |                THEN df ELSE 0L END) AS n_dropped_rows
         |  FROM bst GROUP BY b),
         |kept AS (SELECT band2.* FROM band2
         |         JOIN bst ON band2.b = bst.b AND band2.v = bst.v
         |         WHERE bst.df <= ${graft.multimodal.Multimodal.InstrumentBandCap}),
         |p AS (SELECT x.b AS b, count(1) AS n_candidate_pairs,
         |       sum(CASE WHEN bit_count(x.hi ^ y.hi) + bit_count(x.lo ^ y.lo) <= 3
         |                THEN 1L ELSE 0L END) AS n_dup_pairs
         |  FROM kept x JOIN kept y ON x.b = y.b AND x.v = y.v
         |    AND x.doc_id < y.doc_id
         |  GROUP BY x.b)
         |SELECT stat.b, n_bands, max_band_size, n_hot_bands, n_dropped_rows,
         |  coalesce(n_candidate_pairs, 0L) AS n_candidate_pairs,
         |  coalesce(n_dup_pairs, 0L) AS n_dup_pairs
         |FROM stat LEFT JOIN p ON p.b = stat.b""".stripMargin,

    // q189: re-encoded scene near-dup — pixel regen (nonlinear mix +
    // the re-encode member's +1), per-keyframe exact hash AND pixel-
    // level aHash, capped band join, per-pair aggregation with the
    // exact-blindness witness
    "q189_reencoded_scene_dups" -> reencodeTwin,

    // q191/q192: the maintained robust faces — the same from-scratch
    // recomputes over the fixture's corpus split (proving a spark.sql
    // recompute over raw parquet equals the CDC-maintained stored
    // index); q193/q194: the cross-split probe joins
    "q191_maintained_reencoded_dups" -> corpusSplit(reencodeTwin),
    "q192_maintained_gain_dups" -> corpusSplit(gainTwin),

    "q193_reencode_probe" ->
      s"""$reencodeBandTwinCte,
         |cband AS (SELECT doc_id, fp, hi, lo, b, v FROM (
         |    SELECT cb.*, count(1) OVER (PARTITION BY b, v) AS bdf
         |    FROM (SELECT * FROM band0 WHERE doc_id % 10 <> 9) cb) bd
         |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap}),
         |p AS (SELECT DISTINCT pr.doc_id AS dp, c.doc_id AS dc,
         |        pr.fp AS fpp, c.fp AS fpc,
         |        bit_count(pr.hi ^ c.hi) + bit_count(pr.lo ^ c.lo) AS hamming
         |      FROM band0 pr JOIN cband c ON pr.b = c.b AND pr.v = c.v
         |      WHERE pr.doc_id % 10 = 9
         |        AND bit_count(pr.hi ^ c.hi) + bit_count(pr.lo ^ c.lo) <= 3)
         |SELECT dp AS media_id_probe, dc AS media_id_corpus,
         |  count(DISTINCT fpp) AS n_similar_scenes,
         |  CAST(max(hamming) AS BIGINT) AS max_hamming
         |FROM p GROUP BY dp, dc""".stripMargin,

    "q194_gain_probe" ->
      s"""$gainWinTwinCte,
         |cwin AS (SELECT doc_id, w, sfp, efp FROM (
         |    SELECT cw.*, count(1) OVER (PARTITION BY sfp) AS fdf
         |    FROM (SELECT * FROM win WHERE doc_id % 10 <> 9) cw) wd
         |  WHERE fdf <= ${graft.multimodal.Multimodal.ExactFpCap})
         |SELECT p.doc_id AS media_id_probe, c.doc_id AS media_id_corpus,
         |  count(1) AS n_shared,
         |  sum(CASE WHEN p.efp = c.efp THEN 1L ELSE 0L END) AS n_exact_shared,
         |  CAST(min(c.w - p.w) AS BIGINT) AS offset_w
         |FROM win p JOIN cwin c ON c.sfp = p.sfp
         |WHERE p.doc_id % 10 = 9
         |GROUP BY p.doc_id, c.doc_id
         |HAVING count(1) >= 4""".stripMargin,

    "q190_gain_robust_dups" -> gainTwin,

    // q201: the robust key-space instrument — both families' Spark
    // prefixes (disjoint CTE name spaces), the same per-space aggregate
    "q201_robust_key_spaces" -> robustKeySpacesTwin,

    // q202: the same instrument read from the maintained tables; the
    // twin recomputes over the fixture's corpus split, the maintained ≡
    // recomputed claim in Spark dialect
    "q202_maintained_key_spaces" -> corpusSplit(robustKeySpacesTwin),

    "q177_scene_keyframes" ->
      """WITH im AS (SELECT doc_id, CAST((n_chars % 3 + 2) * 8 AS BIGINT) AS w,
        |                   CAST((n_chars % 2 + 2) * 8 AS BIGINT) AS h,
        |                   CAST(n_chars % 4 + 4 AS BIGINT) AS k
        |            FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT im.doc_id, im.w, im.h, im.k, g.g AS j,
        |              CASE WHEN g.g < 3 THEN 0 WHEN g.g = 3 THEN 1 ELSE 2 END AS c
        |       FROM im, (SELECT explode(sequence(0, 6)) AS g) g
        |       WHERE g.g < im.k),
        |bl AS (SELECT fr.doc_id, fr.k, fr.j, yy.g AS yb, xx.g AS xb,
        |              CAST((fr.doc_id * 7 + fr.c * 11 + yy.g * 13 + xx.g * 31) % 256
        |                   AS BIGINT) AS v
        |       FROM fr,
        |            (SELECT explode(sequence(0, 2)) AS g) yy,
        |            (SELECT explode(sequence(0, 3)) AS g) xx
        |       WHERE yy.g < fr.h div 8 AND xx.g < fr.w div 8),
        |d AS (SELECT doc_id, k, j,
        |             v - lag(v) OVER (PARTITION BY doc_id, yb, xb ORDER BY j) AS dv
        |      FROM bl),
        |f AS (SELECT doc_id, k, j,
        |             CAST(64 * count(CASE WHEN dv <> 0 THEN 1 END) AS BIGINT) AS n_changed,
        |             CAST(64 * coalesce(sum(dv * dv), 0) AS BIGINT) AS diff_energy
        |      FROM d GROUP BY doc_id, k, j),
        |mx AS (SELECT doc_id, max(n_changed) AS mc FROM f GROUP BY doc_id)
        |SELECT f.doc_id AS media_id, CAST(f.j AS BIGINT) AS frame_idx,
        |       f.k AS n_frames, f.n_changed, f.diff_energy,
        |       (f.j = 0 OR (f.n_changed > 0 AND 4 * f.n_changed >= mx.mc)) AS keyframe
        |FROM f JOIN mx ON mx.doc_id = f.doc_id""".stripMargin,
    "q12_calendar_densify" ->
      """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
        |cal AS (SELECT explode(sequence(lo, hi, interval 1 day)) AS day FROM bounds),
        |daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
        |                 count(*) AS n_events
        |          FROM events GROUP BY 1)
        |SELECT cal.day, daily.total_value, daily.n_events
        |FROM cal LEFT JOIN daily ON cal.day = daily.day""".stripMargin,

    "q14_weekly_summary" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
        |                      count(*) AS n_events
        |               FROM events GROUP BY 1)
        |SELECT CAST(extract(YEAROFWEEK FROM day) AS BIGINT) AS iso_year,
        |       CAST(weekofyear(day) AS BIGINT) AS iso_week,
        |       min(day) AS week_start,
        |       count(DISTINCT day) AS days_logged,
        |       round(sum(total_value), 2) AS total_value,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       round(round(sum(total_value), 2) / 7.0D, 6) AS avg_per_day_fixed7
        |FROM daily
        |GROUP BY 1, 2""".stripMargin,

    "q15_monthly_summary" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
        |                      count(*) AS n_events
        |               FROM events GROUP BY 1)
        |SELECT CAST(date_trunc('month', day) AS DATE) AS month_start,
        |       round(sum(total_value), 2) AS total_value,
        |       count(DISTINCT day) AS days_logged,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       date_format(CAST(date_trunc('month', day) AS DATE), 'MMM yyyy') AS month_label,
        |       round(round(sum(total_value), 2) / day(last_day(CAST(date_trunc('month', day) AS DATE))), 6) AS avg_per_month_day
        |FROM daily
        |GROUP BY 1""".stripMargin,

    "q18_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS epoch_day,
        |  date_add(DATE '1970-01-01', datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')) AS roundtrip_date,
        |  date_format(CAST(o_orderdate AS DATE), 'yyyy-MM-dd') AS fmt_iso,
        |  date_format(CAST(o_orderdate AS DATE), 'MMM yyyy') AS fmt_month_label,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(day(last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS days_in_month,
        |  date_sub(CAST(o_orderdate AS DATE), 6) AS week_ago,
        |  greatest(CAST(date_trunc('month', o_orderdate) AS DATE),
        |           date_sub(CAST(o_orderdate AS DATE), 6)) AS clamped_start,
        |  coalesce(CAST(NULL AS DOUBLE), 0.0D) AS lenient_zero,
        |  coalesce(CAST(o_totalprice AS DOUBLE), 0.0D) AS price_coerced
        |FROM orders""".stripMargin,

    "q19_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  count(CASE WHEN k > 50 THEN 1 END) AS n_high,
        |  round(avg(k), 6) AS avg_k
        |FROM (SELECT event_type, CAST(get_json_object(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,

    "q22_sessionize" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, value,
        |         CASE WHEN prev_ts IS NULL OR CAST(ts AS DOUBLE) - CAST(prev_ts AS DOUBLE) > 1800.0D
        |              THEN 1 ELSE 0 END AS is_new_session,
        |         ts
        |  FROM seq),
        |sessions AS (
        |  SELECT user_id, value,
        |         CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged),
        |per_session AS (
        |  SELECT user_id, session_id, count(*) AS n_events, sum(value) AS session_value
        |  FROM sessions GROUP BY 1, 2)
        |SELECT user_id, max(session_id) AS n_sessions,
        |       avg(n_events) AS avg_events_per_session,
        |       round(sum(session_value), 2) AS total_value
        |FROM per_session GROUP BY user_id""".stripMargin,

    "q25_doc_stats" ->
      raw"""SELECT lang, count(*) AS n_docs,
        |  CAST(sum(size(split(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
        |  avg(size(split(trim(text), '\\s+'))) AS avg_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  avg(length(text)) AS avg_text_len
        |FROM documents
        |GROUP BY lang""".stripMargin,

    "q26_quality_score" ->
      raw"""SELECT doc_id,
        |  CAST(size(toks) AS BIGINT) AS n_tokens,
        |  CAST(size(filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stopwords,
        |  size(filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) / size(toks) AS stopword_ratio,
        |  least(size(toks) / 100.0D, 1.0D)
        |    * (1.0D - size(filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) / size(toks)) AS quality_score
        |FROM (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents)""".stripMargin,

    "q29_fingerprint" ->
      raw"""SELECT doc_id,
        |  substring(md5(regexp_replace(lower(trim(text)), '\\s+', ' ')), 1, 16) AS fingerprint,
        |  source
        |FROM documents""".stripMargin,

    "q40_percentiles" ->
      """SELECT o_orderpriority,
        |  round(percentile(o_totalprice, 0.5D), 4) AS p50,
        |  round(percentile(o_totalprice, 0.9D), 4) AS p90,
        |  round(stddev(o_totalprice), 4) AS sd,
        |  round(var_samp(o_totalprice), 2) AS variance,
        |  round(corr(o_totalprice, o_custkey), 6) AS price_cust_corr,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q48_session_window" ->
      """WITH seq AS (
        |  SELECT user_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
        |         event_id
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN prev_ts IS NULL OR CAST(ts AS DOUBLE) - CAST(prev_ts AS DOUBLE) >= 1800.0D
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM seq),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |       count(*) AS n_events, sum(value) AS session_value
        |FROM sessions GROUP BY user_id, sid""".stripMargin,

    "q49_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS side, event_id AS click_id, value AS click_value,
        |         CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS DOUBLE) AS purchase_value
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 1, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |         event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last(click_id, true) OVER (PARTITION BY user_id
        |      ORDER BY ts, side, coalesce(click_id, purchase_id)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id,
        |    last(click_value, true) OVER (PARTITION BY user_id
        |      ORDER BY ts, side, coalesce(click_id, purchase_id)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_value
        |  FROM u)
        |SELECT user_id, purchase_id, purchase_value, asof_click_id, asof_click_value
        |FROM w WHERE side = 1""".stripMargin,

    "q55_hash_split" ->
      """SELECT doc_id, lang,
        |  CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) AS bucket,
        |  CASE WHEN CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) < 52429 THEN 'train'
        |       WHEN CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) < 58982 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "q61_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT f.cohort_day,
        |       CAST(datediff(act.day, f.cohort_day) AS BIGINT) AS day_offset,
        |       count(*) AS n_users
        |FROM act JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q63_grouping_sets" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS total_value,
        |                      count(*) AS n_events
        |               FROM events GROUP BY 1),
        |keyed AS (SELECT day, total_value, n_events,
        |                 CAST(extract(YEAROFWEEK FROM day) AS BIGINT) AS iso_year,
        |                 CAST(weekofyear(day) AS BIGINT) AS iso_week,
        |                 CAST(date_trunc('month', day) AS DATE) AS month_start
        |          FROM daily)
        |SELECT iso_year, iso_week, CAST(month_start AS STRING) AS month_start,
        |       round(sum(total_value), 2) AS total_value,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       count(DISTINCT day) AS days_logged,
        |       CASE WHEN month_start IS NULL THEN 'week' ELSE 'month' END AS level
        |FROM keyed
        |GROUP BY GROUPING SETS ((iso_year, iso_week), (month_start))""".stripMargin,

    "q64_pii_redaction" ->
      raw"""SELECT doc_id,
        |  CAST(size(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+')) AS BIGINT) AS n_emails,
        |  CAST(size(regexp_extract_all(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+', '<EMAIL>'),
        |                 '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>') AS redacted
        |FROM documents""".stripMargin,

    "q81_event_gaps" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         CAST(ts AS DOUBLE) - CAST(lag(ts) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS DOUBLE) AS gap_s
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |       round(avg(gap_s), 4) AS mean_gap_s,
        |       round(percentile(gap_s, 0.5D), 4) AS p50_gap_s,
        |       round(percentile(gap_s, 0.9D), 4) AS p90_gap_s
        |FROM seq WHERE gap_s IS NOT NULL
        |GROUP BY event_type""".stripMargin,

    // q139: like the DuckDB oracle, the twin pre-centers the products on
    // 6-snapped means (q143's c0 technique) instead of the
    // cancellation-prone moment identity, so its raw covariance agrees
    // with the Welford Aggregator's to ~1e-13 before the single round-at-6
    "q139_embedding_covariance" ->
      """WITH e AS (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
        |dims AS (SELECT explode(sequence(1, 64)) AS i),
        |mu AS (SELECT i, round(sum(element_at(v, i)) / count(*), 6) AS mu
        |       FROM e CROSS JOIN dims GROUP BY i),
        |d AS (SELECT a.i AS i, b.i AS j FROM dims a CROSS JOIN dims b WHERE a.i <= b.i)
        |SELECT CAST(d.i - 1 AS BIGINT) AS dim_i, CAST(d.j - 1 AS BIGINT) AS dim_j,
        |       round(sum((element_at(e.v, d.i) - mi.mu)
        |                 * (element_at(e.v, d.j) - mj.mu)) / count(*), 6) AS cov
        |FROM e CROSS JOIN d
        |JOIN mu mi ON mi.i = d.i JOIN mu mj ON mj.i = d.j
        |GROUP BY d.i, d.j""".stripMargin,

    // q143: the snapped-input power iteration reproduced in SQL — the
    // twin recomputes mu@6 / C@7 / w@6 exactly as the DataFrame path's
    // driver-side eigensolve does, so the projection agrees bit-for-bit
    // after the double-round.
    "q143_whiten_top_component" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
        |dims AS (SELECT explode(sequence(1, 64)) AS i),
        |mu AS (SELECT i, round(sum(element_at(v, i)) / count(*), 6) AS mu
        |       FROM e CROSS JOIN dims GROUP BY i),
        |d AS (SELECT a.i AS i, b.i AS j FROM dims a CROSS JOIN dims b WHERE a.i <= b.i),
        |c0 AS (SELECT d.i, d.j,
        |         round(sum((element_at(e.v, d.i) - mi.mu)
        |                   * (element_at(e.v, d.j) - mj.mu)) / count(*), 7) AS c
        |       FROM e CROSS JOIN d
        |       JOIN mu mi ON mi.i = d.i JOIN mu mj ON mj.i = d.j
        |       GROUP BY d.i, d.j),
        |cf AS (SELECT i, j, c FROM c0
        |       UNION ALL SELECT j AS i, i AS j, c FROM c0 WHERE i <> j),
        |v1 AS (SELECT i, sum(c) AS x FROM cf GROUP BY i),
        |v2 AS (SELECT cf.i, sum(cf.c * v1.x) AS x FROM cf JOIN v1 ON cf.j = v1.i GROUP BY cf.i),
        |v3 AS (SELECT cf.i AS i, sum(cf.c * v2.x) AS x
        |       FROM cf JOIN v2 ON cf.j = v2.i GROUP BY cf.i),
        |nv AS (SELECT sqrt(sum(x * x)) AS nrm FROM v3),
        |sg AS (SELECT CASE WHEN x < 0 THEN -1.0D ELSE 1.0D END AS sgn
        |       FROM v3 WHERE abs(x) > 1e-12 ORDER BY i LIMIT 1),
        |w AS (SELECT i, round(x / nrm * sgn, 6) AS w FROM v3 CROSS JOIN nv CROSS JOIN sg),
        |p AS (SELECT e.vec_id,
        |        sum((element_at(e.v, w.i) - mu.mu) * w.w) AS coef,
        |        sum((element_at(e.v, w.i) - mu.mu) * (element_at(e.v, w.i) - mu.mu)) AS ss
        |      FROM e CROSS JOIN w JOIN mu ON mu.i = w.i
        |      GROUP BY e.vec_id)
        |SELECT vec_id, round(coef, 6) AS top_coef,
        |       round(sqrt(greatest(0D, ss - coef * coef)), 6) AS resid_norm
        |FROM p""".stripMargin,

    // q147: the packed-array eigensolve twin (see whitenTopTwoTwin —
    // the oracle's MATERIALIZED ladder has no Spark spelling, so the
    // twin restructures to single-reference lateral-alias algebra)
    "q147_whiten_top_two" -> whitenTopTwoTwin,

    "q153_semantic_decon" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
        |ev AS (SELECT vec_id AS eval_id, v AS evv FROM e WHERE vec_id % 19 = 0),
        |tr AS (SELECT vec_id, v FROM e WHERE vec_id % 19 <> 0),
        |p AS (SELECT tr.vec_id, ev.eval_id, ${cosine("tr.v", "ev.evv")} AS sim
        |      FROM tr CROSS JOIN ev),
        |r AS (SELECT vec_id, eval_id, sim,
        |             row_number() OVER (PARTITION BY vec_id
        |                                ORDER BY sim DESC, eval_id) AS rk
        |      FROM p)
        |SELECT vec_id, CAST(eval_id AS BIGINT) AS nearest_eval_id,
        |       round(sim, 6) AS max_sim,
        |       round(sim, 6) >= 0.35D AS leaky
        |FROM r WHERE rk = 1""".stripMargin,

    "q140_matryoshka_fidelity" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
        |p AS (SELECT a.v AS va, b.v AS vb
        |      FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id WHERE a.vec_id % 2 = 0),
        |w AS (SELECT explode(array(8, 16, 32)) AS w),
        |x AS (SELECT w,
        |        ${cosine("va", "vb")} AS cf,
        |        ${cosine("slice(va, 1, w)", "slice(vb, 1, w)")} AS ct
        |      FROM p CROSS JOIN w)
        |SELECT CAST(w AS BIGINT) AS width, count(*) AS n_pairs,
        |       round(avg(abs(ct - cf)), 6) AS mean_abs_err,
        |       round(avg(ct), 6) AS mean_cos_trunc,
        |       round(avg(cf), 6) AS mean_cos_full
        |FROM x GROUP BY w""".stripMargin,

    "q93_dim_stats" ->
      """WITH e AS (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
        |d AS (SELECT explode(sequence(1, 64)) AS gs),
        |m AS (SELECT gs, sum(element_at(v, gs)) AS s, sum(element_at(v, gs) * element_at(v, gs)) AS q,
        |             min(element_at(v, gs)) AS mn, max(element_at(v, gs)) AS mx, count(*) AS n
        |      FROM e CROSS JOIN d GROUP BY gs)
        |SELECT CAST(gs - 1 AS BIGINT) AS dim, round(s/n, 6) AS mean,
        |       round(sqrt(greatest(q/n - (s/n)*(s/n), 0D)), 6) AS std,
        |       round(mn, 6) AS mn, round(mx, 6) AS mx
        |FROM m""".stripMargin,

    "q102_embedding_audit" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |                  sqrt(aggregate(CAST(embedding AS ARRAY<DOUBLE>), 0D,
        |                                 (acc, x) -> acc + x * x)) AS norm,
        |                  size(embedding) AS dim
        |           FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(min(dim) AS BIGINT) AS min_dim,
        |       CAST(max(dim) AS BIGINT) AS max_dim,
        |       CAST(sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |       round(avg(norm), 6) AS mean_norm,
        |       round(percentile(norm, 0.05D), 6) AS p05_norm,
        |       round(percentile(norm, 0.95D), 6) AS p95_norm
        |FROM e GROUP BY 1""".stripMargin,

    "q109_attribution" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    last(CASE WHEN event_type <> 'purchase' THEN event_type END, true)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ptype,
        |    last(CASE WHEN event_type <> 'purchase' THEN ts END, true)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pts
        |  FROM events),
        |p AS (SELECT CASE WHEN pts IS NOT NULL AND pts >= ts - INTERVAL 1 HOUR
        |                  THEN ptype ELSE 'direct' END AS touch_type
        |      FROM w WHERE event_type = 'purchase')
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_purchases,
        |       round(count(*) / sum(count(*)) OVER (), 6) AS share
        |FROM p GROUP BY 1""".stripMargin,

    "q110_media_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS container,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(n_chars % 1920 + 1 AS BIGINT)
        |                  WHEN 2 THEN CAST(n_chars % 1280 + 1 AS BIGINT) END AS width,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(n_chars % 1080 + 1 AS BIGINT)
        |                  WHEN 2 THEN CAST(n_chars % 720 + 1 AS BIGINT) END AS height,
        |  CASE doc_id % 3 WHEN 1
        |    THEN CAST(8000 + (n_chars % 8) * 1000 AS BIGINT) END AS sample_rate,
        |  CASE doc_id % 3 WHEN 1
        |    THEN CAST((octet_length(text) * 1000) div (2 * (8000 + (n_chars % 8) * 1000)) AS BIGINT)
        |  END AS duration_ms,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 57 WHEN 1 THEN 44 ELSE 23 END
        |       + octet_length(text) AS BIGINT) AS payload_len
        |FROM documents""".stripMargin,

    "q120_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  CAST(n_chars % 7 + 2 AS BIGINT) AS n_frames,
        |  CAST((n_chars % 7 + 3) div 2 AS BIGINT) AS n_kept,
        |  CAST(((n_chars % 7 + 3) div 2) * (23 + octet_length(text)) AS BIGINT) AS kept_len,
        |  CAST(n_chars % 1280 + 1 AS BIGINT) AS first_w,
        |  CAST(n_chars % 720 + 1 AS BIGINT) AS first_h,
        |  CAST((n_chars + 2 * ((n_chars % 7 + 1) div 2)) % 1280 + 1 AS BIGINT) AS last_w,
        |  CAST((n_chars + 2 * ((n_chars % 7 + 1) div 2)) % 720 + 1 AS BIGINT) AS last_h
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    "q27_lang_id" ->
      raw"""SELECT doc_id, lang,
        |  CAST(size(filter(toks, x -> x IN ('the', 'a', 'of'))) AS BIGINT) AS en_hits,
        |  CAST(size(filter(toks, x -> x IN ('der', 'die', 'und'))) AS BIGINT) AS de_hits,
        |  CAST(size(filter(toks, x -> x IN ('el', 'la', 'de'))) AS BIGINT) AS es_hits,
        |  CASE WHEN size(filter(toks, x -> x IN ('the', 'a', 'of'))) >= size(filter(toks, x -> x IN ('der', 'die', 'und')))
        |        AND size(filter(toks, x -> x IN ('the', 'a', 'of'))) >= size(filter(toks, x -> x IN ('el', 'la', 'de')))
        |       THEN 'en'
        |       WHEN size(filter(toks, x -> x IN ('der', 'die', 'und'))) >= size(filter(toks, x -> x IN ('el', 'la', 'de')))
        |       THEN 'de' ELSE 'es' END AS lang_guess
        |FROM (SELECT doc_id, lang, split(trim(text), '\\s+') AS toks FROM documents)""".stripMargin,

    "q47_bpe_tokens" ->
      raw"""SELECT doc_id, lang,
        |  CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(size(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0)) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  round(length(text) / size(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0)), 6) AS chars_per_bpe_token
        |FROM documents""".stripMargin,

    "q50_sliding_window" ->
      """WITH expanded AS (
        |  SELECT event_type, value,
        |         explode(sequence(
        |           date_trunc('hour', ts) - interval 45 minutes
        |             + CAST(floor(minute(ts) / 15) AS INT) * interval 15 minutes,
        |           date_trunc('hour', ts)
        |             + CAST(floor(minute(ts) / 15) AS INT) * interval 15 minutes,
        |           interval 15 minutes)) AS window_start
        |  FROM events)
        |SELECT window_start, event_type,
        |       count(*) AS n_events, round(sum(value), 6) AS total_value
        |FROM expanded
        |GROUP BY 1, 2""".stripMargin,

    "q56_repetition" ->
      raw"""WITH shs AS (SELECT doc_id,
        |  CASE WHEN size(toks) < 3 THEN array()
        |       ELSE transform(sequence(1, size(toks) - 2),
        |                      i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) END AS l
        |  FROM (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents))
        |SELECT doc_id,
        |  CAST(size(l) AS BIGINT) AS n_shingles,
        |  CAST(size(array_distinct(l)) AS BIGINT) AS n_distinct,
        |  CASE WHEN size(l) = 0 THEN 0.0D
        |       ELSE round(1.0D - size(array_distinct(l)) / size(l), 6) END AS repetition_ratio
        |FROM shs""".stripMargin,

    "q65_chunking" ->
      raw"""WITH tokd AS (SELECT doc_id, split(trim(text), '\\s+') AS toks
        |              FROM documents),
        |starts AS (SELECT doc_id, toks,
        |                  explode(sequence(1, greatest(size(toks) - 10, 1), 40)) AS i
        |           FROM tokd)
        |SELECT doc_id,
        |       CAST((i - 1) div 40 AS BIGINT) AS chunk_id,
        |       CAST(size(slice(toks, i, 50)) AS BIGINT) AS chunk_tokens,
        |       array_join(slice(toks, i, 50), ' ') AS chunk
        |FROM starts""".stripMargin,

    "q74_quality_sample" ->
      raw"""SELECT doc_id, quality_score, sample_u FROM (
        |  SELECT doc_id,
        |    least(size(toks) / 100.0D, 1.0D)
        |      * (1.0D - size(filter(toks, x -> x IN ('the', 'a', 'of', 'and')))
        |          / size(toks)) AS quality_score,
        |    CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)
        |      / 65536.0D AS sample_u
        |  FROM (SELECT doc_id, split(trim(text), '\\s+') AS toks
        |        FROM documents))
        |WHERE sample_u < quality_score""".stripMargin,

    "q105_weighted_sample" ->
      raw"""WITH t AS (SELECT doc_id,
        |             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        |             (CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)
        |              + 0.5D) / 65536.0D AS u
        |      FROM documents)
        |SELECT doc_id, n_tokens,
        |       round(log(u) / greatest(n_tokens, 1L), 8) AS es_key
        |FROM t
        |ORDER BY es_key DESC, doc_id
        |LIMIT 20""".stripMargin,

    "q89_corpus_mix" ->
      raw"""WITH t AS (SELECT source,
        |         CAST(sum(size(split(trim(text), '\\s+'))) AS BIGINT) AS toks
        |       FROM documents GROUP BY source),
        |o AS (SELECT source, toks,
        |             row_number() OVER (ORDER BY toks, source) AS i,
        |             count(*) OVER () AS s,
        |             sum(toks) OVER () AS total,
        |             coalesce(sum(toks) OVER (ORDER BY toks, source
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L)
        |               AS cum_before
        |      FROM t),
        |lv AS (SELECT *, (floor(0.5D * total) - cum_before) / (s - i + 1) AS lev FROM o),
        |sat AS (SELECT min_by(lev, i) AS level FROM lv WHERE toks > lev)
        |SELECT source, toks AS tokens_avail,
        |       round(least(CAST(toks AS DOUBLE), coalesce(level, CAST(toks AS DOUBLE))), 4)
        |         AS kept_tokens,
        |       round(least(CAST(toks AS DOUBLE), coalesce(level, CAST(toks AS DOUBLE)))
        |             / toks, 6) AS keep_frac
        |FROM lv CROSS JOIN sat""".stripMargin,

    "q96_temperature_mix" ->
      raw"""WITH t AS (SELECT source,
        |             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        |             CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) / 65536.0D AS u
        |           FROM documents),
        |s AS (SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        |      FROM t GROUP BY 1),
        |g AS (SELECT sum(sqrt(CAST(src_tokens AS DOUBLE))) AS sw,
        |             CAST(sum(src_tokens) AS DOUBLE) AS ntot FROM s),
        |r AS (SELECT source, n_docs, src_tokens,
        |             least(1.0D, sqrt(CAST(src_tokens AS DOUBLE)) / sw * (0.5D * ntot) / src_tokens) AS keep_rate
        |      FROM s CROSS JOIN g),
        |k AS (SELECT t.source, count(*) AS n_kept, CAST(sum(t.n_tokens) AS BIGINT) AS kept_tokens
        |      FROM t JOIN r USING (source) WHERE t.u < r.keep_rate GROUP BY 1)
        |SELECT r.source, r.n_docs, r.src_tokens, round(r.keep_rate, 6) AS keep_rate,
        |       coalesce(k.n_kept, 0L) AS n_kept, coalesce(k.kept_tokens, 0L) AS kept_tokens
        |FROM r LEFT JOIN k USING (source)""".stripMargin,

    "q30_minhash_lsh" ->
      raw"""WITH sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, explode(CASE WHEN size(toks) < 3 THEN array()
        |         ELSE transform(sequence(1, size(toks) - 2),
        |                        i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) END) AS shingle
        |  FROM (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents))),
        |hashed AS (SELECT doc_id, md5(shingle) AS h FROM sh),
        |sig AS (SELECT doc_id,
        |  min(substring(h, 1, 4)) h0, min(substring(h, 5, 4)) h1,
        |  min(substring(h, 9, 4)) h2, min(substring(h, 13, 4)) h3,
        |  min(substring(h, 17, 4)) h4, min(substring(h, 21, 4)) h5,
        |  min(substring(h, 25, 4)) h6, min(substring(h, 29, 4)) h7
        |  FROM hashed GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band, h0 || h1 AS bucket FROM sig
        |  UNION ALL SELECT doc_id, 1, h2 || h3 FROM sig
        |  UNION ALL SELECT doc_id, 2, h4 || h5 FROM sig
        |  UNION ALL SELECT doc_id, 3, h6 || h7 FROM sig)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin,

    "q57_top_tokens_per_lang" ->
      raw"""WITH c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
        |           FROM (SELECT lang, explode(split(trim(text), '\\s+')) AS tok
        |                 FROM documents)
        |           GROUP BY 1, 2),
        |r AS (SELECT lang, tok, n,
        |             row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rn
        |      FROM c)
        |SELECT lang, tok, n, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5""".stripMargin,

    "q67_contamination" ->
      raw"""WITH sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, explode(CASE WHEN size(toks) < 3 THEN array()
        |         ELSE transform(sequence(1, size(toks) - 2),
        |                        i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) END) AS shingle
        |  FROM (SELECT doc_id, split(trim(text), '\\s+') AS toks FROM documents)))
        |SELECT doc_id, count(DISTINCT shingle) AS n_benchmark_hits
        |FROM sh
        |WHERE shingle IN ('stream table hash', 'row column sort', 'window fast query', 'part filter scan', 'value spark vector')
        |GROUP BY doc_id""".stripMargin,

    "q68_token_budget" ->
      raw"""WITH t AS (SELECT doc_id,
        |                   CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        |                   md5(CAST(doc_id AS STRING)) AS h
        |            FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |               AS cum_tokens
        |      FROM t)
        |SELECT doc_id, n_tokens, cum_tokens
        |FROM c
        |WHERE cum_tokens * 5 <= (SELECT sum(n_tokens) FROM t)""".stripMargin,

    "q70_boilerplate_lines" ->
      """WITH p AS (SELECT doc_id, split(text, chr(10)) AS parts FROM documents),
        |l AS (SELECT doc_id, posexplode(parts) AS (pos, line) FROM p),
        |f AS (SELECT line, count(DISTINCT doc_id) AS docfreq FROM l GROUP BY 1)
        |SELECT l.doc_id,
        |       count(*) FILTER (WHERE docfreq = 1) AS n_kept,
        |       count(*) FILTER (WHERE docfreq > 1) AS n_dropped,
        |       coalesce(listagg(line, chr(10)) WITHIN GROUP (ORDER BY pos)
        |                  FILTER (WHERE docfreq = 1), '') AS clean_text
        |FROM l JOIN f USING (line)
        |GROUP BY l.doc_id""".stripMargin,

    "q71_sequence_pack" ->
      raw"""WITH t AS (SELECT doc_id,
        |                   CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        |                   md5(CAST(doc_id AS STRING)) AS h
        |            FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |             CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |               - n_tokens AS cum_before
        |      FROM t)
        |SELECT doc_id, n_tokens,
        |       CAST(cum_before div 256 AS BIGINT) AS seq_id,
        |       CAST(cum_before % 256 AS BIGINT) AS offset_in_seq
        |FROM c""".stripMargin,

    "q72_tfidf" ->
      raw"""WITH tok AS (SELECT doc_id, explode(split(trim(text), '\\s+')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf,
        |         round(tf.tf * log(n.n_docs / df.df_docs), 6) AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN n)
        |SELECT doc_id, token, tf, tfidf,
        |       CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                 ORDER BY tfidf DESC, token) AS rnk
        |      FROM scored)
        |WHERE rnk <= 3""".stripMargin,

    // q146: q72's formula with tf over the batch split and df/n over
    // the corpus split — the twin proves the spark.sql recompute equals
    // the maintained-DfIndex probe.
    "q146_maintained_tfidf" ->
      raw"""WITH tok AS (SELECT doc_id, explode(split(trim(text), '\\s+')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok WHERE doc_id % 10 = 9 GROUP BY 1, 2),
        |cdf AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
        |        FROM tok WHERE doc_id % 10 <> 9 GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % 10 <> 9),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf,
        |         round(tf.tf * log(n.n_docs / cdf.df_docs), 6) AS tfidf
        |  FROM tf JOIN cdf USING (token) CROSS JOIN n)
        |SELECT doc_id, token, tf, tfidf,
        |       CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                 ORDER BY tfidf DESC, token) AS rnk
        |      FROM scored)
        |WHERE rnk <= 3""".stripMargin,

    "q100_pagerank" -> pagerankTwin,

    // q54/q69/q88/q119 + maintained q137/q138: the component family on
    // the unrolled self-certifying propagation spine (see
    // componentTwinCtes) — the last recursion holdouts after q100
    "q54_neardup_components" -> componentsTwin,

    "q69_keeper_selection" -> keepersTwin,

    "q119_dedup_savings" ->
      s"""WITH $componentTwinCtes,
         |$tokdCte,
         |pc AS (SELECT c.lbl AS component_id, count(*) AS component_size,
         |              CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
         |              CAST(max(t.n_tokens) AS BIGINT) AS keeper_tokens
         |       FROM comp c JOIN tokd t ON t.doc_id = c.node
         |       GROUP BY c.lbl)
         |SELECT component_size,
         |       count(*) AS n_components,
         |       CAST(sum(component_size) AS BIGINT) AS n_docs,
         |       CAST(sum(total_tokens - keeper_tokens) AS BIGINT) AS removable_tokens
         |FROM pc GROUP BY component_size""".stripMargin,

    "q88_dedup_funnel" -> funnelTwin,

    "q137_maintained_components" -> corpusSplit(componentsTwin),

    "q138_maintained_keepers" -> corpusSplit(keepersTwin),

    // q155/q162: the ER family — same unrolled spine over the
    // levenshtein match graph (q155 labels numeric nids, q162 labels
    // the name strings, each its own oracle's label order)
    "q155_er_entities" ->
      s"""WITH ${erChain(
           "CAST(min(p_partkey) AS BIGINT) AS nid",
           """e0 AS (SELECT x.nid AS a, y.nid AS b
             |  FROM mtch m JOIN nm x ON x.name = m.name_a
             |  JOIN nm y ON y.name = m.name_b),
             |edges AS (SELECT a AS src, b AS dst FROM e0
             |          UNION ALL SELECT b, a FROM e0
             |          UNION ALL SELECT nid, nid FROM nm),
             |l0 AS (SELECT nid AS node, nid AS lbl FROM nm)""".stripMargin)},
         |labeled AS (SELECT n.name, c.lbl AS entity_id
         |            FROM nm n JOIN comp c ON c.node = n.nid),
         |canon AS (SELECT DISTINCT c.lbl AS entity_id, n.name AS canonical_name
         |          FROM comp c JOIN nm n ON n.nid = c.lbl)
         |SELECT l.entity_id, cn.canonical_name,
         |       CAST(count(DISTINCT p.p_name) AS BIGINT) AS n_name_variants,
         |       count(*) AS n_records,
         |       CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
         |       round(sum(p.p_retailprice), 2) AS total_price
         |FROM part p
         |JOIN labeled l ON l.name = p.p_name
         |JOIN canon cn ON cn.entity_id = l.entity_id
         |GROUP BY l.entity_id, cn.canonical_name""".stripMargin,

    "q162_maintained_entities" ->
      s"""WITH ${erChain(
           "CAST(count(*) AS BIGINT) AS n_records",
           """edges AS (SELECT name_a AS src, name_b AS dst FROM mtch
             |          UNION ALL SELECT name_b, name_a FROM mtch
             |          UNION ALL SELECT name, name FROM nm),
             |l0 AS (SELECT name AS node, name AS lbl FROM nm)""".stripMargin)}
         |SELECT c.lbl AS entity, CAST(count(*) AS BIGINT) AS n_names,
         |       CAST(sum(n.n_records) AS BIGINT) AS n_records
         |FROM comp c JOIN nm n ON n.name = c.node
         |GROUP BY c.lbl""".stripMargin,

    // q199: split leakage — the Spark candidate spine with both q55
    // splits stamped inline on the pair rows (no corpus join); q200:
    // the same report over the maintained fixture's corpus split
    "q199_split_leakage" -> splitLeakageTwin,

    "q200_maintained_split_leakage" -> corpusSplit(splitLeakageTwin),

    // q103's oracle is non-recursive but rides the DuckDB-only shared
    // prefix (list-comprehension shingles); the twin is the same
    // ordered-wedge join over the Spark candidate spine.
    "q103_triangles" ->
      s"""WITH $candCte,
         |deg AS (SELECT node, count(*) AS deg FROM (
         |          SELECT doc_a AS node FROM cand
         |          UNION ALL SELECT doc_b FROM cand) GROUP BY 1),
         |tri AS (SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
         |        FROM cand ab
         |        JOIN cand bc ON ab.doc_b = bc.doc_a
         |        JOIN cand ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
         |tpn AS (SELECT node, count(*) AS n_tri FROM (
         |          SELECT a AS node FROM tri
         |          UNION ALL SELECT b FROM tri
         |          UNION ALL SELECT c FROM tri) GROUP BY 1)
         |SELECT deg.node AS doc_id, deg.deg,
         |       COALESCE(tpn.n_tri, 0L) AS n_tri,
         |       CASE WHEN deg.deg >= 2
         |            THEN round(COALESCE(tpn.n_tri, 0L) * 2.0D / (deg.deg * (deg.deg - 1)), 6)
         |            ELSE 0.0D END AS lcc
         |FROM deg LEFT JOIN tpn USING (node)""".stripMargin,

    // q195/q196: the cross-modal family — one signature chain feeds
    // BOTH the caption candidates and the h0 image seed, then the
    // seed-keyed pixel/aHash chain, the capped band join, the
    // full-outer classification (q195) and the per-doc keeper decision
    // (q196)
    "q195_crossmodal_pairs" ->
      s"$crossmodalTwinCtes\n$crossmodalTwinRelSelect",

    // q197: the maintained cross-modal report — the same from-scratch
    // recompute over the fixture's corpus split; q198: the cross-split
    // probe with the image-side cap on the corpus split only
    "q197_maintained_crossmodal" ->
      corpusSplit(s"$crossmodalTwinCtes\n$crossmodalTwinRelSelect"),

    "q198_crossmodal_probe" ->
      s"""$crossmodalTwinCtes,
         |cband AS (SELECT doc_id, hi, lo, b, v FROM (
         |    SELECT cb.*, count(1) OVER (PARTITION BY b, v) AS bdf
         |    FROM (SELECT * FROM band0 WHERE doc_id % 10 <> 9) cb) bd
         |  WHERE bdf <= ${graft.multimodal.Multimodal.ModalityBandCap}),
         |pimg AS (SELECT DISTINCT pr.doc_id AS doc_probe, c.doc_id AS doc_corpus
         |         FROM band0 pr JOIN cband c ON pr.b = c.b AND pr.v = c.v
         |         WHERE pr.doc_id % 10 = 9
         |           AND bit_count(pr.hi ^ c.hi) + bit_count(pr.lo ^ c.lo) <= 3),
         |pcap AS (SELECT DISTINCT a.doc_id AS doc_probe, b.doc_id AS doc_corpus
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bucket = b.bucket
         |         WHERE a.doc_id % 10 = 9 AND b.doc_id % 10 <> 9
         |           AND a.doc_id % 3 = 0 AND b.doc_id % 3 = 0)
         |SELECT COALESCE(i.doc_probe, c.doc_probe) AS doc_probe,
         |       COALESCE(i.doc_corpus, c.doc_corpus) AS doc_corpus,
         |       i.doc_probe IS NOT NULL AS image_dup,
         |       c.doc_probe IS NOT NULL AS caption_dup,
         |       CASE WHEN i.doc_probe IS NOT NULL AND c.doc_probe IS NOT NULL
         |              THEN 'dup_pair'
         |            WHEN i.doc_probe IS NOT NULL THEN 'recaptioned'
         |            ELSE 'reillustrated' END AS relation
         |FROM pimg i FULL OUTER JOIN pcap c
         |  ON c.doc_probe = i.doc_probe AND c.doc_corpus = i.doc_corpus""".stripMargin,

    "q196_crossmodal_keep" ->
      s"""$crossmodalTwinCtes,
         |rel AS ($crossmodalTwinRelSelect),
         |u AS (SELECT doc_a AS doc_id, relation, 0 AS is_b FROM rel
         |      UNION ALL SELECT doc_b, relation, 1 FROM rel),
         |agg AS (SELECT doc_id,
         |  sum(CASE WHEN relation = 'dup_pair' THEN 1L ELSE 0L END) AS n_dup,
         |  sum(CASE WHEN relation = 'recaptioned' THEN 1L ELSE 0L END) AS n_recaptioned,
         |  sum(CASE WHEN relation = 'reillustrated' THEN 1L ELSE 0L END) AS n_reillustrated,
         |  max(CASE WHEN is_b = 1 AND relation = 'dup_pair' THEN 1 ELSE 0 END) AS removed
         |  FROM u GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(a.n_dup, 0L) AS n_dup,
         |  COALESCE(a.n_recaptioned, 0L) AS n_recaptioned,
         |  COALESCE(a.n_reillustrated, 0L) AS n_reillustrated,
         |  COALESCE(a.removed, 0) = 0 AS keep
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
         |LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,

    "q97_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
        |contrib AS (
        |  SELECT DISTINCT user_id, window_day FROM (
        |    SELECT user_id,
        |           explode(sequence(day, date_add(day, 6), interval 1 day)) AS window_day
        |    FROM ud))
        |SELECT window_day, count(*) AS rolling_7d_users
        |FROM contrib, span
        |WHERE window_day BETWEEN lo AND hi
        |GROUP BY 1""".stripMargin)

  /** q144/q145 answer q139/q143's questions from the MAINTAINED stats
    * table; their twins are the same from-scratch recomputes — proving
    * via SqlSurfaceSpec that a spark.sql recompute over raw parquet
    * equals the incrementally-maintained path (including the v3→v4
    * retraction the fixture injects). */
  val texts: Map[String, String] = base ++ Map(
    "q144_maintained_covariance" -> base("q139_embedding_covariance"),
    "q145_maintained_whitening" -> base("q143_whiten_top_component"))
}
