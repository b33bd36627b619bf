package graft.oracles

/** Assembly of the complete DuckDB oracle map: the three base maps
  * plus the spliced composites — exactly the map SparkEntry exposed
  * before the round-11 split. SparkEntry.oracleSql delegates here;
  * the public contract (keys, SQL text) is unchanged.
  */
object Oracles {
  import OracleCtes._

  /** Corpora (sf-dir basenames) on which each approximate operator's
    * exact-twin oracle premise is MEASURED to hold. The q31/q32,
    * q38/q39, q40/q41/q81 gates assert approximate == exact verbatim —
    * an equality that is a measured fact of (corpus, seed, parameters),
    * not a law: the minhash banding (min qualifying jaccard 0.875),
    * the IVF probe, and (since round 13) the scale-parametric
    * auto-banded hyperplane LSH (lshBandsForRecall derives the band
    * count from the corpus size; measured 66/66, 59/59, 920/920 —
    * DevLshBands) are measured total on all three testdata corpora.
    * Verify emits
    * these oracles only when its sf dir is in the query's measured set
    * and omits them elsewhere, so pointing the gate at an unmeasured
    * corpus records the honest weaker rows-check instead of converting
    * a probabilistic recall property into a spurious hash failure
    * (round-6 ADVICE). Queries absent from this map are
    * corpus-unconditional.
    */
  val measuredOn: Map[String, Set[String]] = Map(
    "q32_minhash_lsh" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q190_ivfadc" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q196_ivfadc_probe" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q236_ann_delete_probe" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q197_ann_join" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q201_pq_reconstruction" -> Set("sf0.001", "sf0.01", "sf0.1"),
    // q247's dense side is the q81 IVF probe — same recall premise,
    // same pin
    "q247_hybrid_probe" -> Set("sf0.001", "sf0.01", "sf0.1"),
    // q253 is deliberately UNPINNED: its dense side runs at full probe
    // width, where probe ≡ exact scan structurally (the q243
    // broad-full discipline) — measured necessity: at nProbe=4 the
    // isotropic corpora give total recall only for the q81 query id
    // (queries 1/2 read 5-9/10; no id in 0..39 but 0 is total on all
    // three sfs), so a partial-width q253 would pin a premise that
    // holds for one of its three queries
    // q39 left unpinned since the pruning-power switch: at its 0.4
    // threshold the operator routes to the exact verify on any corpus
    // within MaxExactPairs (recall structurally total) and REFUSES
    // loudly above it — there is no corpus where the oracle premise
    // silently degrades (embedNearDupLsh scaladoc)
    "q41_ivf_topk" -> Set("sf0.001", "sf0.01", "sf0.1"),
    "q81_ivf_probe" -> Set("sf0.001", "sf0.01", "sf0.1"))

  /** The q172 composite joins five per-instrument oracle blocks — each
    * spliced VERBATIM from the map entry of the operator it reuses
    * (nested-WITH subqueries), so the composite cannot drift from the
    * parts it claims to compose.
    */
  /** Shared CTE chain of the multi-query probes (q252/q253): q168's
    * tokenize → dl/tot → union-term tf → dft, plus the VALUES
    * query-term table `qt` (one literal per (query_id, term), the
    * registry fixture verbatim) and the per-(query, doc, term) scored
    * rows `sc` on the identical pinned arithmetic.
    */
  private val multiQueryBm25Cte: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, token FROM (
      |    SELECT doc_id, unnest(w) AS token FROM toks)
      |  WHERE token <> ''),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      |tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
      |qt AS (SELECT * FROM (VALUES
      |  (0, 'spark'), (0, 'vector'), (0, 'merge'),
      |  (1, 'hash'), (1, 'join'), (1, 'stream'),
      |  (2, 'window'), (2, 'sort')) AS t(query_id, token)),
      |tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM tok
      |  WHERE token IN (SELECT DISTINCT token FROM qt) GROUP BY 1, 2),
      |dft AS (SELECT token, COUNT(*) AS dft FROM tf GROUP BY token),
      |sc AS (
      |  SELECT q.query_id, t.doc_id,
      |    CAST(round(
      |      ln((CAST(n_docs AS DOUBLE) - dft + 0.5)
      |          / (CAST(dft AS DOUBLE) + 0.5) + 1.0)
      |      * (CAST(tf AS DOUBLE) / (CAST(tf AS DOUBLE)
      |          + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
      |            / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
      |      12) AS DECIMAL(28,12)) AS ts
      |  FROM tf t JOIN qt q USING (token) JOIN dft USING (token)
      |  JOIN dl USING (doc_id)
      |  CROSS JOIN tot)""".stripMargin

  def all: Map[String, String] = {
    val base = OraclesA.map ++ OraclesB.map ++ OraclesC.map
    def block(q: String) = s"(SELECT * FROM (\n${base(q)}\n))"
    // q242's SQL is bound once and mapped under BOTH keys: q247 (the
    // persisted-index hybrid) must reproduce the inline fusion exactly
    // — BM25 probe ≡ inline scorer structurally, IVF probe ≡ exact
    // scan on the measured corpora (the q81 premise, hence q247's
    // measuredOn pin) — so the oracle applies verbatim
    val hybridRrfSql =
      s"""WITH bm AS ${block("q168_bm25")},
        |dn AS ${block("q40_cosine_topk")},
        |lr AS (
        |  SELECT doc_id AS id, row_number()
        |    OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        |  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10)),
        |dr AS (
        |  SELECT vec_id AS id, row_number()
        |    OVER (ORDER BY cos_sim DESC, vec_id) AS dense_rank
        |  FROM (SELECT * FROM dn ORDER BY cos_sim DESC, vec_id LIMIT 10))
        |SELECT COALESCE(lr.id, dr.id) AS id, lex_rank, dense_rank,
        |  round(COALESCE(CAST(1 AS DOUBLE) / (60 + lex_rank), 0)
        |    + COALESCE(CAST(1 AS DOUBLE) / (60 + dense_rank), 0), 9)
        |    AS rrf
        |FROM lr FULL OUTER JOIN dr ON lr.id = dr.id
        |ORDER BY rrf DESC, id LIMIT 10""".stripMargin
    base + ("q247_hybrid_probe" -> hybridRrfSql) +
    ("q172_instrument_profile" ->
      s"""WITH sh AS ${block("q114_sharpe")},
        |rv AS ${block("q163_range_volatility")},
        |hu AS ${block("q164_hurst")},
        |lb AS ${block("q170_ljung_box")},
        |dd AS ${block("q84_max_drawdown")}
        |SELECT event_type, n_ticks, sh.n_returns AS n_returns, mean_return,
        |  sharpe, n_bars, parkinson, garman_klass, rogers_satchell, hurst,
        |  q_stat, max_drawdown
        |FROM sh JOIN rv USING (event_type) JOIN hu USING (event_type)
        |JOIN lb USING (event_type) JOIN dd USING (event_type)
        |ORDER BY event_type""".stripMargin) +
    // q242: reciprocal-rank fusion of the q168 BM25 list and the q40
    // dense list, both blocks spliced VERBATIM (the q172 discipline).
    // Each side is cut to its top-10 under its own total order
    // (score desc, id asc) and ranked by the SAME order; the fused
    // score sums the two 1/(60+rank) terms in one pinned operand
    // order (lexical + dense) as exact-integer double divisions, so
    // the doubles agree bit-for-bit; ids on one list only coalesce
    // the missing term to 0 (RRF union semantics)
    ("q242_hybrid_rrf" -> hybridRrfSql) +
    // q246: the persisted-index BM25 probe must reproduce the inline
    // scorer exactly (shared bm25Score, same pinned arithmetic), so
    // q168's oracle applies VERBATIM — the gate additionally proves
    // the bucket-pruned tf scan + summed df/totals partials return
    // the very statistics the full tokenize recomputes
    ("q246_bm25_probe" -> OraclesB.map("q168_bm25")) +
    // q252/q253: the multi-query (JOIN) probes. ONE set of query-term
    // literals feeds both SQL texts and mirrors the registry fixture
    // verbatim (the langScoreSelectSql discipline). q252 extends
    // q168's BM25 chain with a VALUES query-term table — same
    // tokenization, same pinned 12-dp/decimal/6-dp arithmetic, scores
    // grouped by (query_id, doc_id); query 0 repeats q246's terms so
    // its block is q168's result re-keyed. q253 is the per-query RRF
    // fusion of that multi-query BM25 against per-query exact cosine
    // (the q242 splice PARTITIONED BY query_id; the dense exact-twin
    // is structural — the registry runs the probe at full width, see
    // the measuredOn note).
    ("q252_bm25_probe_join" ->
      s"""WITH $multiQueryBm25Cte
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |  COUNT(*) AS n_matched,
        |  round(CAST(SUM(ts) AS DOUBLE), 6) AS bm25
        |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) +
    ("q253_hybrid_probe_join" ->
      s"""WITH $multiQueryBm25Cte,
        |bm AS (
        |  SELECT query_id, doc_id, round(CAST(SUM(ts) AS DOUBLE), 6) AS bm25
        |  FROM sc GROUP BY 1, 2),
        |qe AS (
        |  SELECT q.query_id,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM (SELECT DISTINCT query_id FROM qt) q
        |  JOIN embeddings e ON e.vec_id = q.query_id),
        |c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |dn AS (
        |  SELECT qe.query_id, c.vec_id,
        |    round(list_dot_product(v, qv) /
        |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
        |      6) AS cos_sim
        |  FROM qe JOIN c ON c.vec_id <> qe.query_id),
        |lr AS (
        |  SELECT query_id, doc_id AS id, rn AS lex_rank FROM (
        |    SELECT query_id, doc_id, row_number() OVER
        |      (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rn
        |    FROM bm)
        |  WHERE rn <= 10),
        |dr AS (
        |  SELECT query_id, vec_id AS id, rn AS dense_rank FROM (
        |    SELECT query_id, vec_id, row_number() OVER
        |      (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rn
        |    FROM dn)
        |  WHERE rn <= 10),
        |f AS (
        |  SELECT COALESCE(lr.query_id, dr.query_id) AS query_id,
        |    COALESCE(lr.id, dr.id) AS id, lex_rank, dense_rank,
        |    round(COALESCE(CAST(1 AS DOUBLE) / (60 + lex_rank), 0)
        |      + COALESCE(CAST(1 AS DOUBLE) / (60 + dense_rank), 0), 9) AS rrf
        |  FROM lr FULL OUTER JOIN dr
        |    ON lr.query_id = dr.query_id AND lr.id = dr.id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, id, lex_rank,
        |  dense_rank, rrf
        |FROM (SELECT *, row_number() OVER
        |    (PARTITION BY query_id ORDER BY rrf DESC, id) AS rk FROM f)
        |WHERE rk <= 10 ORDER BY query_id, rrf DESC, id""".stripMargin) +
    // q244: graded retrieval-quality metrics over the q40 dense list
    // (block spliced verbatim), relevance = same label as the query
    // vector. Each DCG term 1/log2(rank+1) fixes at the 12-dp grid
    // before the exact decimal sum (log2 is a transcendental — q184);
    // precision/MRR are exact-integer quotients emitted unrounded
    // (q107). IDCG places min(R, k) relevant docs at the top; every
    // testdata corpus has R ≥ 42 per label, so the series runs to
    // k = 10 unconditionally.
    ("q244_retrieval_eval" ->
      s"""WITH dn AS ${block("q40_cosine_topk")},
        |r AS (
        |  SELECT vec_id AS id,
        |    row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM dn),
        |ql AS (SELECT label FROM embeddings WHERE vec_id = 0),
        |rel AS (
        |  SELECT vec_id AS id FROM embeddings e, ql
        |  WHERE e.vec_id <> 0 AND e.label = ql.label),
        |g AS (
        |  SELECT r.rank,
        |    CASE WHEN rel.id IS NULL THEN 0 ELSE 1 END AS is_rel,
        |    CAST(round(CAST(CASE WHEN rel.id IS NULL THEN 0 ELSE 1 END AS DOUBLE)
        |        / log2(r.rank + 1), 12) AS DECIMAL(28,12)) AS gain
        |  FROM r LEFT JOIN rel ON r.id = rel.id),
        |idcg AS (
        |  SELECT SUM(CAST(round(CAST(1 AS DOUBLE) / log2(i + 1), 12)
        |    AS DECIMAL(28,12))) AS v
        |  FROM generate_series(1, 10) t(i))
        |SELECT 10 AS k, CAST(SUM(is_rel) AS BIGINT) AS n_rel,
        |  CAST(SUM(is_rel) AS DOUBLE) / 10 AS precision_at_k,
        |  COALESCE(CAST(1 AS DOUBLE)
        |    / MIN(CASE WHEN is_rel = 1 THEN rank END), 0) AS mrr,
        |  round(CAST(SUM(gain) AS DOUBLE), 6) AS dcg,
        |  round(CAST(SUM(gain) AS DOUBLE)
        |    / CAST((SELECT v FROM idcg) AS DOUBLE), 6) AS ndcg
        |FROM g""".stripMargin) +
    ("q175_ann_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q166_pq_adc")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    ("q194_span_burden_by_source" ->
      s"""WITH f AS ${block("q189_strip_dup_spans")}
        |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(f.n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(f.n_removed) AS BIGINT) AS removed_tokens,
        |  CAST(SUM(f.n_removed) AS DOUBLE) / SUM(f.n_tokens)
        |    AS removed_fraction
        |FROM f JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin) +
    ("q191_ivfadc_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q196_ivfadc_probe")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    ("q207_rivfadc_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q206_rivfadc")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    // q226: the outer CTE `embeddings` SHADOWS the parquet table for
    // every nested component chain (standard CTE scoping, verified in
    // DuckDB) — the exact/raw/residual oracles replay unchanged over
    // the regenerated clustered corpus
    ("q226_rivfadc_clustered" ->
      s"""WITH embeddings AS (
        |$clusteredFixtureSql),
        |ex AS (SELECT * FROM (
        |$cosineTopKOracle
        |)),
        |rw AS (SELECT * FROM (
        |${pqAdcOracleSql(restricted = true, queryId = 0L)}
        |)),
        |rs AS (SELECT * FROM (
        |${rAdcOracleSql(0L)}
        |))
        |SELECT * FROM (
        |  SELECT 'raw' AS family, 10 AS k,
        |    CAST((SELECT COUNT(*) FROM ex JOIN rw USING (vec_id)) AS BIGINT)
        |      AS n_overlap,
        |    CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE CAST((SELECT COUNT(*) FROM ex JOIN rw USING (vec_id)) AS DOUBLE)
        |        / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |  UNION ALL
        |  SELECT 'residual', 10,
        |    CAST((SELECT COUNT(*) FROM ex JOIN rs USING (vec_id)) AS BIGINT),
        |    CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE CAST((SELECT COUNT(*) FROM ex JOIN rs USING (vec_id)) AS DOUBLE)
        |        / least(10, (SELECT COUNT(*) FROM ex)) END)
        |ORDER BY family""".stripMargin) +
    ("q209_rerank_recall" ->
      s"""WITH ex AS ${block("q40_cosine_topk")},
        |ap AS ${block("q208_adc_rerank")}
        |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(COUNT(*) AS DOUBLE)
        |      / least(10, (SELECT COUNT(*) FROM ex)) END AS recall
        |FROM ex JOIN ap USING (vec_id)""".stripMargin) +
    ("q179_langid_accuracy" ->
      s"""WITH p AS ${block("q34_lang_id")}
        |SELECT d.lang AS true_lang, p.pred_lang, COUNT(*) AS n
        |FROM documents d JOIN p USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) +
    ("q185_dedup_funnel" ->
      s"""WITH ex AS ${block("q30_dedup_exact")},
        |nd AS ${block("q116_canonical_docs")},
        |sm AS ${block("q118_semantic_dedup")},
        |tok AS (
        |  SELECT doc_id, CAST(len(regexp_split_to_array(
        |    trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS BIGINT)
        |    AS nt
        |  FROM documents),
        |f AS (
        |  SELECT t.doc_id, t.nt,
        |    t.doc_id IN (SELECT keep_id FROM ex) AS ke,
        |    COALESCE(nd.keep, FALSE) AS kn,
        |    COALESCE(sm.keep, FALSE) AS ks
        |  FROM tok t
        |  LEFT JOIN nd ON nd.doc_id = t.doc_id
        |  LEFT JOIN sm ON sm.vec_id = t.doc_id)
        |SELECT stage, CAST(docs_kept AS BIGINT) AS docs_kept,
        |  CAST(tokens_kept AS BIGINT) AS tokens_kept FROM (
        |  SELECT '0_all' AS stage, COUNT(*) AS docs_kept,
        |    COALESCE(SUM(nt), 0) AS tokens_kept FROM f
        |  UNION ALL
        |  SELECT '1_exact', COUNT(*) FILTER (WHERE ke),
        |    COALESCE(SUM(nt) FILTER (WHERE ke), 0) FROM f
        |  UNION ALL
        |  SELECT '2_near_dup', COUNT(*) FILTER (WHERE ke AND kn),
        |    COALESCE(SUM(nt) FILTER (WHERE ke AND kn), 0) FROM f
        |  UNION ALL
        |  SELECT '3_semantic', COUNT(*) FILTER (WHERE ke AND kn AND ks),
        |    COALESCE(SUM(nt) FILTER (WHERE ke AND kn AND ks), 0) FROM f)
        |ORDER BY stage""".stripMargin) +
    // q235 (round-12 deletion propagation): the q160 composition
    // replayed over the corpus MINUS the deleted set — a CTE named
    // `documents` SHADOWS the base view for every reference in the
    // query (including the shared shingle/jaccard CTEs), with the
    // schema-qualified `main.documents` escaping the shadow for the
    // filter itself. SQL scoping, not text substitution (ADVICE r12:
    // the previous whole-string replace would corrupt silently if the
    // word ever appeared in a comment or literal of the q160 SQL), so
    // the oracle proves the tombstoned/purged index answers exactly as
    // an index built from the remaining docs, using the SAME
    // edge/walk/split arithmetic
    ("q235_manifest_after_delete" -> {
      val q160 = base("q160_multimodal_manifest")
      require(q160.startsWith("WITH RECURSIVE "),
        "q235 oracle: q160 SQL no longer starts with WITH RECURSIVE — " +
          "re-anchor the shadowing-CTE splice")
      q160.replaceFirst("^WITH RECURSIVE ",
        "WITH RECURSIVE documents AS " +
          "(SELECT * FROM main.documents WHERE doc_id % 10 <> 3), ")
    }) +
    // q236: the q196 ADC probe chain with tombstoned vec_ids excluded
    // from the CANDIDATE rows only — training and centroids replay
    // over the full corpus (the engine's frozen artifacts), deleted
    // ids simply stop being rankable, and the top-k refills from
    // survivors by the same distance arithmetic
    ("q236_ann_delete_probe" ->
      OracleCtes.pqAdcOracleSql(restricted = true, queryId = 0L,
        candFilter = " AND a.vec_id % 7 <> 2")) +
    // q237: the deletion-state report recomputed from first
    // principles — shingle totals via the shared shingle CTE, one row
    // per doc for the three hash tables, masked = the q235 delete set
    // q238/q239: the fsck healthy-state contracts over the tombstoned
    // q235/q236 indexes — every invariant row literal except the
    // pending-tombstone counts, recomputed from the delete predicates
    ("q238_sig_fsck" ->
      s"""WITH n AS (
        |  SELECT CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT) AS c
        |  FROM documents)
        |SELECT check_name, ok, n_violations, detail FROM (
        |  SELECT 'doc_universe' AS check_name, TRUE AS ok,
        |    CAST(0 AS BIGINT) AS n_violations,
        |    'every shingle doc exists in text_hashes' AS detail
        |  UNION ALL SELECT 'docs_unique', TRUE, CAST(0 AS BIGINT),
        |    'one md5 row per doc'
        |  UNION ALL SELECT 'freq_consistent', TRUE, CAST(0 AS BIGINT),
        |    'stale by design under ' || (SELECT c FROM n) ||
        |    ' pending tombstones'
        |  UNION ALL SELECT 'layout_parts', TRUE, CAST(0 AS BIGINT),
        |    'all signature tables present'
        |  UNION ALL SELECT 'no_swap_leftovers', TRUE, CAST(0 AS BIGINT),
        |    'no in-flight staged swap'
        |  UNION ALL SELECT 'tombstones_pending', TRUE, (SELECT c FROM n),
        |    'pending forget requests (anti-joined on read; purge folds them)')
        |ORDER BY check_name""".stripMargin) +
    ("q239_ann_fsck" ->
      """SELECT check_name, ok, n_violations, detail FROM (
        |  SELECT 'clusters_known' AS check_name, TRUE AS ok,
        |    CAST(0 AS BIGINT) AS n_violations,
        |    'every cluster value is a centroid id' AS detail
        |  UNION ALL SELECT 'code_arity', TRUE, CAST(0 AS BIGINT),
        |    'every codes array has 16 entries'
        |  UNION ALL SELECT 'codebook_nonempty', TRUE, CAST(0 AS BIGINT),
        |    'codebook has rows'
        |  UNION ALL SELECT 'codes_decode', TRUE, CAST(0 AS BIGINT),
        |    'every (subspace, code) exists in the codebook'
        |  UNION ALL SELECT 'ids_unique', TRUE, CAST(0 AS BIGINT),
        |    'one code row per vector id'
        |  UNION ALL SELECT 'layout_parts', TRUE, CAST(0 AS BIGINT),
        |    'codes/codebook/centroids present'
        |  UNION ALL SELECT 'no_swap_leftovers', TRUE, CAST(0 AS BIGINT),
        |    'no in-flight partition swap'
        |  UNION ALL SELECT 'tombstones_benign', TRUE, CAST(0 AS BIGINT),
        |    'tombstoned ids absent from codes are already purged (benign)')
        |ORDER BY check_name""".stripMargin) +
    // q240 (round-13 closed forget loop): the one-row cycle report
    // recomputed from first principles — request count and per-table
    // masked fractions off the documents table (the doc-level hash
    // tables share one fraction; shingles weight docs by their shingle
    // counts via the shared CTE), the 0.05 policy comparison the purge
    // fires on, and the audited post-purge end state (nothing pending,
    // nothing failing). GREATEST mirrors deletionReport's max over
    // tables; both sides divide the same BIGINTs as DOUBLEs.
    ("q240_forget_cycle" ->
      s"""WITH $shingleCte,
        |d AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked
        |  FROM documents),
        |sm AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked
        |  FROM sh)
        |SELECT d.masked AS n_requested,
        |  GREATEST(CAST(d.masked AS DOUBLE) / d.total,
        |           CAST(sm.masked AS DOUBLE) / sm.total) AS masked_fraction,
        |  GREATEST(CAST(d.masked AS DOUBLE) / d.total,
        |           CAST(sm.masked AS DOUBLE) / sm.total) > 0.05 AS purged,
        |  CAST(0 AS BIGINT) AS pending_tombstones,
        |  TRUE AS fsck_ok,
        |  CAST(0 AS BIGINT) AS failing_checks
        |FROM d, sm""".stripMargin) +
    // q241: the q240 report arithmetic on the ANN tier — codes hold
    // one row per vector, so the masked fraction is the deleted-id
    // ratio over the embeddings table; policy and end state as q240
    ("q241_forget_cycle_ann" ->
      """WITH d AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE vec_id % 7 = 2) AS BIGINT)
        |      AS masked
        |  FROM embeddings)
        |SELECT d.masked AS n_requested,
        |  CAST(d.masked AS DOUBLE) / d.total AS masked_fraction,
        |  CAST(d.masked AS DOUBLE) / d.total > 0.05 AS purged,
        |  CAST(0 AS BIGINT) AS pending_tombstones,
        |  TRUE AS fsck_ok,
        |  CAST(0 AS BIGINT) AS failing_checks
        |FROM d""".stripMargin) +
    // q250 (drift→rebuild loop): the report recomputed from first
    // principles — the a-side dim-means over the stride-31 centroid
    // sample (≤16 vectors, the build's deterministic init over the
    // ORIGINAL corpus), the b-side over original ∪ shifted (each
    // element + 0.5 in float — the double add of two floats rounded
    // back to REAL is exactly the engine's float add), cosine through
    // q149's exact decimal grid (VARCHAR-routed decimal→double casts,
    // the measured DuckDB rounding hazard), policy at 0.9, audited
    // end state green
    ("q250_drift_rebuild" ->
      """WITH cands AS (
        |  SELECT embedding FROM embeddings
        |  WHERE vec_id % 31 = 0 AND list_dot_product(
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0
        |  ORDER BY vec_id LIMIT 16),
        |uni AS (
        |  SELECT embedding FROM embeddings
        |  UNION ALL
        |  SELECT list_transform(embedding,
        |    x -> CAST(CAST(x AS DOUBLE) + 0.5 AS REAL)) FROM embeddings),
        |ea AS (
        |  SELECT generate_subscripts(embedding, 1) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE), 9)
        |      AS DECIMAL(21,9)) AS v
        |  FROM cands),
        |eb AS (
        |  SELECT generate_subscripts(embedding, 1) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE), 9)
        |      AS DECIMAL(21,9)) AS v
        |  FROM uni),
        |ma AS (
        |  SELECT dim, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(12,9)) AS m
        |  FROM ea GROUP BY dim),
        |mb AS (
        |  SELECT dim, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(12,9)) AS m
        |  FROM eb GROUP BY dim),
        |s AS (
        |  SELECT SUM(CAST(ma.m * mb.m AS DECIMAL(38,18))) AS ab,
        |    SUM(CAST(ma.m * ma.m AS DECIMAL(38,18))) AS aa,
        |    SUM(CAST(mb.m * mb.m AS DECIMAL(38,18))) AS bb
        |  FROM ma JOIN mb USING (dim)),
        |cc AS (
        |  SELECT CASE WHEN aa > 0 AND bb > 0 THEN
        |      round(CAST(CAST(ab AS VARCHAR) AS DOUBLE) /
        |        (sqrt(CAST(CAST(aa AS VARCHAR) AS DOUBLE)) *
        |         sqrt(CAST(CAST(bb AS VARCHAR) AS DOUBLE))), 6)
        |    END AS centroid_cosine
        |  FROM s)
        |SELECT CAST(2 * (SELECT COUNT(*) FROM embeddings) AS BIGINT)
        |    AS n_vectors,
        |  centroid_cosine,
        |  CAST(0.9 AS DOUBLE) AS threshold,
        |  COALESCE(centroid_cosine < 0.9, TRUE) AS rebuilt,
        |  TRUE AS fsck_ok,
        |  CAST(0 AS BIGINT) AS failing_checks
        |FROM cc""".stripMargin) +
    // q251: after the drift-triggered rebuild, the full-width probe
    // equals the exact cosine top-10 over the union corpus (recall
    // total by construction at nProbe ≥ nCentroids — no premise)
    ("q251_drift_rebuild_probe" ->
      """WITH uni AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, list_transform(embedding,
        |    x -> CAST(CAST(x AS DOUBLE) + 0.5 AS REAL)) FROM embeddings),
        |q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM uni WHERE vec_id = 0),
        |c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM uni WHERE vec_id <> 0)
        |SELECT vec_id,
        |  round(list_dot_product(v, qv) /
        |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
        |    6) AS cos_sim
        |FROM c, q
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin) +
    // q248 (round-14 lexical forget loop): the q240 report arithmetic
    // on the BM25 tier — the masked fraction is the doc-level ratio
    // over the index's doc universe, which is docs with ≥1 token
    // (q168's tokenization); n_requested counts the request set off
    // the raw documents table (a request for an absent/empty doc
    // still counts as requested)
    ("q248_forget_cycle_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |u AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(w) AS token FROM toks)
        |  WHERE token <> ''),
        |d AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked
        |  FROM u),
        |r AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_req
        |  FROM documents WHERE doc_id % 10 = 3)
        |SELECT r.n_req AS n_requested,
        |  CAST(d.masked AS DOUBLE) / d.total AS masked_fraction,
        |  CAST(d.masked AS DOUBLE) / d.total > 0.05 AS purged,
        |  CAST(0 AS BIGINT) AS pending_tombstones,
        |  TRUE AS fsck_ok,
        |  CAST(0 AS BIGINT) AS failing_checks
        |FROM d, r""".stripMargin) +
    // q249 (unified all-tiers forget): one row per tier, each tier's
    // masked fraction from its own universe — signature: GREATEST
    // over doc-level and shingle-weighted fractions (q240's
    // arithmetic); ann: request-id ratio over the embeddings ids
    // (codes hold one row per vector); bm25: doc ratio over the
    // tokenized doc universe (q248's). All purge past 0.05 and audit
    // green with nothing pending.
    ("q249_forget_all_tiers" ->
      s"""WITH $shingleCte,
        |btoks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |u AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(w) AS token FROM btoks)
        |  WHERE token <> ''),
        |r AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_req
        |  FROM documents WHERE doc_id % 10 = 3),
        |dd AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked
        |  FROM documents),
        |sm AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked
        |  FROM sh),
        |ea AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE vec_id IN (
        |      SELECT doc_id FROM documents WHERE doc_id % 10 = 3))
        |      AS BIGINT) AS masked
        |  FROM embeddings),
        |bu AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked
        |  FROM u)
        |SELECT tier, n_requested, masked_fraction,
        |  masked_fraction > 0.05 AS purged,
        |  CAST(0 AS BIGINT) AS pending_tombstones,
        |  TRUE AS fsck_ok,
        |  CAST(0 AS BIGINT) AS failing_checks
        |FROM (
        |  SELECT 'ann' AS tier, r.n_req AS n_requested,
        |    CAST(ea.masked AS DOUBLE) / ea.total AS masked_fraction
        |  FROM ea, r
        |  UNION ALL SELECT 'bm25', r.n_req,
        |    CAST(bu.masked AS DOUBLE) / bu.total
        |  FROM bu, r
        |  UNION ALL SELECT 'signature', r.n_req,
        |    GREATEST(CAST(dd.masked AS DOUBLE) / dd.total,
        |             CAST(sm.masked AS DOUBLE) / sm.total)
        |  FROM dd, sm, r)
        |ORDER BY tier""".stripMargin) +
    ("q237_delete_report" ->
      s"""WITH $shingleCte,
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked_rows
        |  FROM sh),
        |d AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT)
        |      AS masked_rows
        |  FROM documents)
        |SELECT table_name, total_rows, masked_rows,
        |  total_rows - masked_rows AS live_rows,
        |  CAST(masked_rows AS DOUBLE) / total_rows AS masked_fraction
        |FROM (
        |  SELECT 'audio_hashes' AS table_name, * FROM d
        |  UNION ALL SELECT 'image_hashes', * FROM d
        |  UNION ALL SELECT 'shingles', * FROM s
        |  UNION ALL SELECT 'text_hashes', * FROM d)
        |ORDER BY table_name""".stripMargin)
  }
}
