package graft.oracles

/** DuckDB oracle SQL — second third of the base oracle map (entries moved
  * VERBATIM from SparkEntry.oracleSqlBase, round-10 verdict item 7;
  * assembled by [[Oracles.all]]). Generated entries build from the
  * shared [[OracleCtes]] fragments.
  */
private[oracles] object OraclesB {
  import OracleCtes._
  import graft.text.Curation.FixedBpeMerges

  def map: Map[String, String] = Map(

    // the melt recomputed as an explicit UNION ALL — proves Spark's
    // unpivot Expand emits exactly those rows
    "q180_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, COUNT(value) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS total
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,

    // <=> mirrors as IS NOT DISTINCT FROM; the plain = counts rely on
    // CASE treating a NULL comparison as not-matched in both engines
    "q181_null_semantics" ->
      """WITH p AS (
        |  SELECT event_type, value,
        |    lag(value) OVER w AS pv, lag(1) OVER w AS has
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC))
        |SELECT event_type, COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN value IS NOT DISTINCT FROM pv THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_nullsafe_eq,
        |  CAST(SUM(CASE WHEN value = pv THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_plain_eq,
        |  CAST(SUM(CASE WHEN value IS NULL AND pv IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_both_null
        |FROM p WHERE has IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // every ratio rule recomputed as the SAME exact integer
    // inequality (3n <= sumlen <= 10n etc.) — no float thresholds
    "q178_gopher_rules" ->
      """WITH tw AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(
        |      trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      t -> t <> '') AS w
        |  FROM documents),
        |st AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_sum(list_transform(w,
        |      t -> CAST(length(t) AS BIGINT))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(w,
        |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(w,
        |      t -> t IN ('#', '...', '…'))) AS BIGINT) AS n_sym,
        |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %'))
        |      AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> l LIKE '%...' OR l LIKE '%…')) AS BIGINT) AS n_ell,
        |    CAST(len(list_intersect(list_distinct(w),
        |      ['the','be','to','of','and','that','have','with','a','in']))
        |      AS BIGINT) AS n_stop
        |  FROM tw),
        |r AS (
        |  SELECT doc_id, n_words,
        |    n_words >= 50 AND n_words <= 100000 AS len_ok,
        |    n_words > 0 AND 3 * n_words <= sum_len
        |      AND sum_len <= 10 * n_words AS word_len_ok,
        |    10 * n_sym <= n_words AS symbol_ok,
        |    5 * n_alpha >= 4 * n_words AS alpha_ok,
        |    10 * n_bullet <= 9 * n_lines AS bullet_ok,
        |    10 * n_ell <= 3 * n_lines AS ellipsis_ok,
        |    n_stop >= 2 AS stopword_ok
        |  FROM st)
        |SELECT doc_id, n_words, len_ok, word_len_ok, symbol_ok, alpha_ok,
        |  bullet_ok, ellipsis_ok, stopword_ok,
        |  len_ok AND word_len_ok AND symbol_ok AND alpha_ok AND bullet_ok
        |    AND ellipsis_ok AND stopword_ok AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // aggregates the q59 bar construction DIRECTLY from parquet; a
    // hash match proves the CSV export+parse chain loses nothing
    "q177_csv_roundtrip" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rn_first,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar,
        |    MAX(value) AS high, MIN(value) AS low,
        |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS volume,
        |    COUNT(*) AS n_ticks
        |  FROM ticks GROUP BY event_type, bar)
        |SELECT event_type, COUNT(*) AS n_bars,
        |  round(CAST(SUM(CAST(volume AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS total_volume,
        |  round(MAX(high), 6) AS max_high,
        |  round(MIN(low), 6) AS min_low,
        |  CAST(SUM(n_ticks) AS BIGINT) AS sum_ticks,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM bars GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q59's bar construction, then the Corwin–Schultz chain in the
    // Scala operation order: per-pair raw spread fixed at 12 dp
    // (post-correction), exact decimal mean
    "q176_corwin_schultz" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar, MAX(value) AS high, MIN(value) AS low
        |  FROM ticks GROUP BY event_type, bar),
        |p AS (
        |  SELECT event_type, high, low,
        |    lag(high) OVER w AS ph, lag(low) OVER w AS pl
        |  FROM bars WHERE low > 0
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bar ASC)),
        |q AS (
        |  SELECT event_type,
        |    ln(ph/pl) AS x1, ln(high/low) AS x0,
        |    ln(greatest(ph, high) / least(pl, low)) AS gg
        |  FROM p WHERE ph IS NOT NULL),
        |a AS (
        |  SELECT event_type,
        |    (sqrt(2.0*(x1*x1 + x0*x0)) - sqrt(x1*x1 + x0*x0))
        |      / (3.0 - 2.0*sqrt(2.0))
        |      - sqrt((gg*gg) / (3.0 - 2.0*sqrt(2.0))) AS al
        |  FROM q),
        |e AS (
        |  SELECT event_type,
        |    2.0*(exp(al)-1.0)/(1.0+exp(al)) AS sraw
        |  FROM a),
        |f AS (
        |  SELECT event_type,
        |    CAST(round(greatest(sraw, 0.0), 12) AS DECIMAL(28,12)) AS s,
        |    CASE WHEN sraw < 0 THEN 1 ELSE 0 END AS neg
        |  FROM e)
        |SELECT event_type, COUNT(*) AS n_pairs,
        |  round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS cs_spread,
        |  CAST(SUM(neg) AS BIGINT) AS neg_pairs
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,

    // PMI over distinct-doc counts with the same vocab cut (freq desc,
    // token asc) and the Scala division order; deterministic tie-broken
    // top-k on the rounded pmi
    "q174_token_pmi" ->
      """WITH toks0 AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(w) AS token FROM toks0)
        |  WHERE token <> ''),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, COUNT(*) AS f FROM tok GROUP BY token)
        |  ORDER BY f DESC, token ASC LIMIT 50),
        |dt AS (SELECT DISTINCT doc_id, token FROM tok JOIN vocab USING (token)),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dt),
        |ct AS (SELECT token, COUNT(*) AS c FROM dt GROUP BY token),
        |pr AS (
        |  SELECT a.token AS token_a, b.token AS token_b, COUNT(*) AS c_ab
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT token_a, token_b, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(ca.c AS BIGINT) AS c_a, CAST(cb.c AS BIGINT) AS c_b,
        |  round(ln((CAST(n_docs AS DOUBLE) * c_ab)
        |    / (CAST(ca.c AS DOUBLE) * cb.c)), 6) AS pmi
        |FROM pr JOIN ct ca ON ca.token = token_a
        |JOIN ct cb ON cb.token = token_b
        |CROSS JOIN nd
        |ORDER BY pmi DESC, token_a ASC, token_b ASC LIMIT 50""".stripMargin,

    // the oracle aggregates the parquet table DIRECTLY (q87 pattern) —
    // a hash match proves the jsonl write+infer+scan loses nothing
    "q173_jsonl_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS total_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(value) AS BIGINT) AS n_priced
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the q98 beta arithmetic inside a 10-row trailing window: same
    // 9-dp bucket means, same power-sum quotient, warm-up rows NULL
    "q171_rolling_beta" ->
      """WITH base AS (
        |  SELECT event_type AS k, CAST(ts AS DATE) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT bucket, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(21,9)) AS m
        |  FROM base GROUP BY bucket),
        |x AS (
        |  SELECT k, bucket, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY k, bucket),
        |wnd AS (
        |  SELECT k, x.bucket,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(m) OVER w AS sm,
        |    SUM(CAST(x*m AS DECIMAL(38,18))) OVER w AS sxm,
        |    SUM(CAST(m*m AS DECIMAL(38,18))) OVER w AS smm
        |  FROM x JOIN m USING (bucket)
        |  WINDOW w AS (PARTITION BY k ORDER BY x.bucket ASC
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT k AS event_type, bucket, CAST(n AS BIGINT) AS n_window,
        |  CASE WHEN n = 10 AND n * CAST(smm AS DOUBLE)
        |      - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) > 0
        |    THEN round((n * CAST(sxm AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE))
        |      / (n * CAST(smm AS DOUBLE)
        |        - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6) END
        |    AS rolling_beta
        |FROM wnd ORDER BY event_type, bucket""".stripMargin,

    // BM25 recomputed end to end on the q117 tokenization: idf and the
    // tf saturation term in the Scala operation order, each (doc,term)
    // score fixed at 12 dp before the exact decimal per-doc sum
    "q168_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(w) AS token FROM toks)
        |  WHERE token <> ''),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM tok
        |  WHERE token IN ('spark', 'vector', 'merge') GROUP BY 1, 2),
        |dft AS (SELECT token, COUNT(*) AS dft FROM tf GROUP BY token),
        |sc AS (
        |  SELECT t.doc_id,
        |    CAST(round(
        |      ln((CAST(n_docs AS DOUBLE) - dft + 0.5)
        |          / (CAST(dft AS DOUBLE) + 0.5) + 1.0)
        |      * (CAST(tf AS DOUBLE) / (CAST(tf AS DOUBLE)
        |          + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
        |            / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
        |      12) AS DECIMAL(28,12)) AS ts
        |  FROM tf t JOIN dft USING (token) JOIN dl USING (doc_id)
        |  CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_matched,
        |  round(CAST(SUM(ts) AS DOUBLE), 6) AS bm25
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // first-seen = MIN doc over the shared shingle CTE; novelty is the
    // unrounded exact-integer quotient (q107 discipline)
    "q169_novelty" ->
      s"""WITH $shingleCte,
        |f AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
        |SELECT s.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS novelty
        |FROM sh s JOIN f USING (shingle)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // Ljung–Box recomputed from the same exact decimal power sums:
    // tickReturn's rounded-division returns, per-lag conditional sums,
    // rho and Q-terms fixed at 12 dp in the Scala operation order
    "q170_ljung_box" ->
      """WITH t AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r0 AS (
        |  SELECT event_type, ts, event_id, v,
        |    lag(v) OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM t),
        |r AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(round(CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9)
        |      AS DECIMAL(16,9)) AS rr
        |  FROM r0 WHERE pv > 0),
        |l AS (
        |  SELECT event_type, rr,
        |    lag(rr, 1) OVER w AS l1, lag(rr, 2) OVER w AS l2,
        |    lag(rr, 3) OVER w AS l3, lag(rr, 4) OVER w AS l4,
        |    lag(rr, 5) OVER w AS l5
        |  FROM r WINDOW w AS (PARTITION BY event_type
        |    ORDER BY ts ASC, event_id ASC)),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(rr) AS s1,
        |    SUM(CAST(rr*rr AS DECIMAL(38,18))) AS s2,
        |    COUNT(l1) AS cnt1, SUM(CASE WHEN l1 IS NOT NULL
        |      THEN CAST(rr*l1 AS DECIMAL(38,18)) END) AS p1,
        |    SUM(CASE WHEN l1 IS NOT NULL THEN rr END) AS a1, SUM(l1) AS b1,
        |    COUNT(l2) AS cnt2, SUM(CASE WHEN l2 IS NOT NULL
        |      THEN CAST(rr*l2 AS DECIMAL(38,18)) END) AS p2,
        |    SUM(CASE WHEN l2 IS NOT NULL THEN rr END) AS a2, SUM(l2) AS b2,
        |    COUNT(l3) AS cnt3, SUM(CASE WHEN l3 IS NOT NULL
        |      THEN CAST(rr*l3 AS DECIMAL(38,18)) END) AS p3,
        |    SUM(CASE WHEN l3 IS NOT NULL THEN rr END) AS a3, SUM(l3) AS b3,
        |    COUNT(l4) AS cnt4, SUM(CASE WHEN l4 IS NOT NULL
        |      THEN CAST(rr*l4 AS DECIMAL(38,18)) END) AS p4,
        |    SUM(CASE WHEN l4 IS NOT NULL THEN rr END) AS a4, SUM(l4) AS b4,
        |    COUNT(l5) AS cnt5, SUM(CASE WHEN l5 IS NOT NULL
        |      THEN CAST(rr*l5 AS DECIMAL(38,18)) END) AS p5,
        |    SUM(CASE WHEN l5 IS NOT NULL THEN rr END) AS a5, SUM(l5) AS b5
        |  FROM l GROUP BY event_type),
        |c1 AS (SELECT *, CAST(s1 AS DOUBLE) / n AS rbar FROM s),
        |c2 AS (SELECT *,
        |  CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * rbar AS c0n FROM c1),
        |rho AS (
        |  SELECT *,
        |    round((CAST(p1 AS DOUBLE) - rbar * (CAST(a1 AS DOUBLE)
        |      + CAST(b1 AS DOUBLE)) + cnt1 * (rbar * rbar)) / c0n, 12) AS rho1,
        |    round((CAST(p2 AS DOUBLE) - rbar * (CAST(a2 AS DOUBLE)
        |      + CAST(b2 AS DOUBLE)) + cnt2 * (rbar * rbar)) / c0n, 12) AS rho2,
        |    round((CAST(p3 AS DOUBLE) - rbar * (CAST(a3 AS DOUBLE)
        |      + CAST(b3 AS DOUBLE)) + cnt3 * (rbar * rbar)) / c0n, 12) AS rho3,
        |    round((CAST(p4 AS DOUBLE) - rbar * (CAST(a4 AS DOUBLE)
        |      + CAST(b4 AS DOUBLE)) + cnt4 * (rbar * rbar)) / c0n, 12) AS rho4,
        |    round((CAST(p5 AS DOUBLE) - rbar * (CAST(a5 AS DOUBLE)
        |      + CAST(b5 AS DOUBLE)) + cnt5 * (rbar * rbar)) / c0n, 12) AS rho5
        |  FROM c2)
        |SELECT event_type, CAST(n AS BIGINT) AS n_returns, 5 AS n_lags,
        |  CASE WHEN n > 5 AND c0n > 0 THEN
        |    round(n * (n + 2) * (round(rho1*rho1 / (n-1), 12)
        |      + round(rho2*rho2 / (n-2), 12) + round(rho3*rho3 / (n-3), 12)
        |      + round(rho4*rho4 / (n-4), 12) + round(rho5*rho5 / (n-5), 12)),
        |      6) END AS q_stat
        |FROM rho ORDER BY event_type""".stripMargin,

    // per-source distinct shingle vocabularies off the shared shingle
    // CTE; jaccard emits the UNROUNDED exact-integer quotient (q107
    // rounding-tie discipline)
    "q167_corpus_overlap" ->
      s"""WITH $shingleCte,
        |srcsh AS (
        |  SELECT DISTINCT d.source, s.shingle
        |  FROM sh s JOIN documents d USING (doc_id)),
        |sizes AS (SELECT source, COUNT(*) AS n_sh FROM srcsh GROUP BY source),
        |inter AS (
        |  SELECT a.source AS slice_a, b.source AS slice_b, COUNT(*) AS n_inter
        |  FROM srcsh a JOIN srcsh b
        |    ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT slice_a, slice_b,
        |  CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
        |  CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.source = slice_a
        |JOIN sizes sb ON sb.source = slice_b
        |ORDER BY slice_a, slice_b""".stripMargin,

    // full PQ recompute: sample-init codebook (16 smallest ids),
    // argmin assignment and ADC distances via list_dot_product (the
    // bit-equal twin of the Scala dot kernel, q42 precedent), exact
    // decimal ADC sums
    "q166_pq_adc" -> pqAdcOracleSql(restricted = false),

    // the IVFADC composition: same trained-PQ chain, ADC scan
    // restricted to the nProbe probed inverted lists (stride-init
    // centroids, argmax-cosine assignment with the engine's
    // largest-id tiebreak, probe by centroid-query cosine)
    "q190_ivfadc" -> pqAdcOracleSql(restricted = true, queryId = 1L),
    // the persisted-index probe must reproduce the self-contained
    // IVFADC computation exactly — SAME oracle, different plumbing
    "q196_ivfadc_probe" -> pqAdcOracleSql(restricted = true),
    "q205_bpe_apply" -> bpeApplyOracleSql(FixedBpeMerges),
    "q218_bpe_fertility" -> bpeFertilityOracleSql(FixedBpeMerges),
    "q225_bpe_train" -> bpeTrainOracleSql(5),

    "q221_hll_audit" -> hllOracleSql(10),
    // q228: the SAME chain minus the exact columns — the register-file
    // read path must equal recomputing registers from raw documents
    "q228_hll_from_registers" -> hllOracleSql(10, withExact = false),
    "q222_hll_by_source" -> hllBySourceOracleSql(10),
    "q224_kmv_overlap" -> kmvOracleSql(64),
    // q227: the SAME generated chain minus the exact/sizes CTEs — the
    // production sketch-only form shares the estimate SQL verbatim
    "q227_kmv_sweep" -> kmvOracleSql(64, withExact = false),
    // q229: identical oracle — the persisted-sample read path must
    // equal the self-deriving sweep (indexed ≡ inline)
    "q229_kmv_from_samples" -> kmvOracleSql(64, withExact = false),

    // the quantile sketch's three faces (round 12): production sweep,
    // q224-style exact-error audit, persisted-sample read path — the
    // read path shares the sweep's oracle UNCHANGED (indexed ≡ inline)
    "q231_quantile_sketch" ->
      quantileSketchSql(256, graft.ops.Stats.QuantileProbs),
    "q232_quantile_audit" ->
      quantileSketchSql(256, graft.ops.Stats.QuantileProbs, withExact = true),
    "q233_quantile_from_sketch" ->
      quantileSketchSql(256, graft.ops.Stats.QuantileProbs),
    // distribution-shape drift: slice sketch vs standing-corpus sketch,
    // exact decimal per-prob shifts (the batch twin of quantileDriftSink)
    "q234_quantile_drift" ->
      quantileDriftSql(256, graft.ops.Stats.QuantileProbs),

    // mirrors TextStats.cmsHeavyHitters: every trigram OCCURRENCE
    // (short docs fall back to the whole-text gram) counts into the
    // 4×1024 sketch via (h1 + r·h2) mod 1024 double hashing; the exact
    // top-20 is a deterministic total order (count desc, gram asc)
    "q230_cms_lookup" -> cmsLookupOracleSql(4, 1024),

    "q220_cms_heavyhitters" ->
      s"""WITH $gram3Cte,
        |pr AS (
        |  SELECT (CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
        |          + rr.r * CAST('0x' || substr(md5(gram), 9, 8) AS BIGINT))
        |         % 1024 AS bucket, rr.r
        |  FROM grams CROSS JOIN (SELECT unnest(range(0, 4)) AS r) rr),
        |cms AS (
        |  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM pr GROUP BY 1, 2),
        |exact AS (
        |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM grams GROUP BY 1
        |  ORDER BY n_exact DESC, gram ASC LIMIT 20),
        |est AS (
        |  SELECT e.gram, MIN(cms.c) AS n_cms
        |  FROM (SELECT gram,
        |          CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT) AS h1,
        |          CAST('0x' || substr(md5(gram), 9, 8) AS BIGINT) AS h2
        |        FROM exact) e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS r) rr
        |  JOIN cms ON cms.r = rr.r
        |    AND cms.bucket = (e.h1 + rr.r * e.h2) % 1024
        |  GROUP BY 1)
        |SELECT e.gram, e.n_exact, s.n_cms,
        |  s.n_cms - e.n_exact AS overestimate
        |FROM exact e JOIN est s USING (gram)
        |ORDER BY n_exact DESC, gram ASC""".stripMargin,

    // mirrors Similarity.sq8Audit: identical 1e-6 floor grid, integer
    // range arithmetic, and the two correctly-rounded IEEE quotients
    "q219_sq8_audit" ->
      """WITH v AS (
        |  SELECT vec_id, d,
        |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS vi
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |          generate_subscripts(embedding, 1) AS d
        |        FROM embeddings)),
        |st AS (SELECT d, MIN(vi) AS mn, MAX(vi) AS mx FROM v GROUP BY 1),
        |c AS (
        |  SELECT vec_id, vi, mn, mx,
        |    CASE WHEN mx > mn THEN
        |      CAST(floor(CAST((vi - mn) * 255 AS DOUBLE) / (mx - mn)) AS BIGINT)
        |    ELSE 0 END AS code
        |  FROM v JOIN st USING (d)),
        |r AS (
        |  SELECT vec_id, code,
        |    abs(vi - (mn + CASE WHEN mx > mn THEN
        |      CAST(floor(CAST(code * (mx - mn) AS DOUBLE) / 255) AS BIGINT)
        |    ELSE 0 END)) AS err
        |  FROM c)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
        |  CAST(SUM(code) AS BIGINT) AS code_sum,
        |  CAST(SUM(err) AS BIGINT) AS err_micro
        |FROM r GROUP BY 1 ORDER BY vec_id""".stripMargin,

    "q206_rivfadc" -> rAdcOracleSql(queryId = 0L),

    "q208_adc_rerank" -> adcRerankOracleSql(queryId = 0L, k = 10,
      shortlist = 100),

    "q210_rerank_join" ->
      (0L to 2L).map(qid =>
          s"SELECT $qid AS query_id, vec_id, cos_sim FROM (\n" +
            s"${adcRerankOracleSql(queryId = qid, k = 10, shortlist = 100)}\n)")
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY query_id, cos_sim DESC, vec_id"),

    "q211_dsir_weights" ->
      s"""WITH ${dsirCte(64)}
        |SELECT doc_id, n_feats, log_weight FROM dsir
        |ORDER BY doc_id""".stripMargin,

    // mirrors Curation.repetitionRules: dup counting = occurrences
    // beyond first per (doc, line/gram) group; top bigram resolves
    // count ties to the lexicographically smallest gram; verdicts are
    // the same exact integer inequalities
    "q213_repetition_rules" ->
      """WITH tk AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS total_chars,
        |    regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, x AS line FROM (
        |    SELECT doc_id, unnest(string_split(text, chr(10))) AS x
        |    FROM documents) WHERE x <> ''),
        |nl AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY 1),
        |lcounts AS (SELECT doc_id, line, COUNT(*) AS c FROM lines GROUP BY 1, 2),
        |ld AS (
        |  SELECT doc_id, CAST(SUM(c - 1) AS BIGINT) AS dup_lines,
        |    CAST(SUM((c - 1) * length(line)) AS BIGINT) AS dup_line_chars
        |  FROM lcounts GROUP BY 1),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM tk),
        |g2 AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word AS g
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM tk WHERE len(w) < 2),
        |g2c AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
        |top2 AS (
        |  SELECT doc_id, g AS top_bigram, CAST(c AS BIGINT) AS top_bigram_n,
        |    CAST(c * length(g) AS BIGINT) AS top_bigram_chars
        |  FROM g2c
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1),
        |g5 AS (
        |  SELECT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS g
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM tk WHERE len(w) < 5),
        |g5c AS (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2),
        |g5d AS (
        |  SELECT doc_id, CAST(SUM((c - 1) * length(g)) AS BIGINT) AS dup_5gram_chars
        |  FROM g5c GROUP BY 1),
        |rep AS (
        |  SELECT t.doc_id, t.total_chars,
        |    COALESCE(nl.n_lines, 0) AS n_lines,
        |    COALESCE(ld.dup_lines, 0) AS dup_lines,
        |    COALESCE(ld.dup_line_chars, 0) AS dup_line_chars,
        |    top2.top_bigram, top2.top_bigram_n, top2.top_bigram_chars,
        |    COALESCE(g5d.dup_5gram_chars, 0) AS dup_5gram_chars
        |  FROM tk t
        |  LEFT JOIN nl ON nl.doc_id = t.doc_id
        |  LEFT JOIN ld ON ld.doc_id = t.doc_id
        |  LEFT JOIN top2 ON top2.doc_id = t.doc_id
        |  LEFT JOIN g5d ON g5d.doc_id = t.doc_id)
        |SELECT doc_id, total_chars, n_lines, dup_lines, dup_line_chars,
        |  top_bigram, top_bigram_n, top_bigram_chars, dup_5gram_chars,
        |  10 * dup_lines <= 3 * n_lines AS dup_line_ok,
        |  5 * dup_line_chars <= total_chars AS dup_line_char_ok,
        |  5 * top_bigram_chars <= total_chars AS top_bigram_ok,
        |  20 * dup_5gram_chars <= 3 * total_chars AS dup_5gram_ok,
        |  (10 * dup_lines <= 3 * n_lines) AND (5 * dup_line_chars <= total_chars)
        |    AND (5 * top_bigram_chars <= total_chars)
        |    AND (20 * dup_5gram_chars <= 3 * total_chars) AS keep
        |FROM rep ORDER BY doc_id""".stripMargin,

    // mirrors Curation.corpusLineDedup: df + canonical-first keeper from
    // the same line grouping, blank lines always kept, reassembly in
    // position order (string_agg FILTER drops removed lines with no
    // separator residue, exactly like the array_join of kept structs)
    "q215_line_dedup" ->
      """WITH lns AS (
        |  SELECT doc_id, i - 1 AS pos, line FROM (
        |    SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |      generate_subscripts(string_split(text, chr(10)), 1) AS i
        |    FROM documents)),
        |active AS (SELECT * FROM lns WHERE trim(line) <> ''),
        |cnt AS (SELECT line, COUNT(*) AS df FROM active GROUP BY 1),
        |keeper AS (
        |  SELECT line, doc_id AS kdoc, pos AS kpos FROM active
        |  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1),
        |judged AS (
        |  SELECT a.doc_id, a.pos, a.line,
        |    (c.df < 2 OR (k.kdoc = a.doc_id AND k.kpos = a.pos)) AS keep
        |  FROM active a JOIN cnt c USING (line) JOIN keeper k USING (line)),
        |allv AS (
        |  SELECT doc_id, pos, line, keep FROM judged
        |  UNION ALL
        |  SELECT doc_id, pos, line, TRUE FROM lns WHERE trim(line) = '')
        |SELECT doc_id,
        |  COALESCE(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE keep), '') AS text_clean,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM allv GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirrors TextStats.winnowFingerprints via the shared winnowCte
    "q216_winnow_fingerprints" ->
      s"""WITH $winnowCte
        |SELECT doc_id, pos, fp FROM wfp
        |ORDER BY doc_id, pos, fp""".stripMargin,

    // mirrors TextStats.winnowOverlapPairs off the SAME winnowCte:
    // distinct (doc, fp), fp-keyed self-join, pair counts >= 2,
    // containment as the unrounded exact-integer quotient
    "q217_winnow_overlap" -> winnowPairsOracleSql(""),

    // mirrors TextStats.appendWinnowOverlapPairs: the SAME full-pair
    // chain restricted to pairs with >= 1 batch (doc_id%10==0) side —
    // append ≡ full-minus-old is the law, so the oracle IS the
    // restriction of the full oracle
    "q223_winnow_append" -> winnowPairsOracleSql(
      "\n  AND (p.doc_a % 10 = 0 OR p.doc_b % 10 = 0)"),

    // mirrors Curation.lmPerplexity: add-1 bigram LM on the en slice,
    // V = distinct en unigrams + 1, each ln fixed to the 12-dp grid,
    // exact decimal weighted sum, negate/divide/round at presentation
    "q214_lm_perplexity" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, lang, unnest(w) AS word,
        |    generate_subscripts(w, 1) AS i FROM tk),
        |vocab AS (
        |  SELECT COUNT(DISTINCT word) + 1 AS v FROM words
        |  WHERE lang = 'en' AND word <> ''),
        |bi AS (
        |  SELECT a.doc_id, a.lang, a.word AS p, a.word || ' ' || b.word AS g
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |lm AS (SELECT g, COUNT(*) AS c_pw FROM bi WHERE lang = 'en' GROUP BY 1),
        |pcnt AS (SELECT p, COUNT(*) AS c_p FROM bi WHERE lang = 'en' GROUP BY 1),
        |pd AS (SELECT doc_id, p, g, COUNT(*) AS c FROM bi GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT pd.doc_id, pd.c,
        |    CAST(ROUND(ln((COALESCE(lm.c_pw, 0) + 1)
        |        / CAST(COALESCE(pcnt.c_p, 0) + vc.v AS DOUBLE)), 12)
        |      AS DECIMAL(16,12)) AS lnp
        |  FROM pd LEFT JOIN lm USING (g) LEFT JOIN pcnt USING (p)
        |  CROSS JOIN vocab vc)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  ROUND(-CAST(SUM(CAST(c AS DECIMAL(7,0)) * lnp) AS DOUBLE) / SUM(c), 6)
        |    AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q184's hash→uniform chain with the Gumbel-key ranking on top of
    // the spliced q211 weights
    "q212_dsir_resample" ->
      s"""WITH ${dsirCte(64)},
        |keyed AS (
        |  SELECT doc_id, log_weight,
        |    ROUND(log_weight - ln(-ln(
        |      (((doc_id % 1000000007) * 2654435761) % 1000000007 + 1)
        |        / CAST(1000000008 AS DOUBLE))), 12) AS gumbel_key
        |  FROM dsir),
        |top AS (
        |  SELECT doc_id, log_weight, gumbel_key
        |  FROM keyed ORDER BY gumbel_key DESC, doc_id ASC LIMIT 25)
        |SELECT doc_id, log_weight, gumbel_key,
        |  CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC)
        |    AS INT) AS sample_rank
        |FROM top ORDER BY sample_rank""".stripMargin,

    "q204_semantic_clusters" ->
      s"""WITH RECURSIVE ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id
        |  WHERE round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v))
        |        * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.95),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v)
        |SELECT node AS doc_id, MIN(comp) AS cluster_id,
        |  node = MIN(comp) AS is_canonical
        |FROM walk GROUP BY node ORDER BY doc_id""".stripMargin,

    "q203_embedding_covariance" ->
      """WITH e AS (
        |  SELECT vec_id AS id, ix.i AS i,
        |    CAST(round(CAST(embedding[ix.i + 1] AS DOUBLE), 9)
        |      AS DECIMAL(12,9)) AS x
        |  FROM embeddings, range(64) ix(i)),
        |p AS (
        |  SELECT a.i, b.i AS j, COUNT(*) AS n,
        |    SUM(CAST(a.x * b.x AS DECIMAL(38,18))) AS sxy,
        |    SUM(CAST(a.x AS DECIMAL(38,18))) AS sx,
        |    SUM(CAST(b.x AS DECIMAL(38,18))) AS sy
        |  FROM e a JOIN e b ON a.id = b.id AND b.i >= a.i
        |  GROUP BY 1, 2)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 9) AS cov
        |FROM p ORDER BY i, j""".stripMargin,

    "q202_balanced_sample" ->
      s"""WITH ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |cents AS (
        |  SELECT doc_id AS cid, v AS cv FROM nz
        |  WHERE doc_id % 31 = 0 ORDER BY doc_id ASC LIMIT 4),
        |iasg AS (
        |  SELECT doc_id, cid AS cluster FROM (
        |    SELECT e.doc_id, c.cid,
        |      row_number() OVER (PARTITION BY e.doc_id ORDER BY
        |        (list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v))
        |            * sqrt(list_dot_product(c.cv, c.cv)))) DESC,
        |        c.cid DESC) AS rn
        |    FROM nz e CROSS JOIN cents c) WHERE rn = 1),
        |rk AS (
        |  SELECT doc_id, cluster,
        |    row_number() OVER (PARTITION BY cluster ORDER BY
        |      ((doc_id % 1000000007) * 2654435761) % 1000000007 ASC,
        |      doc_id ASC) AS sample_rank
        |  FROM iasg)
        |SELECT doc_id, cluster, CAST(sample_rank AS BIGINT) AS sample_rank
        |FROM rk WHERE sample_rank <= 5
        |ORDER BY cluster, sample_rank""".stripMargin,

    // the reconstruction audit replays the SAME training chain and
    // decodes each vector's assigned codewords in SQL
    "q201_pq_reconstruction" ->
      s"""${pqTrainCtes(restricted = false)},
        |recon AS (
        |  SELECT b.vec_id,
        |    CAST(round(list_dot_product(b.sv, b.sv)
        |      - CAST(2 AS DOUBLE) * list_dot_product(b.sv, c.cw)
        |      + list_dot_product(c.cw, c.cw), 12) AS DECIMAL(28,12)) AS d
        |  FROM base b
        |  JOIN asg a ON a.vec_id = b.vec_id AND a.s = b.s
        |  JOIN cb c ON c.cs = a.s AND c.code = a.code)
        |SELECT vec_id, round(CAST(SUM(d) AS DOUBLE) / 64.0, 12) AS mse
        |FROM recon GROUP BY vec_id ORDER BY vec_id LIMIT 50""".stripMargin,

    // the batched ANN JOIN must equal three independent single-query
    // probes — the oracle is literally three spliced q190 chains, each
    // with its own query id and per-query probed lists
    "q197_ann_join" ->
      (0L to 2L).map(qid =>
          s"SELECT $qid AS query_id, vec_id, adc_dist FROM (\n" +
            s"${pqAdcOracleSql(restricted = true, queryId = qid)}\n)")
        .mkString("", "\nUNION ALL\n", "\nORDER BY query_id, adc_dist, vec_id"),

    // Neyman allocation recomputed end to end: exact decimal power
    // sums → 9-dp σ grid → largest-remainder apportionment → the q96
    // multiplicative-hash within-stratum rank
    "q165_neyman_sample" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_rows,
        |    round(sqrt(greatest(
        |      (CAST(SUM(CAST(v*v AS DECIMAL(38,12))) AS DOUBLE)
        |        - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE) / COUNT(*))
        |        / COUNT(*), 0.0)), 9) AS sd
        |  FROM (SELECT source, CAST(n_chars AS DECIMAL(18,6)) AS v
        |        FROM documents)
        |  GROUP BY source),
        |w AS (
        |  SELECT source, n_rows,
        |    CAST(round(n_rows * sd, 6) AS DECIMAL(28,6)) AS wt
        |  FROM s),
        |tot AS (SELECT SUM(wt) AS tw, SUM(n_rows) AS tn FROM w),
        |b AS (
        |  SELECT source, n_rows,
        |    CASE WHEN CAST(tw AS DOUBLE) > 0
        |      THEN round(CAST(100 AS DOUBLE) * CAST(wt AS DOUBLE)
        |        / CAST(tw AS DOUBLE), 9)
        |      ELSE round(CAST(100 AS DOUBLE) * n_rows / tn, 9) END AS ideal
        |  FROM w CROSS JOIN tot),
        |b2 AS (
        |  SELECT source, n_rows, CAST(floor(ideal) AS BIGINT) AS base,
        |    round(ideal - CAST(floor(ideal) AS BIGINT), 9) AS rem
        |  FROM b),
        |bt AS (SELECT SUM(base) AS base_sum FROM b2),
        |q AS (
        |  SELECT source,
        |    CAST(least(base + CASE WHEN
        |        row_number() OVER (ORDER BY rem DESC, source ASC)
        |        <= greatest(100 - base_sum, 0) THEN 1 ELSE 0 END,
        |      n_rows) AS BIGINT) AS quota
        |  FROM b2 CROSS JOIN bt),
        |r AS (
        |  SELECT d.source, d.doc_id, q.quota,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY ((d.doc_id % 1000000007) * 2654435761) % 1000000007
        |        ASC, d.doc_id ASC) AS sample_rank
        |  FROM documents d JOIN q USING (source))
        |SELECT source, doc_id, sample_rank, quota FROM r
        |WHERE sample_rank <= quota ORDER BY source, sample_rank""".stripMargin,

    // shares q59's bar construction verbatim; each per-bar estimator
    // fixes to the 12-dp grid before the exact decimal mean, mirroring
    // the Scala operation order token-for-token so the doubles agree
    "q163_range_volatility" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rn_first,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar,
        |    MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
        |    MAX(value) AS high, MIN(value) AS low,
        |    MAX(CASE WHEN rn_last = 1 THEN value END) AS close
        |  FROM ticks GROUP BY event_type, bar),
        |est AS (
        |  SELECT event_type,
        |    CAST(round(ln(high/low)*ln(high/low) / (4.0*ln(2.0)), 12)
        |      AS DECIMAL(28,12)) AS p,
        |    CAST(round(ln(high/low)*ln(high/low)*0.5
        |      - (2.0*ln(2.0)-1.0)*(ln(close/open)*ln(close/open)), 12)
        |      AS DECIMAL(28,12)) AS g,
        |    CAST(round(ln(high/close)*ln(high/open)
        |      + ln(low/close)*ln(low/open), 12) AS DECIMAL(28,12)) AS r
        |  FROM bars WHERE low > 0)
        |SELECT event_type, COUNT(*) AS n_bars,
        |  round(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS parkinson,
        |  round(CAST(SUM(g) AS DOUBLE) / COUNT(*), 6) AS garman_klass,
        |  round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS rogers_satchell
        |FROM est GROUP BY event_type ORDER BY event_type""".stripMargin,

    // aggregated-variance Hurst: exact decimal block sums and
    // regression sums; doubles only at ln() (12-dp-fixed) and the two
    // final quotients — the Scala side computes the identical chain
    "q164_hurst" ->
      """WITH ticks AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |rets AS (
        |  SELECT event_type, ts, event_id,
        |    v - lag(v) OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC) AS ret
        |  FROM ticks),
        |idx AS (
        |  SELECT event_type, ret,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC) - 1 AS j
        |  FROM rets WHERE ret IS NOT NULL),
        |blk AS (
        |  SELECT event_type, m, CAST(floor(j / m) AS BIGINT) AS b,
        |    CAST(SUM(ret) AS DECIMAL(18,6)) AS s, COUNT(*) AS cnt
        |  FROM idx CROSS JOIN (SELECT unnest([1,2,4,8,16]) AS m) ms
        |  GROUP BY event_type, m, CAST(floor(j / m) AS BIGINT)),
        |vars AS (
        |  SELECT event_type, m,
        |    (CAST(SUM(CAST(s*s AS DECIMAL(38,12))) AS DOUBLE)
        |      - CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE) / COUNT(*))
        |      / COUNT(*) AS var_m
        |  FROM blk WHERE cnt = m GROUP BY event_type, m),
        |pts AS (
        |  SELECT event_type,
        |    CAST(round(ln(CAST(m AS DOUBLE)), 12) AS DECIMAL(14,12)) AS x,
        |    CAST(round(ln(var_m), 12) AS DECIMAL(14,12)) AS y
        |  FROM vars WHERE var_m > 0),
        |reg AS (
        |  SELECT event_type, COUNT(*) AS k,
        |    CAST(SUM(CAST(x*x AS DECIMAL(38,24))) AS DOUBLE)
        |      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) / COUNT(*) AS sxx,
        |    CAST(SUM(CAST(x*y AS DECIMAL(38,24))) AS DOUBLE)
        |      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) / COUNT(*) AS sxy
        |  FROM pts GROUP BY event_type)
        |SELECT event_type, k AS n_scales,
        |  CASE WHEN k >= 2 AND sxx > 0
        |    THEN round(sxy / sxx / 2.0, 6) END AS hurst
        |FROM reg ORDER BY event_type""".stripMargin,

    // the q161 verdict arithmetic over the UNION of all three modality
    // edge families, each filtered to >=1 src0 side; flags = incidence
    // in the per-family incremental edge sets
    "q162_multimodal_append" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |newdoc AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a
        |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |media AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND bit_count(xor(a.doc_id, b.doc_id)) <= 3),
        |tinc AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b FROM jac
        |  UNION ALL SELECT doc_a, doc_b FROM exact)
        |  WHERE doc_a IN (SELECT doc_id FROM newdoc)
        |     OR doc_b IN (SELECT doc_id FROM newdoc)),
        |minc AS (SELECT DISTINCT doc_a, doc_b FROM media
        |  WHERE doc_a IN (SELECT doc_id FROM newdoc)
        |     OR doc_b IN (SELECT doc_id FROM newdoc)),
        |inc AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b FROM tinc
        |  UNION ALL SELECT doc_a, doc_b FROM minc)),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM inc
        |  UNION ALL SELECT doc_b, doc_a FROM inc),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node),
        |bt AS (SELECT cl.doc_id, cl.cluster_id
        |       FROM cl JOIN newdoc USING (doc_id)),
        |cmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS dup_of FROM cl
        |  WHERE doc_id NOT IN (SELECT doc_id FROM newdoc)
        |  GROUP BY cluster_id),
        |bmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS _bmin FROM bt GROUP BY cluster_id),
        |td AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM tinc
        |  UNION ALL SELECT doc_b FROM tinc)),
        |md AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM minc
        |  UNION ALL SELECT doc_b FROM minc))
        |SELECT bt.doc_id, cmin.dup_of,
        |  (cmin.dup_of IS NULL AND bt.doc_id = bmin._bmin) AS keep,
        |  td.doc_id IS NOT NULL AS text_dup,
        |  md.doc_id IS NOT NULL AS image_dup,
        |  md.doc_id IS NOT NULL AS audio_dup
        |FROM bt LEFT JOIN cmin USING (cluster_id)
        |JOIN bmin USING (cluster_id)
        |LEFT JOIN td ON td.doc_id = bt.doc_id
        |LEFT JOIN md ON md.doc_id = bt.doc_id
        |ORDER BY bt.doc_id""".stripMargin,

    // the full jaccard+exact pair graph filtered to pairs touching the
    // src0 batch, walked to components; dup_of = min corpus member,
    // keep = corpus-clean AND min batch member of the component
    "q161_append_dedup" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |newdoc AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a
        |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |inc AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b FROM jac
        |  UNION ALL SELECT doc_a, doc_b FROM exact)
        |  WHERE doc_a IN (SELECT doc_id FROM newdoc)
        |     OR doc_b IN (SELECT doc_id FROM newdoc)),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM inc
        |  UNION ALL SELECT doc_b, doc_a FROM inc),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node),
        |bt AS (SELECT cl.doc_id, cl.cluster_id
        |       FROM cl JOIN newdoc USING (doc_id)),
        |cmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS dup_of FROM cl
        |  WHERE doc_id NOT IN (SELECT doc_id FROM newdoc)
        |  GROUP BY cluster_id),
        |bmin AS (
        |  SELECT cluster_id, MIN(doc_id) AS _bmin FROM bt GROUP BY cluster_id)
        |SELECT bt.doc_id, cmin.dup_of,
        |  (cmin.dup_of IS NULL AND bt.doc_id = bmin._bmin) AS keep
        |FROM bt LEFT JOIN cmin USING (cluster_id)
        |JOIN bmin USING (cluster_id)
        |ORDER BY bt.doc_id""".stripMargin,

    // the union graph of all three modality edge families, walked with
    // the shared recursive-CTE shape; split/keep arithmetic is q157's,
    // applied to the UNIFIED cluster id
    "q160_multimodal_manifest" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM documents a
        |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |media AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND bit_count(xor(a.doc_id, b.doc_id)) <= 3),
        |tedge AS (
        |  SELECT doc_a, doc_b FROM jac
        |  UNION SELECT doc_a, doc_b FROM exact),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM tedge
        |  UNION SELECT doc_b, doc_a FROM tedge
        |  UNION SELECT doc_a, doc_b FROM media
        |  UNION SELECT doc_b, doc_a FROM media),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node),
        |-- NOTE: under WITH RECURSIVE, DuckDB does NOT dedup a CTE's
        |-- top-level UNION (it parses as the recursive-union form), so
        |-- the incidence sets dedup explicitly
        |td AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM tedge
        |  UNION ALL SELECT doc_b FROM tedge)),
        |md AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM media
        |  UNION ALL SELECT doc_b FROM media))
        |SELECT cl.doc_id, cl.cluster_id,
        |  cl.doc_id = cl.cluster_id AS keep,
        |  CASE WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |         THEN 'train'
        |       WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  td.doc_id IS NOT NULL AS text_dup,
        |  md.doc_id IS NOT NULL AS image_dup,
        |  md.doc_id IS NOT NULL AS audio_dup
        |FROM cl LEFT JOIN td ON td.doc_id = cl.doc_id
        |LEFT JOIN md ON md.doc_id = cl.doc_id
        |ORDER BY cl.doc_id""".stripMargin,

    // v1 of the q92 memo table, recomputed off the source: what the
    // store held at v1's commit instant IS this filter of customer
    "q159_time_travel_ts" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 3
        |ORDER BY c_custkey""".stripMargin,

    // the q156 walk + the fixture's 8s×8s geometry (s = 1 + id%3 ⇒
    // 64s² pixels): per cluster the argmax-pixel member keeps
    "q158_phash_canonical" ->
      s"""WITH RECURSIVE $phashWalkCte,
        |px AS (
        |  SELECT media_id, cluster_id,
        |    64 * (1 + media_id % 3) * (1 + media_id % 3) AS n_pixels
        |  FROM cl),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY n_pixels DESC, media_id ASC) AS rk
        |  FROM px)
        |SELECT media_id, cluster_id, CAST(n_pixels AS BIGINT) AS n_pixels,
        |  rk = 1 AS keep
        |FROM r ORDER BY media_id""".stripMargin,

    // the q63 cluster walk feeding the q101 split hash, applied to the
    // CLUSTER id — the composition is exactly what the operator does
    "q157_cluster_safe_splits" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte,
        |cl AS (
        |  SELECT node AS doc_id, MIN(comp) AS cluster_id
        |  FROM walk GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |         THEN 'train'
        |       WHEN ((cluster_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM cl ORDER BY doc_id""".stripMargin,

    // the q63 CC-walk shape over the q152 popcount edges: cluster id =
    // min reachable id, canonical = the member equal to it
    "q156_phash_clusters" ->
      s"""WITH RECURSIVE $phashWalkCte
        |SELECT media_id, cluster_id,
        |  media_id = cluster_id AS is_canonical
        |FROM cl ORDER BY media_id""".stripMargin,

    "q154_audiohash_pairs" -> hammingPairsOracle,

    "q155_audiohash_banded" -> hammingPairsOracle,

    // independent recomputation from id arithmetic: per valid item the
    // planted ' acct '+IBAN(14) → ' acct '+'<IBAN>' nets 12 chars
    // (card 22→12, ipv6 16+hexlen→11); invalid twins keep their full
    // planted length (IBAN 20, card 22). Base regex classes find
    // nothing, so n_redactions is the ext counts' sum.
    "q151_pii_extended" ->
      """WITH p AS (
        |  SELECT doc_id, length(text) AS nc,
        |    doc_id % 2 AS ni, (doc_id + 1) % 2 AS ncd, (doc_id + 2) % 3 AS n6,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS bi,
        |    CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS bc
        |  FROM documents)
        |SELECT doc_id, CAST(ni AS BIGINT) AS n_iban,
        |  CAST(ncd AS BIGINT) AS n_card, CAST(n6 AS BIGINT) AS n_ip6,
        |  CAST(ni + ncd + n6 AS BIGINT) AS n_redactions,
        |  CAST(nc + 12 * ni + 12 * ncd + 11 * n6 + 20 * bi + 22 * bc
        |    AS BIGINT) AS redacted_len
        |FROM p ORDER BY doc_id""".stripMargin,

    // the q142 arithmetic for the MJPEG path: frame f of media id is a
    // gray v=(11·id+5f)%256 fill with a gray u=(7·id+13f)%256 8×8
    // patch, so each channel sums to 64·u + (w·h−64)·v per frame —
    // exact because the block-aligned grayscale fixture survives JPEG
    // bit-for-bit at all-ones quant tables (MediaSpec pins it)
    "q150_mjpeg_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 16 + 8 * (doc_id % 3) AS w,
        |    8 + 8 * (doc_id % 2) AS h, 1 + doc_id % 3 AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, nf,
        |    (7 * doc_id + 13 * r.i) % 256 AS u,
        |    (11 * doc_id + 5 * r.i) % 256 AS v
        |  FROM g, range(3) r(i) WHERE r.i < nf),
        |s AS (
        |  SELECT doc_id, MIN(w) AS w, MIN(h) AS h, MIN(nf) AS nf,
        |    SUM(64 * u + (w * h - 64) * v) AS cs
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(cs AS BIGINT) AS r_sum, CAST(cs AS BIGINT) AS g_sum,
        |  CAST(cs AS BIGINT) AS b_sum, TRUE AS decoded
        |FROM s ORDER BY media_id""".stripMargin,

    "q148_vocab_churn" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |va AS (
        |  SELECT token FROM t2 WHERE doc_id % 2 = 0
        |  GROUP BY token ORDER BY COUNT(*) DESC, token ASC LIMIT 20),
        |vb AS (
        |  SELECT token FROM t2 WHERE doc_id % 2 = 1
        |  GROUP BY token ORDER BY COUNT(*) DESC, token ASC LIMIT 20),
        |j AS (
        |  SELECT va.token AS ta, vb.token AS tb
        |  FROM va FULL OUTER JOIN vb ON va.token = vb.token)
        |SELECT CAST(COUNT(ta) AS BIGINT) AS n_vocab_a,
        |  CAST(COUNT(tb) AS BIGINT) AS n_vocab_b,
        |  CAST(COUNT(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL THEN 1 END) AS BIGINT) AS n_shared,
        |  round(CAST(COUNT(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL THEN 1 END) AS DOUBLE)
        |    / (COUNT(ta) + COUNT(tb)
        |       - COUNT(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL THEN 1 END)), 6) AS jaccard
        |FROM j""".stripMargin,

    // per-dim means fixed at round-9 decimals (components are exact in
    // double; round-then-cast), products exact (25,18), cosine the one
    // double; mirrors Similarity.centroidDrift
    "q149_embedding_drift" ->
      """WITH ex AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE), 9) AS DECIMAL(21,9)) AS v
        |  FROM embeddings),
        |ma AS (
        |  SELECT dim, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(12,9)) AS m
        |  FROM ex WHERE vec_id % 2 = 0 GROUP BY dim),
        |mb AS (
        |  SELECT dim, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9)
        |    AS DECIMAL(12,9)) AS m
        |  FROM ex WHERE vec_id % 2 = 1 GROUP BY dim),
        |s AS (
        |  SELECT COUNT(*) AS n_dims,
        |    SUM(CAST(ma.m * mb.m AS DECIMAL(38,18))) AS ab,
        |    SUM(CAST(ma.m * ma.m AS DECIMAL(38,18))) AS aa,
        |    SUM(CAST(mb.m * mb.m AS DECIMAL(38,18))) AS bb
        |  FROM ma JOIN mb USING (dim))
        |SELECT CAST(n_dims AS BIGINT) AS n_dims,
        |  CASE WHEN aa > 0 AND bb > 0 THEN
        |    round(CAST(CAST(ab AS VARCHAR) AS DOUBLE) /
        |      (sqrt(CAST(CAST(aa AS VARCHAR) AS DOUBLE)) *
        |       sqrt(CAST(CAST(bb AS VARCHAR) AS DOUBLE))), 6)
        |  END AS centroid_cosine,
        |  round(sqrt(CAST(CAST(aa AS VARCHAR) AS DOUBLE)), 9) AS norm_a,
        |  round(sqrt(CAST(CAST(bb AS VARCHAR) AS DOUBLE)), 9) AS norm_b
        |FROM s""".stripMargin,

    // full drift-report mirror: histograms, add-one shares, ln of the
    // raw ratio at 12 dp (zipfSlope's transcendental rule), exact
    // decimal contributions; decimal→double casts route through
    // VARCHAR (the measured DuckDB cast-rounding hazard)
    "q147_corpus_drift" ->
      """WITH ca AS (
        |  SELECT CAST(floor(length(text) / 50) AS BIGINT) AS bucket,
        |    COUNT(*) AS n_a
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |cb AS (
        |  SELECT CAST(floor(length(text) / 50) AS BIGINT) AS bucket,
        |    COUNT(*) AS n_b
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
        |    COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        |  FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket),
        |t AS (
        |  SELECT bucket, n_a, n_b,
        |    SUM(n_a) OVER () AS ta, SUM(n_b) OVER () AS tb,
        |    COUNT(*) OVER () AS k
        |  FROM j),
        |s AS (
        |  SELECT bucket, n_a, n_b,
        |    CAST(round(CAST(n_a + 1 AS DOUBLE) / (ta + k), 9) AS DECIMAL(10,9)) AS p_a,
        |    CAST(round(CAST(n_b + 1 AS DOUBLE) / (tb + k), 9) AS DECIMAL(10,9)) AS p_b,
        |    CAST(round(ln((CAST(n_a + 1 AS DOUBLE) / (ta + k)) /
        |      (CAST(n_b + 1 AS DOUBLE) / (tb + k))), 12) AS DECIMAL(14,12)) AS lnr
        |  FROM t),
        |c AS (
        |  SELECT bucket, n_a, n_b, p_a, p_b,
        |    CAST(p_a * lnr AS DECIMAL(26,21)) AS contrib
        |  FROM s)
        |SELECT bucket, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(CAST(p_a AS VARCHAR) AS DOUBLE) AS p_a,
        |  CAST(CAST(p_b AS VARCHAR) AS DOUBLE) AS p_b,
        |  round(CAST(CAST(contrib AS VARCHAR) AS DOUBLE), 12) AS kl_contrib,
        |  round(CAST(CAST(SUM(contrib) OVER () AS VARCHAR) AS DOUBLE), 9) AS kl_total
        |FROM c ORDER BY bucket""".stripMargin,

    // Σchannel = c·w·h + 255 − 2c (solid fill, inverted top-left) —
    // the q142 arithmetic with a single frame and its own color rule
    "q146_image_pixels" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
        |    (5 * doc_id + 11) % 256 AS cr,
        |    (7 * doc_id + 3) % 256 AS cg,
        |    (11 * doc_id + 7) % 256 AS cb
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height,
        |  CAST(cr * (w * h) + 255 - 2 * cr AS BIGINT) AS r_sum,
        |  CAST(cg * (w * h) + 255 - 2 * cg AS BIGINT) AS g_sum,
        |  CAST(cb * (w * h) + 255 - 2 * cb AS BIGINT) AS b_sum,
        |  TRUE AS decoded
        |FROM g ORDER BY media_id""".stripMargin,

    "q145_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |freq AS (SELECT token, COUNT(*) AS f FROM t2 GROUP BY token),
        |vocab AS (SELECT token FROM freq ORDER BY f DESC, token ASC LIMIT 20),
        |scored AS (
        |  SELECT d.doc_id, COUNT(*) AS n_tokens,
        |    SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM t2 d LEFT JOIN vocab v USING (token)
        |  GROUP BY d.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_oov AS BIGINT) AS n_oov,
        |  round(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_rate
        |FROM scored ORDER BY doc_id""".stripMargin,

    // full mirror of the lead-lag pipeline: bucket means → exact
    // decimal return differences → lagged leader values via an
    // observation-index self-join (≡ Spark's lag(r, ℓ) window) →
    // per-(pair, lag) Pearson from exact sums → deterministic argmax
    "q144_leadlag_corr" ->
      """WITH base AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |rx AS (
        |  SELECT event_type, bucket,
        |    CAST(round(x - lag(x) OVER (PARTITION BY event_type ORDER BY bucket),
        |      6) AS DECIMAL(18,6)) AS r
        |  FROM perkey),
        |rr AS (
        |  SELECT event_type, bucket, r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
        |  FROM rx WHERE r IS NOT NULL),
        |lagged AS (
        |  SELECT cur.event_type AS key_b, cur.bucket, g.i AS l, prev.r AS rb
        |  FROM rr cur
        |  CROSS JOIN range(4) g(i)
        |  JOIN rr prev ON prev.event_type = cur.event_type
        |    AND prev.rn = cur.rn - g.i),
        |cells AS (
        |  SELECT a.event_type AS key_a, b.key_b, b.l, COUNT(*) AS n,
        |    SUM(a.r) AS sa, SUM(b.rb) AS sb,
        |    SUM(CAST(a.r * b.rb AS DECIMAL(38,12))) AS sab,
        |    SUM(CAST(a.r * a.r AS DECIMAL(38,12))) AS saa,
        |    SUM(CAST(b.rb * b.rb AS DECIMAL(38,12))) AS sbb
        |  FROM rr a JOIN lagged b USING (bucket)
        |  WHERE a.event_type <> b.key_b AND (b.l > 0 OR a.event_type < b.key_b)
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT least(key_a, key_b) AS ka, greatest(key_a, key_b) AS kb,
        |    CASE WHEN key_a < key_b THEN l ELSE -l END AS lag, n,
        |    CASE WHEN n >= 3
        |          AND n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE) > 0
        |          AND n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE) > 0
        |      THEN round((n * CAST(CAST(sab AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE)) /
        |        sqrt((n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE)) *
        |             (n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE))), 6)
        |    END AS corr
        |  FROM cells),
        |best AS (
        |  SELECT ka AS key_a, kb AS key_b, CAST(lag AS INT) AS best_lag,
        |    n AS n_obs, corr,
        |    row_number() OVER (PARTITION BY ka, kb
        |      ORDER BY abs(corr) DESC, abs(lag) ASC, lag ASC) AS rn
        |  FROM scored WHERE corr IS NOT NULL)
        |SELECT key_a, key_b, best_lag, n_obs, corr
        |FROM best WHERE rn = 1 ORDER BY key_a, key_b""".stripMargin,

    // independent recomputation from id arithmetic: nE=id%3 emails of
    // match length 16+digits(id) (+9 for ' contact '), nP=(id+1)%3
    // phones of match length 15 (+6), nI=(id+2)%3 IPs of match length
    // 7+digits(id%256) (+6); tags <EMAIL>/<PHONE>=7 chars, <IP>=4
    "q143_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id, length(text) AS nc,
        |    doc_id % 3 AS ne, (doc_id + 1) % 3 AS np, (doc_id + 2) % 3 AS ni,
        |    length(CAST(doc_id AS VARCHAR)) AS de,
        |    length(CAST(doc_id % 256 AS VARCHAR)) AS di
        |  FROM documents)
        |SELECT doc_id, CAST(ne + np + ni AS BIGINT) AS n_redactions,
        |  CAST(nc + ne * (25 + de) + np * 21 + ni * (13 + di)
        |    - ne * (16 + de) + ne * 7 - np * 15 + np * 7
        |    - ni * (7 + di) + ni * 4 AS BIGINT) AS redacted_len
        |FROM p ORDER BY doc_id""".stripMargin,

    "q140_portfolio_nav" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rf,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bucket,
        |    MAX(CASE WHEN rf = 1 THEN v END) AS o,
        |    MAX(CASE WHEN rl = 1 THEN v END) AS c
        |  FROM ticks GROUP BY event_type, bucket),
        |r AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(c - o AS DOUBLE) / CAST(o AS DOUBLE), 9)
        |      AS DECIMAL(16,9)) AS ret
        |  FROM bars WHERE o > 0),
        |daily AS (
        |  SELECT bucket, COUNT(*) AS n_keys,
        |    CAST(round(CAST(CAST(SUM(ret) AS VARCHAR) AS DOUBLE) / COUNT(*), 9)
        |      AS DECIMAL(16,9)) AS pr
        |  FROM r GROUP BY bucket),
        |l AS (
        |  SELECT bucket, n_keys, pr,
        |    CASE WHEN pr > -1 THEN CAST(round(
        |      ln(1.0 + CAST(CAST(pr AS VARCHAR) AS DOUBLE)), 12)
        |      AS DECIMAL(16,12)) END AS lnr
        |  FROM daily),
        |c AS (
        |  SELECT bucket, n_keys, pr,
        |    MAX(CASE WHEN lnr IS NULL THEN 1 ELSE 0 END) OVER cw AS hasnull,
        |    SUM(lnr) OVER cw AS cln
        |  FROM l WINDOW cw AS (ORDER BY bucket ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bucket, n_keys,
        |  CAST(CAST(pr AS VARCHAR) AS DOUBLE) AS port_return,
        |  CASE WHEN hasnull = 0 THEN
        |    CAST(CAST(cln AS VARCHAR) AS DOUBLE) END AS log_nav
        |FROM c ORDER BY bucket""".stripMargin
  )
}
