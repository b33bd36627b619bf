package graft.oracles

/** DuckDB oracle SQL — first third of the base oracle map (entries moved
  * VERBATIM from SparkEntry.oracleSqlBase, round-10 verdict item 7;
  * assembled by [[Oracles.all]]). Generated entries build from the
  * shared [[OracleCtes]] fragments.
  */
private[oracles] object OraclesA {
  import OracleCtes._
  import graft.text.Curation.FixedBpeMerges

  def map: Map[String, String] = Map(
    "q32_minhash_lsh" -> jaccardPairsOracle,

    // full independent simhash recomputation: same tokenization as the
    // Spark side (whitespace collapse), token hash = first 16 hex chars
    // of md5 (== first 8 digest bytes big-endian, the exact value
    // SimHashExpr.tokenHash computes), per-bit majority vote over the
    // token STREAM (duplicates counted), pairwise hamming over the 64
    // signature bits, threshold <= 3 — mirrors Dedup.simhashPairs
    "q33_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS hi,
        |    CAST('0x' || substr(md5(token), 9, 8) AS BIGINT) AS lo
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, r.i,
        |    CASE WHEN r.i < 32 THEN (lo >> CAST(r.i AS INT)) & 1
        |         ELSE (hi >> CAST(r.i - 32 AS INT)) & 1 END AS b
        |  FROM th, range(64) r(i)),
        |sig AS (
        |  SELECT doc_id, i,
        |    CASE WHEN 2 * SUM(b) > COUNT(*) THEN 1 ELSE 0 END AS s
        |  FROM bits GROUP BY doc_id, i),
        |ham AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    SUM(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END) AS hamming
        |  FROM sig a JOIN sig b ON a.i = b.i AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        |FROM ham WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    "q37_fingerprint" ->
      """SELECT doc_id, TRUE AS dup_consistent, TRUE AS collision_free
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q01_gold_daily_stats" ->
      """WITH ranked AS (
        |  SELECT CAST(l_shipdate AS DATE) AS partition_date, l_extendedprice, l_quantity,
        |         rank() OVER (PARTITION BY CAST(l_shipdate AS DATE)
        |                      ORDER BY l_extendedprice * l_quantity DESC) AS r
        |  FROM lineitem)
        |SELECT partition_date,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_market_cap,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS n_rows
        |FROM ranked WHERE r <= 10
        |GROUP BY partition_date ORDER BY partition_date""".stripMargin,

    "q02_dedup_latest" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q03_bronze_enrich" ->
      """SELECT event_id, user_id, event_type,
        |  COALESCE(value, 0.0) AS value_filled,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  CAST(ts AS DATE) AS partition_date
        |FROM events ORDER BY event_id""".stripMargin,

    "q04_distinct_dates" ->
      "SELECT DISTINCT CAST(l_shipdate AS DATE) AS partition_date FROM lineitem ORDER BY partition_date",

    "q05_top1_global" ->
      "SELECT event_id, user_id, event_type, value FROM events ORDER BY value DESC, event_id LIMIT 1",

    "q06_cross_join" ->
      "SELECT n_name, r_name FROM nation CROSS JOIN region ORDER BY n_name, r_name",

    "q07_silver_casts" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,8)) AS DOUBLE), 8) AS price_dec,
        |  ROUND(CAST(CAST(l_quantity AS DECIMAL(20,2)) AS DOUBLE), 2) AS qty_dec,
        |  l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q08_partition_counts" ->
      """SELECT CAST(o_orderdate AS DATE) AS partition_date,
        |  COUNT(*) AS n_orders,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_pipeline_gold" ->
      """WITH silver AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |ranked AS (
        |  SELECT CAST(ts AS DATE) AS partition_date, value,
        |         rank() OVER (PARTITION BY CAST(ts AS DATE) ORDER BY value DESC) AS r
        |  FROM silver)
        |SELECT partition_date,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_market_cap,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS n_rows
        |FROM ranked WHERE r <= 10
        |GROUP BY partition_date ORDER BY partition_date""".stripMargin,

    "q10_join_star" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q11_join_fact" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       CAST(1.0 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q12_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q13_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q14_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q15_window_lag" ->
      """SELECT event_id, user_id, value,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q16_window_frame" ->
      """SELECT event_id, user_id,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS moving_sum,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos_in_key
        |FROM events ORDER BY event_id""".stripMargin,

    "q17_set_ops" ->
      """SELECT 'both' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |UNION ALL
        |SELECT 'purchase_only' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |ORDER BY tag, user_id""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q19_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS upper_name,
        |  lower(p_brand) AS lower_brand,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  replace(p_name, ' ', '_') AS snake_name,
        |  CAST(strpos(p_type, 'a') AS BIGINT) AS a_pos,
        |  reverse(p_name) AS rev_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q21_agg_funcs" ->
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  MIN(value) AS min_value,
        |  MAX(value) AS max_value,
        |  MIN(ts) AS first_ts,
        |  MAX(ts) AS last_ts,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q22_asof_join" ->
      """SELECT p.event_id, p.user_id, p.value,
        |  (SELECT c.value FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_value
        |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin,

    "q23_range_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_shipped_90d
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q24_histogram" ->
      """SELECT CAST(FLOOR(value / 25) * 25 AS BIGINT) AS bucket_lo,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q25_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q26_cube" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q28_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q38_embed_neardup" -> embedNearDupOracle,
    "q39_embed_neardup_lsh" -> embedNearDupOracle,

    "q27_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view",
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS "error"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q29_grouping_sets" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q30_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q31_jaccard_pairs" -> jaccardPairsOracle,

    "q34_lang_id" ->
      // scoring SQL generated from TextStats.LangProfiles — the same
      // literal the engine scores with (see langOracle helpers below)
      s"""WITH t AS (
        |  SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |$langScoreSelectSql
        |  FROM t)
        |SELECT doc_id, $langScoreCols,
        |  $langPredCaseSql AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q187_langid_eval" ->
      s"""WITH fx(fix_id, lang, text) AS (VALUES
        |$langFixtureValuesSql),
        |t AS (SELECT lang, ' ' || lower(text) || ' ' AS t FROM fx),
        |sc AS (
        |  SELECT lang,
        |$langScoreSelectSql
        |  FROM t),
        |p AS (SELECT lang, $langPredCaseSql AS pred_lang FROM sc)
        |SELECT lang AS true_lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS accuracy
        |FROM p GROUP BY lang ORDER BY lang""".stripMargin,

    "q186_guard_report" ->
      s"""WITH $shingleCte,
        |spread AS (
        |  SELECT doc_id,
        |    ${spreadBitsSql("doc_id")} AS h
        |  FROM documents),
        |chunks AS (
        |  SELECT cj.j AS chunk, (h >> (16 * cj.j)) & 65535 AS ck
        |  FROM spread CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) cj),
        |m AS (
        |${guardRowSql("hot_shingle", "jaccardPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM sh GROUP BY shingle)")}
        |UNION ALL
        |${guardRowSql("hot_chunk_image", "phashBandedPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM chunks GROUP BY chunk, ck)")}
        |UNION ALL
        |${guardRowSql("hot_chunk_audio", "audioHashBandedPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM chunks GROUP BY chunk, ck)")}
        |UNION ALL
        |${guardRowSql("exact_pairs", "embedNearDup",
             "SELECT COUNT(*) FROM embeddings")}
        |UNION ALL
        |${guardRowSql("knn_bucket", "knnGraphBucketed",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM embeddings GROUP BY label)")}
        |UNION ALL
        |${guardRowSql("instruments", "corrMatrix",
             "SELECT COUNT(DISTINCT event_type) FROM events")}
        |UNION ALL
        |${guardRowSql("exact_percentile_distinct", "winsorizedStats",
             "SELECT COALESCE(MAX(c), 0) FROM (" +
               "SELECT COUNT(DISTINCT CAST(value AS DECIMAL(18,6))) AS c " +
               "FROM events WHERE value IS NOT NULL GROUP BY event_type)")}
        |UNION ALL
        |${guardRowSql("corpus_slices", "corpusOverlap",
             "SELECT COUNT(DISTINCT source) FROM documents")}
        |UNION ALL
        |${guardRowSql("fuzzy_block", "fuzzyPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) AS c FROM (" +
               "SELECT list_extract(regexp_split_to_array(p_name, ' '), -1) AS blk " +
               "FROM (SELECT p_name FROM part GROUP BY p_name)) GROUP BY blk)")}
        |UNION ALL
        |${guardRowSql("hot_fingerprint", "winnowOverlapPairs",
             "SELECT COALESCE(MAX(c), 0) FROM (WITH " + winnowCte +
               " SELECT COUNT(*) AS c FROM " +
               "(SELECT DISTINCT doc_id, fp FROM wfp) GROUP BY fp)")}
        |UNION ALL
        |${guardRowSql("eval_shingles", "contamination",
             "SELECT COUNT(DISTINCT shingle) FROM sh WHERE doc_id IN " +
               "(SELECT doc_id FROM documents WHERE source = 'src0')")}
        |UNION ALL
        |${guardRowSql("hot_ivf_list", "ivfAdcProbeJoin",
             """SELECT COALESCE(MAX(c), 0) FROM (
               |  SELECT COUNT(*) AS c FROM (
               |    SELECT e.vec_id, c2.cid,
               |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
               |        (list_dot_product(ev, cv) /
               |          (sqrt(list_dot_product(ev, ev))
               |            * sqrt(list_dot_product(cv, cv)))) DESC,
               |        c2.cid DESC) AS rn
               |    FROM (SELECT vec_id,
               |            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
               |          FROM embeddings) e
               |    CROSS JOIN (
               |      SELECT vec_id AS cid,
               |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
               |      FROM embeddings
               |      WHERE sqrt(list_dot_product(
               |          list_transform(embedding, x -> CAST(x AS DOUBLE)),
               |          list_transform(embedding, x -> CAST(x AS DOUBLE)))) > 0
               |        AND vec_id % 31 = 0
               |      ORDER BY vec_id ASC LIMIT 16) c2)
               |  WHERE rn = 1 GROUP BY cid)""".stripMargin)})
        |SELECT guard, operator, bound, measured,
        |  CAST(measured AS DOUBLE) / bound AS load_ratio,
        |  measured > bound AS would_refuse
        |FROM m ORDER BY guard""".stripMargin,

    "q188_dup_spans" ->
      s"""WITH $dupSpanCte
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "q198_hashed_tfidf" ->
      s"""WITH ${hashedTfidfCte(64)}
        |SELECT doc_id, bucket, CAST(n_terms AS BIGINT) AS n_terms, weight
        |FROM wts WHERE doc_id < 10 ORDER BY doc_id, bucket""".stripMargin,

    "q199_text_ann" ->
      s"""WITH ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |qh AS (SELECT v AS qv FROM nz WHERE doc_id = 0)
        |SELECT c.doc_id,
        |  round(list_dot_product(c.v, qv) /
        |    (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(qv, qv))),
        |    6) AS cos_sim
        |FROM nz c, qh WHERE c.doc_id <> 0
        |ORDER BY cos_sim DESC, doc_id LIMIT 10""".stripMargin,

    "q200_text_semantic_dedup" ->
      s"""WITH ${hashedTfidfCte(64)},
        |grid AS (SELECT d.doc_id, r.i FROM documents d, range(64) r(i)),
        |vecs AS (
        |  SELECT g.doc_id, list(COALESCE(w.weight, 0.0) ORDER BY g.i) AS v
        |  FROM grid g LEFT JOIN wts w
        |    ON w.doc_id = g.doc_id AND w.bucket = g.i
        |  GROUP BY g.doc_id),
        |nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v))
        |        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, cos_sim FROM pairs
        |WHERE cos_sim >= 0.95 ORDER BY id_a, id_b""".stripMargin,

    "q195_top_dup_spans" ->
      s"""WITH $dupSpanCte,
        |st AS (
        |  SELECT s.doc_id,
        |    array_to_string(list_slice(t.w, CAST(s.span_start + 1 AS INT),
        |      CAST(s.span_end + 1 AS INT)), ' ') AS span_text,
        |    s.span_end - s.span_start + 1 AS span_tokens
        |  FROM spans s JOIN toks t USING (doc_id))
        |SELECT span_text, COUNT(*) AS n_occurrences,
        |  COUNT(DISTINCT doc_id) AS n_docs,
        |  CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
        |FROM st GROUP BY span_text
        |ORDER BY dup_tokens DESC, span_text ASC LIMIT 20""".stripMargin,

    "q192_append_dup_spans" ->
      s"""WITH $dupSpanCte
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens
        |FROM spans
        |WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')
        |ORDER BY doc_id, span_start""".stripMargin,

    "q193_decontaminate_spans" ->
      s"""WITH $contamSpanCte
        |SELECT doc_id, span_start, span_end,
        |  span_end - span_start + 1 AS span_tokens
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,

    "q189_strip_dup_spans" ->
      s"""WITH $dupSpanCte,
        |wkept AS (
        |  SELECT w.doc_id, CAST(w.i - 1 AS BIGINT) AS pos, w.word
        |  FROM words w
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = w.doc_id
        |      AND w.i - 1 BETWEEN s.span_start AND s.span_end)),
        |ag AS (
        |  SELECT doc_id, COUNT(*) AS kept,
        |    string_agg(word, ' ' ORDER BY pos ASC) AS clean_text
        |  FROM wkept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(len(t.w) - COALESCE(ag.kept, 0) AS BIGINT) AS n_removed,
        |  COALESCE(ag.clean_text, '') AS clean_text
        |FROM toks t LEFT JOIN ag USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    "q35_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(
        |      regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      t -> t IN ('the','a','and','of','to','in','is','on'))) AS BIGINT) AS n_stopwords
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens, n_stopwords,
        |  CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_token_len,
        |  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio
        |FROM base ORDER BY doc_id""".stripMargin,

    "q36_token_totals" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q45_decile_stats" ->
      """SELECT decile, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM (
        |  SELECT value,
        |    CAST(ntile(10) OVER (ORDER BY value ASC, event_id ASC) AS BIGINT) AS decile
        |  FROM events)
        |GROUP BY decile ORDER BY decile""".stripMargin,

    "q40_cosine_topk" -> cosineTopKOracle,

    // the IVF probe's recall is total on this corpus at ivfTopK's
    // default parameters (stride-init centroids, configured nProbe), so
    // the exact brute-force oracle applies verbatim — the gate asserts
    // the probe pruning loses nothing, the q32/q31 precedent
    "q41_ivf_topk" -> cosineTopKOracle,

    // persisted-index probe: same search semantics as q41 (identical
    // centroids + probe width, different physical path), so the same
    // exact oracle applies — the gate additionally proves the
    // partition-pruned index scan returns the very rows the full scan does
    "q81_ivf_probe" -> cosineTopKOracle,

    // filtered ANN (q243): exact twin = brute-force cosine top-10
    // UNDER the predicate (label = 1, query vec 0 excluded). The
    // operator's adaptive switch takes the exact prefilter path on a
    // predicate this selective (≤10% of the corpus), so the oracle is
    // corpus-unconditional — no recall premise; the broad-predicate
    // probe path is law-tested in RetrievalSpec instead
    "q243_filtered_ann" ->
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id <> 0 AND label = 1)
        |SELECT vec_id,
        |  round(list_dot_product(v, qv) /
        |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        |FROM c, q
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    // q245: greedy MMR unrolled into 5 selection steps — generated by
    // the mmrOracleSql builder (sequential recurrence, the q225
    // BPE-train unroll precedent); scores keep the engine's exact
    // double constants, see the builder's scaladoc
    "q245_mmr_rerank" -> mmrOracleSql(0L, 5, 20, 0.7),

    "q82_vwap" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND json_extract_string(props, '$.k') IS NOT NULL)
        |SELECT event_type, day, COUNT(*) AS n_trades,
        |  round(CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_qty,
        |  CASE WHEN SUM(CAST(qty AS DECIMAL(18,6))) <> 0 THEN
        |    round(CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(qty AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DOUBLE)
        |      / CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE), 6) END AS vwap
        |FROM ev GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,

    "q83_rolling_volatility" ->
      """WITH w AS (
        |  SELECT event_id, event_type,
        |    COUNT(*) OVER fr AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) OVER fr AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) OVER fr AS s2
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, CAST(n AS BIGINT) AS roll_n,
        |  round(CAST(s1 AS DOUBLE) / n, 6) AS roll_mean,
        |  CASE WHEN n > 1 THEN
        |    round(sqrt(greatest(0.0,
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))), 6) END AS roll_std
        |FROM w ORDER BY event_id""".stripMargin,

    "q84_max_drawdown" ->
      """WITH p AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    MAX(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY event_type
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type,
        |  round(CAST(MAX(pk - v) AS DOUBLE), 6) AS max_drawdown,
        |  round(CAST(MAX(pk) AS DOUBLE), 6) AS peak,
        |  COUNT(*) AS n_ticks
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,

    // mse via the dot-product identity dot(x,x) - 2s·dot(x,q) + s²·dot(q,q)
    // in BOTH engines, with floor(v/s + 0.5) quantization (exact in
    // doubles — no round-half-mode divergence), so doubles agree bitwise
    "q86_quantize_embeddings" ->
      """WITH x AS (
        |  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, xd,
        |    list_max(list_transform(xd, v -> abs(v))) AS am
        |  FROM x),
        |q AS (
        |  SELECT vec_id, xd, am / 127.0 AS sc,
        |    list_transform(xd, v -> floor(v / (am / 127.0) + 0.5)) AS qd
        |  FROM s WHERE am > 0)
        |SELECT vec_id,
        |  CAST(len(qd) AS BIGINT) AS n_dims,
        |  round(sc, 9) AS scale,
        |  round((list_dot_product(xd, xd) - 2.0 * sc * list_dot_product(xd, qd)
        |    + sc * sc * list_dot_product(qd, qd)) / len(qd), 12) AS mse,
        |  round(list_max(list_transform(xd,
        |    v -> abs(v - sc * floor(v / sc + 0.5)))), 9) AS max_abs_err
        |FROM q ORDER BY vec_id""".stripMargin,

    // edge CTE + symmetrize + three unrolled label-propagation rounds;
    // counts are integers and the tiebreak is total, so no float concerns
    "q90_label_prop" ->
      """WITH em AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM em a JOIN em b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |knn AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (
        |      PARTITION BY src ORDER BY cos_sim DESC, dst) AS rnk
        |    FROM pairs) WHERE rnk <= 5),
        |eds AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
        |nodes AS (SELECT DISTINCT src AS node FROM eds),
        |seeds AS (
        |  SELECT vec_id AS node, CAST(label AS BIGINT) AS seed_label
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |l0 AS (
        |  SELECT n.node, s.seed_label AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
        |l1 AS (
        |  SELECT n.node, COALESCE(s.seed_label, b.nl) AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        |  LEFT JOIN (
        |    SELECT src AS node, nl FROM (
        |      SELECT src, nl, row_number() OVER (
        |        PARTITION BY src ORDER BY c DESC, nl ASC) AS r
        |      FROM (SELECT e.src, l.label AS nl, COUNT(*) AS c
        |            FROM eds e JOIN l0 l ON l.node = e.dst
        |            WHERE l.label IS NOT NULL GROUP BY e.src, l.label))
        |    WHERE r = 1) b ON b.node = n.node),
        |l2 AS (
        |  SELECT n.node, COALESCE(s.seed_label, b.nl) AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        |  LEFT JOIN (
        |    SELECT src AS node, nl FROM (
        |      SELECT src, nl, row_number() OVER (
        |        PARTITION BY src ORDER BY c DESC, nl ASC) AS r
        |      FROM (SELECT e.src, l.label AS nl, COUNT(*) AS c
        |            FROM eds e JOIN l1 l ON l.node = e.dst
        |            WHERE l.label IS NOT NULL GROUP BY e.src, l.label))
        |    WHERE r = 1) b ON b.node = n.node),
        |l3 AS (
        |  SELECT n.node, COALESCE(s.seed_label, b.nl) AS label
        |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        |  LEFT JOIN (
        |    SELECT src AS node, nl FROM (
        |      SELECT src, nl, row_number() OVER (
        |        PARTITION BY src ORDER BY c DESC, nl ASC) AS r
        |      FROM (SELECT e.src, l.label AS nl, COUNT(*) AS c
        |            FROM eds e JOIN l2 l ON l.node = e.dst
        |            WHERE l.label IS NOT NULL GROUP BY e.src, l.label))
        |    WHERE r = 1) b ON b.node = n.node)
        |SELECT node AS vec_id, label AS pred_label
        |FROM l3 ORDER BY vec_id""".stripMargin,

    "q91_twap" ->
      """WITH t AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value,
        |    epoch_us(ts) AS tu,
        |    lead(epoch_us(ts)) OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS nxt
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, day,
        |  COUNT(*) AS n_intervals,
        |  round(CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * (nxt - tu) AS DECIMAL(38,6))) AS DOUBLE)
        |    / CAST(SUM(nxt - tu) AS DOUBLE), 6) AS twap
        |FROM t WHERE nxt IS NOT NULL
        |GROUP BY event_type, day HAVING SUM(nxt - tu) > 0
        |ORDER BY event_type, day""".stripMargin,

    "q92_change_capture" ->
      """WITH b AS (SELECT * FROM customer WHERE c_custkey % 10 <> 3),
        |a AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
        |         ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 10 <> 4)
        |SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
        |  CASE WHEN b.c_custkey IS NULL THEN 'insert'
        |       WHEN a.c_custkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  -- whole-side selection (deletes report before, others after),
        |  -- NOT per-column COALESCE: an update that nulls a field must
        |  -- surface the NULL, exactly as changeCapture's struct pick does
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_name ELSE a.c_name END AS c_name,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_nationkey ELSE a.c_nationkey END AS c_nationkey,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_acctbal ELSE a.c_acctbal END AS c_acctbal,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_mktsegment ELSE a.c_mktsegment END AS c_mktsegment
        |FROM b FULL OUTER JOIN a ON a.c_custkey = b.c_custkey
        |WHERE b.c_custkey IS NULL OR a.c_custkey IS NULL
        |   OR (a.c_name, a.c_nationkey, a.c_acctbal, a.c_mktsegment)
        |      IS DISTINCT FROM
        |      (b.c_name, b.c_nationkey, b.c_acctbal, b.c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,

    "q94_rsi" ->
      """WITH d AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(value AS DECIMAL(18,6))
        |      - lag(CAST(value AS DECIMAL(18,6))) OVER w AS delta
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |f AS (
        |  SELECT event_id, event_type,
        |    SUM(CASE WHEN delta > 0 THEN delta WHEN delta <= 0 THEN 0 END) OVER fr AS g,
        |    SUM(CASE WHEN delta < 0 THEN -delta WHEN delta >= 0 THEN 0 END) OVER fr AS l,
        |    COUNT(delta) OVER fr AS n_deltas
        |  FROM d
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, n_deltas,
        |  CASE WHEN g + l > 0
        |       THEN round(100.0 * CAST(g AS DOUBLE) / CAST(g + l AS DOUBLE), 6)
        |  END AS rsi
        |FROM f ORDER BY event_id""".stripMargin,

    "q95_fuzzy_match" ->
      """WITH nm AS (
        |  SELECT p_name, min(p_partkey) AS rep_id, count(*) AS n_recs
        |  FROM part GROUP BY 1),
        |side AS (
        |  SELECT rep_id AS id, p_name AS name,
        |    string_split(p_name, ' ')[-1] AS blk, n_recs
        |  FROM nm)
        |SELECT a.id AS a_id, b.id AS b_id, a.name AS a_name, b.name AS b_name,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist,
        |  a.n_recs AS a_recs, b.n_recs AS b_recs
        |FROM side a JOIN side b ON b.blk = a.blk AND a.id < b.id
        |WHERE abs(length(a.name) - length(b.name)) <= 2
        |  AND levenshtein(a.name, b.name) <= 2
        |ORDER BY a_id, b_id""".stripMargin,

    "q96_hash_sample" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    ((doc_id % 1000000007) * 2654435761) % 1000000007 AS hh
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY hh ASC, doc_id ASC)
        |      AS sample_rank
        |  FROM h)
        |SELECT source, doc_id, sample_rank FROM r
        |WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin,

    "q97_ewma" ->
      """WITH l AS (
        |  SELECT event_id, event_type,
        |    list(CAST(value AS DOUBLE)) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id, event_type,
        |  round(list_reduce(lst, (acc, x) -> acc * 0.75 + 0.25 * x), 6) AS ewma
        |FROM l ORDER BY event_id""".stripMargin,

    "q98_beta" ->
      """WITH base AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |market AS (
        |  SELECT bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS m
        |  FROM base GROUP BY bucket),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |s AS (
        |  SELECT p.event_type, COUNT(*) AS n,
        |    SUM(p.x) AS sx, SUM(m.m) AS sm,
        |    SUM(CAST(p.x * m.m AS DECIMAL(38,18))) AS sxm,
        |    SUM(CAST(m.m * m.m AS DECIMAL(38,18))) AS smm
        |  FROM perkey p JOIN market m USING (bucket) GROUP BY p.event_type)
        |SELECT event_type, n,
        |  CASE WHEN n * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) > 0
        |    THEN round((n * CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE)) /
        |      (n * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6)
        |  END AS beta
        |FROM s ORDER BY event_type""".stripMargin,

    "q99_up_streaks" ->
      """WITH d AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(value AS DECIMAL(18,6)) - lag(CAST(value AS DECIMAL(18,6)))
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS delta
        |  FROM events WHERE value IS NOT NULL),
        |i AS (
        |  SELECT event_type, delta > 0 AS up,
        |    SUM(CASE WHEN delta > 0 THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM d),
        |st AS (SELECT event_type, isl, COUNT(*) AS len FROM i WHERE up GROUP BY 1, 2),
        |m AS (SELECT event_type, MAX(len) AS max_streak FROM st GROUP BY 1)
        |SELECT e.event_type, CAST(COALESCE(m.max_streak, 0) AS BIGINT) AS max_streak
        |FROM (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL) e
        |LEFT JOIN m USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // levels mirror q97 (ewma fold), q94 (RSI frame), q82 (decimal
    // VWAP), q76 (power-sum moments) shape-for-shape, each reduced to
    // its latest row per key, then the scoring projection — so every
    // double agrees bitwise with the Spark side
    "q101_split_assign" ->
      """SELECT doc_id, source,
        |  CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |         THEN 'train'
        |       WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q102_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
        |  FROM documents
        |  WHERE len(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) >= 2),
        |bg AS (
        |  SELECT ts[i] || ' ' || ts[i + 1] AS bigram
        |  FROM toks, unnest(range(1, len(ts))) AS t(i))
        |SELECT bigram, count(*) AS freq FROM bg
        |GROUP BY 1 HAVING count(*) >= 30 ORDER BY bigram""".stripMargin,

    "q103_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000000007) * 2654435761 + 3 * 976369)
        |      % 1000000007 AS hh
        |  FROM documents)
        |SELECT doc_id, hh % 8 AS shard,
        |  row_number() OVER (PARTITION BY hh % 8 ORDER BY hh ASC, doc_id ASC)
        |    AS shard_pos
        |FROM h ORDER BY doc_id""".stripMargin,

    "q104_length_quantiles" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(
        |      trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  round(quantile_cont(n_tokens, 0.5), 6) AS p50,
        |  round(quantile_cont(n_tokens, 0.9), 6) AS p90,
        |  round(quantile_cont(n_tokens, 0.99), 6) AS p99
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "q105_incremental_agg" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS value
        |  FROM events WHERE value IS NOT NULL),
        |af AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 10 = 7
        |         THEN CAST(value * 2 AS DECIMAL(18,6)) ELSE value END AS value
        |  FROM ev)
        |SELECT event_type, count(*) AS n,
        |  CAST(SUM(value) AS DOUBLE) AS total
        |FROM af GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q106_corr_matrix" ->
      """WITH base AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |p AS (
        |  SELECT a.event_type AS key_a, b.event_type AS key_b,
        |    a.x AS xa, b.x AS xb
        |  FROM perkey a JOIN perkey b USING (bucket)
        |  WHERE a.event_type < b.event_type),
        |s AS (
        |  SELECT key_a, key_b, COUNT(*) AS n,
        |    SUM(xa) AS sa, SUM(xb) AS sb,
        |    SUM(CAST(xa * xb AS DECIMAL(38,18))) AS sab,
        |    SUM(CAST(xa * xa AS DECIMAL(38,18))) AS saa,
        |    SUM(CAST(xb * xb AS DECIMAL(38,18))) AS sbb
        |  FROM p GROUP BY key_a, key_b)
        |SELECT key_a, key_b, n,
        |  CASE WHEN n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE) > 0
        |        AND n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE) > 0
        |    THEN round((n * CAST(CAST(sab AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE)) /
        |      sqrt((n * CAST(CAST(saa AS VARCHAR) AS DOUBLE) - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sa AS VARCHAR) AS DOUBLE)) *
        |           (n * CAST(CAST(sbb AS VARCHAR) AS DOUBLE) - CAST(CAST(sb AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE))), 6)
        |  END AS corr
        |FROM s ORDER BY key_a, key_b""".stripMargin,

    "q107_skew_report" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
        |             CAST(COUNT(*) AS BIGINT) AS nkeys FROM c),
        |r AS (
        |  SELECT user_id, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rank
        |  FROM c)
        |SELECT user_id, cnt, rank,
        |  CAST(cnt AS DOUBLE) / total AS share,
        |  CAST(cnt AS DOUBLE) * nkeys / total AS imbalance
        |FROM r, t WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q108_underwater_spell" ->
      """WITH ev AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, ts, event_id, v, max(v) OVER w AS rm
        |  FROM ev
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |f AS (
        |  SELECT event_type,
        |    CASE WHEN v < rm THEN 1 ELSE 0 END AS uw,
        |    SUM(CASE WHEN v < rm THEN 0 ELSE 1 END) OVER w2 AS isl
        |  FROM r
        |  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |g AS (
        |  SELECT event_type, isl, CAST(SUM(uw) AS BIGINT) AS len
        |  FROM f GROUP BY event_type, isl)
        |SELECT event_type, CAST(MAX(len) AS BIGINT) AS max_underwater_ticks
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q109_dedup_rate" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte,
        |cl AS (
        |  SELECT node AS doc_id, node = MIN(comp) AS is_canonical
        |  FROM walk GROUP BY node)
        |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN cl.is_canonical THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_canonical,
        |  CAST(COUNT(*) - SUM(CASE WHEN cl.is_canonical THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS dup_share
        |FROM cl JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q110_split_leakage" ->
      s"""WITH $shingleCte,
        |$jacPairsCte,
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |           THEN 'train'
        |         WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT j.doc_a, j.doc_b, sa.split AS split_a, sb.split AS split_b
        |FROM jac j
        |JOIN sp sa ON sa.doc_id = j.doc_a
        |JOIN sp sb ON sb.doc_id = j.doc_b
        |WHERE sa.split <> sb.split
        |ORDER BY j.doc_a, j.doc_b""".stripMargin,

    "q111_token_budget" ->
      """WITH sp AS (
        |  SELECT text,
        |    CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 80
        |           THEN 'train'
        |         WHEN ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 90
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(SUM(len(regexp_split_to_array(
        |    trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "q112_volume_concentration" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |bk AS (
        |  SELECT day, event_type, CAST(SUM(qty) AS BIGINT) AS w
        |  FROM ev GROUP BY day, event_type)
        |SELECT day, count(*) AS n_members,
        |  CAST(SUM(w) AS BIGINT) AS total_weight,
        |  CASE WHEN SUM(w) <> 0 THEN
        |    CAST(SUM(CAST(CAST(w AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
        |        AS DECIMAL(38,0))) AS DOUBLE)
        |      / (CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE))
        |  END AS hhi
        |FROM bk GROUP BY day ORDER BY day""".stripMargin,

    "q113_bollinger" ->
      """WITH w AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    COUNT(*) OVER fr AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) OVER fr AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) OVER fr AS s2
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT event_id, event_type, v,
        |    round(CAST(s1 AS DOUBLE) / n, 6) AS mean,
        |    CASE WHEN n > 1 THEN
        |      round(sqrt(greatest(0.0,
        |        (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))), 6) END AS std
        |  FROM w),
        |b AS (
        |  SELECT event_id, event_type, v, mean,
        |    CASE WHEN std IS NOT NULL THEN round(mean + 2.0 * std, 6) END AS up,
        |    CASE WHEN std IS NOT NULL THEN round(mean - 2.0 * std, 6) END AS lo,
        |    std
        |  FROM m)
        |SELECT event_id, event_type, mean AS bb_mid, up AS bb_upper,
        |  lo AS bb_lower,
        |  CASE WHEN up > lo THEN
        |    round((CAST(v AS DOUBLE) - lo) / (up - lo), 6) END AS pct_b
        |FROM b ORDER BY event_id""".stripMargin,

    "q114_sharpe" ->
      """WITH b AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_returns, SUM(r) AS s1,
        |    SUM(CAST(r * r AS DECIMAL(38,18))) AS s2
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_returns,
        |  round(CAST(s1 AS DOUBLE) / n_returns, 9) AS mean_return,
        |  CASE WHEN n_returns > 1 AND greatest(0.0,
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_returns)
        |        / (n_returns - 1)) > 0
        |    THEN round((CAST(s1 AS DOUBLE) / n_returns) / sqrt(greatest(0.0,
        |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_returns)
        |        / (n_returns - 1))), 6) END AS sharpe
        |FROM s ORDER BY event_type""".stripMargin,

    "q115_return_autocorr" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, ts, event_id,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |p AS (
        |  SELECT event_type, r, lag(r) OVER (
        |    PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS rp
        |  FROM r),
        |f AS (SELECT event_type, r, rp FROM p
        |      WHERE r IS NOT NULL AND rp IS NOT NULL),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_pairs,
        |    SUM(r) AS sx, SUM(rp) AS sy,
        |    SUM(CAST(r * rp AS DECIMAL(38,18))) AS sxy,
        |    SUM(CAST(r * r AS DECIMAL(38,18))) AS sxx,
        |    SUM(CAST(rp * rp AS DECIMAL(38,18))) AS syy
        |  FROM f GROUP BY event_type)
        |SELECT event_type, n_pairs,
        |  CASE WHEN n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |        AND n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |    THEN round((n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      sqrt((n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |           (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS autocorr
        |FROM s ORDER BY event_type""".stripMargin,

    "q116_canonical_docs" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte,
        |cl AS (SELECT node AS doc_id, MIN(comp) AS cluster_id
        |       FROM walk GROUP BY node),
        |q AS (SELECT doc_id,
        |        CAST(len(regexp_split_to_array(
        |          trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS BIGINT)
        |          AS quality
        |      FROM documents),
        |r AS (
        |  SELECT cl.doc_id, cl.cluster_id, q.quality,
        |    COUNT(*) OVER (PARTITION BY cl.cluster_id) AS cluster_size,
        |    row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY q.quality DESC, cl.doc_id ASC) AS rn
        |  FROM cl JOIN q USING (doc_id))
        |SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
        |  quality, rn = 1 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    "q117_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |dt AS (SELECT DISTINCT doc_id, unnest(w) AS token FROM toks),
        |g AS (
        |  SELECT token, COUNT(*) AS df,
        |    list_slice(list(doc_id ORDER BY doc_id ASC), 1, 20) AS postings
        |  FROM dt GROUP BY token)
        |SELECT token, CAST(df AS BIGINT) AS df, df > 20 AS truncated,
        |  array_to_string(postings, ',') AS postings
        |FROM g WHERE df >= 10 ORDER BY token""".stripMargin,

    "q118_semantic_dedup" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nn FROM e),
        |u AS (SELECT * FROM n WHERE nn > 0),
        |cents AS (
        |  SELECT vec_id AS cid, v AS cv, nn AS cn FROM u
        |  WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 8),
        |scored AS (
        |  SELECT u.vec_id, u.v, u.nn, c.cid,
        |    list_dot_product(u.v, c.cv) / (u.nn * c.cn) AS cs
        |  FROM u, cents c),
        |asg AS (
        |  SELECT vec_id, v, nn, cid AS cluster FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cs DESC, cid DESC) AS rn
        |    FROM scored) WHERE rn = 1),
        |drp AS (
        |  SELECT DISTINCT b.vec_id FROM asg a
        |  JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) / (a.nn * b.nn), 6) >= 0.4)
        |SELECT e.vec_id, asg.cluster,
        |  drp.vec_id IS NULL AS keep
        |FROM e
        |LEFT JOIN asg ON asg.vec_id = e.vec_id
        |LEFT JOIN drp ON drp.vec_id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin,

    "q119_winsorized_stats" ->
      """WITH b AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  -- interpolate in DOUBLE (quantile_cont over a DECIMAL column
        |  -- returns DECIMAL and truncates at its scale; Spark's
        |  -- percentile interpolates in double) and snap to the 8dp grid
        |  SELECT event_type,
        |    CAST(quantile_cont(CAST(v AS DOUBLE), 0.05) AS DECIMAL(18,8)) AS lo_cut,
        |    CAST(quantile_cont(CAST(v AS DOUBLE), 0.95) AS DECIMAL(18,8)) AS hi_cut
        |  FROM b GROUP BY event_type),
        |j AS (
        |  SELECT b.event_type, b.v, c.lo_cut, c.hi_cut,
        |    least(greatest(b.v, c.lo_cut), c.hi_cut) AS w
        |  FROM b JOIN c USING (event_type))
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN v < lo_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |  CAST(SUM(CASE WHEN v > hi_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
        |  CAST(MIN(lo_cut) AS DOUBLE) AS lo_cut,
        |  CAST(MIN(hi_cut) AS DOUBLE) AS hi_cut,
        |  round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS winsorized_mean
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q120_temperature_mixture" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(regexp_split_to_array(
        |      trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT *,
        |    CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS nat FROM s),
        |u AS (SELECT *,
        |    CAST(round(pow(nat, 0.5), 12) AS DECIMAL(28,12)) AS q FROM t)
        |SELECT source, n_docs, n_tokens,
        |  round(nat, 9) AS natural_share,
        |  round(CAST(q AS DOUBLE) / CAST(SUM(q) OVER () AS DOUBLE), 9)
        |    AS target_share,
        |  round(round(CAST(q AS DOUBLE) / CAST(SUM(q) OVER () AS DOUBLE), 9)
        |    / nat, 6) AS rate
        |FROM u ORDER BY source""".stripMargin,

    "q121_realized_variance" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |s AS (
        |  SELECT event_type, bucket, COUNT(*) AS n_returns,
        |    SUM(CAST(r * r AS DECIMAL(38,18))) AS rv
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type, bucket)
        |-- decimal->double through VARCHAR: DuckDB's direct DECIMAL(38,18)
        |-- cast multiplies by 1e-18 in floating point (not correctly
        |-- rounded — 37/150 rows differ by one ulp on this data), while
        |-- strtod and Spark's BigDecimal.doubleValue both round correctly
        |SELECT event_type, bucket, n_returns,
        |  CAST(CAST(rv AS VARCHAR) AS DOUBLE) AS realized_variance,
        |  round(sqrt(CAST(CAST(rv AS VARCHAR) AS DOUBLE)), 9) AS realized_vol
        |FROM s ORDER BY event_type, bucket""".stripMargin,

    "q124_audio_features" ->
      """WITH s AS (
        |  SELECT doc_id, 1 + doc_id % 256 AS n,
        |    unnest(range(0, CAST(1 + doc_id % 256 AS BIGINT))) AS i
        |  FROM documents),
        |amp AS (
        |  SELECT doc_id, n, ((doc_id + i) % 17 - 8) * 1000 AS a FROM s)
        |SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS channels,
        |  CAST(MIN(n) AS BIGINT) AS n_samples,
        |  round(sqrt(CAST(SUM(a * a) AS DOUBLE) / MIN(n)), 6) AS rms,
        |  TRUE AS decoded
        |FROM amp GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "q141_video_features" ->
      """SELECT doc_id AS media_id, CAST(100 AS BIGINT) AS n_bytes,
        |  CAST(160 + doc_id % 160 AS INT) AS width,
        |  CAST(90 + doc_id % 90 AS INT) AS height,
        |  CAST(1 + doc_id % 250 AS BIGINT) AS n_frames,
        |  CAST((1 + doc_id % 250) * 40 AS BIGINT) AS duration_ms,
        |  TRUE AS decoded
        |FROM documents ORDER BY media_id""".stripMargin,

    // independent recomputation of the frame-pixel channel sums from id
    // arithmetic: frame f of doc d is a solid (7d+13f, 11d+17f, 3d+19f)
    // mod 256 fill over (8+d%8)×(6+d%6) pixels with the FIRST STORED
    // pixel inverted, so Σchannel = c·w·h + 255 − 2c per frame
    "q142_video_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
        |    1 + doc_id % 4 AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, nf,
        |    (7 * doc_id + 13 * r.i) % 256 AS cr,
        |    (11 * doc_id + 17 * r.i) % 256 AS cg,
        |    (3 * doc_id + 19 * r.i) % 256 AS cb
        |  FROM g, range(4) r(i) WHERE r.i < nf),
        |s AS (
        |  SELECT doc_id, MIN(w) AS w, MIN(h) AS h, MIN(nf) AS nf,
        |    SUM(cr * (w * h) + 255 - 2 * cr) AS rs,
        |    SUM(cg * (w * h) + 255 - 2 * cg) AS gs,
        |    SUM(cb * (w * h) + 255 - 2 * cb) AS bs
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(rs AS BIGINT) AS r_sum, CAST(gs AS BIGINT) AS g_sum,
        |  CAST(bs AS BIGINT) AS b_sum, TRUE AS decoded
        |FROM s ORDER BY media_id""".stripMargin,

    // ONE oracle for the whole perceptual-pair family (the
    // cosineTopKOracle convention): the bit-grid/bit-pattern fixtures
    // hash to the SAME bit permutation of the id (which commutes with
    // xor), so image and audio near-dups alike are exactly the id
    // pairs with popcount(xor) <= 3, and the banded variants share it
    // by pigeonhole (4 chunks > 3 differing bits ⇒ some chunk
    // matches), corpus-independent
    "q152_phash_pairs" -> hammingPairsOracle,

    "q153_phash_banded" -> hammingPairsOracle,

    // identical hash→uniform→ln(u)/w chain; the top-k subquery then
    // ranks the already-cut rows
    "q184_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    (((doc_id % 1000000007) * 2654435761) % 1000000007 + 1)
        |      / CAST(1000000008 AS DOUBLE) AS u
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |top AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    round(ln(u) / CAST(n_chars AS DOUBLE), 12) AS es_key
        |  FROM h ORDER BY es_key DESC, doc_id ASC LIMIT 100)
        |SELECT doc_id, weight, es_key,
        |  CAST(row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS INT)
        |    AS sample_rank
        |FROM top ORDER BY sample_rank""".stripMargin,

    // same islands walk: running max-end decides breaks, cumulative
    // breaks label islands, exact integer microseconds throughout
    "q183_interval_union" ->
      """WITH iv AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, event_id,
        |    epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT) AS e
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT event_type, day, event_id, s, e,
        |    max(e) OVER (PARTITION BY event_type, day
        |      ORDER BY s ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv WHERE s <= e),
        |i AS (
        |  SELECT event_type, day, s, e,
        |    SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY event_type, day
        |        ORDER BY s ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM m),
        |g AS (
        |  SELECT event_type, day, isl, COUNT(*) AS n,
        |    MIN(s) AS i_s, MAX(e) AS i_e
        |  FROM i GROUP BY 1, 2, 3)
        |SELECT event_type, day, CAST(SUM(n) AS BIGINT) AS n_intervals,
        |  COUNT(*) AS n_islands, CAST(SUM(i_e - i_s) AS BIGINT) AS covered_us
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // forward pick = earliest qualifying click; the tolerance filters
    // candidates, which equals the operator's pick-then-cut because
    // distance grows monotonically past the nearest row
    "q182_asof_forward" ->
      """SELECT p.event_id, p.user_id, p.value,
        |  (SELECT c.value FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |     AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
        |   ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS next_click_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin
  )
}
