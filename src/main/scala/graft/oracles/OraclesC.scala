package graft.oracles

/** DuckDB oracle SQL — final third of the base oracle map (entries moved
  * VERBATIM from SparkEntry.oracleSqlBase, round-10 verdict item 7;
  * assembled by [[Oracles.all]]). Generated entries build from the
  * shared [[OracleCtes]] fragments.
  */
private[oracles] object OraclesC {
  import OracleCtes._
  import graft.text.Curation.FixedBpeMerges

  def map: Map[String, String] = Map(

    "q139_event_study" ->
      """WITH b AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER w AS pv,
        |    lead(CAST(value AS DECIMAL(18,6)), 1) OVER w AS f1,
        |    lead(CAST(value AS DECIMAL(18,6)), 5) OVER w AS f5
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |r AS (
        |  SELECT event_type,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r,
        |    CASE WHEN f1 IS NOT NULL AND v > 0 THEN CAST(round(
        |      CAST(f1 - v AS DOUBLE) / CAST(v AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS fwd1,
        |    CASE WHEN f5 IS NOT NULL AND v > 0 THEN CAST(round(
        |      CAST(f5 - v AS DOUBLE) / CAST(v AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS fwd5
        |  FROM b),
        |e AS (SELECT * FROM r WHERE r > CAST(0.02 AS DECIMAL(16,9))),
        |u AS (
        |  SELECT event_type, 1 AS horizon, fwd1 AS fwd FROM e
        |  UNION ALL
        |  SELECT event_type, 5 AS horizon, fwd5 AS fwd FROM e),
        |s AS (
        |  SELECT event_type, horizon, COUNT(*) AS n_events,
        |    SUM(fwd) AS sf, COUNT(CASE WHEN fwd > 0 THEN 1 END) AS hits
        |  FROM u WHERE fwd IS NOT NULL GROUP BY event_type, horizon)
        |SELECT event_type, horizon, n_events,
        |  round(CAST(CAST(sf AS VARCHAR) AS DOUBLE) / n_events, 9) AS mean_fwd_return,
        |  round(CAST(hits AS DOUBLE) / n_events, 6) AS hit_rate
        |FROM s ORDER BY event_type, horizon""".stripMargin,

    "q137_token_entropy" ->
      """WITH tf AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |f AS (SELECT source, token, COUNT(*) AS freq FROM tf
        |      WHERE token <> '' GROUP BY 1, 2),
        |s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab_size,
        |    CAST(SUM(freq) AS BIGINT) AS total_tokens,
        |    SUM(CAST(CAST(freq AS DECIMAL(18,0)) *
        |      CAST(round(ln(freq), 12) AS DECIMAL(14,12)) AS DECIMAL(33,12))) AS sfl
        |  FROM f GROUP BY source)
        |SELECT source, vocab_size, total_tokens,
        |  round(ln(total_tokens) -
        |    CAST(CAST(sfl AS VARCHAR) AS DOUBLE) / total_tokens, 6) AS entropy,
        |  CASE WHEN vocab_size > 1 THEN
        |    round((ln(total_tokens) -
        |      CAST(CAST(sfl AS VARCHAR) AS DOUBLE) / total_tokens) /
        |      ln(vocab_size), 6)
        |  END AS efficiency
        |FROM s ORDER BY source""".stripMargin,

    "q138_variance_ratio" ->
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
        |rq AS (
        |  SELECT event_type, r,
        |    CASE WHEN COUNT(r) OVER wq = 5 THEN
        |      CAST(SUM(r) OVER wq AS DECIMAL(18,9)) END AS rq
        |  FROM r WHERE r IS NOT NULL
        |  WINDOW wq AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_returns,
        |    SUM(r) AS s1, SUM(CAST(r * r AS DECIMAL(38,18))) AS s2,
        |    COUNT(rq) AS n_q,
        |    SUM(rq) AS t1, SUM(CAST(rq * rq AS DECIMAL(38,18))) AS t2
        |  FROM rq GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n_returns, n_q,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS ds1,
        |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS ds2,
        |    CAST(CAST(t1 AS VARCHAR) AS DOUBLE) AS dt1,
        |    CAST(CAST(t2 AS VARCHAR) AS DOUBLE) AS dt2
        |  FROM s)
        |SELECT event_type, n_returns, n_q,
        |  CASE WHEN n_q >= 2 AND
        |    ds2 / n_returns - (ds1 / n_returns) * (ds1 / n_returns) > 0 THEN
        |    round((dt2 / n_q - (dt1 / n_q) * (dt1 / n_q)) /
        |      (5 * (ds2 / n_returns - (ds1 / n_returns) * (ds1 / n_returns))), 6)
        |  END AS variance_ratio
        |FROM d ORDER BY event_type""".stripMargin,

    "q135_kyle_lambda" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |sg AS (
        |  SELECT event_type, qty, CAST(v - pv AS DECIMAL(16,6)) AS dp,
        |    last_value(CASE WHEN v - pv > 0 THEN 1
        |                    WHEN v - pv < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM b),
        |f AS (
        |  SELECT event_type, dp,
        |    CASE WHEN sgn = 1 THEN CAST(qty AS DECIMAL(16,6))
        |         ELSE -CAST(qty AS DECIMAL(16,6)) END AS x
        |  FROM sg WHERE dp IS NOT NULL AND sgn IS NOT NULL AND qty IS NOT NULL),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_ticks,
        |    SUM(dp) AS sy, SUM(x) AS sx,
        |    SUM(CAST(x * dp AS DECIMAL(38,12))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
        |  FROM f GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n_ticks,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dsy,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dsx,
        |    CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dsxy,
        |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dsxx
        |  FROM s)
        |SELECT event_type, n_ticks,
        |  CASE WHEN n_ticks >= 2 AND n_ticks * dsxx - dsx * dsx > 0 THEN
        |    round((n_ticks * dsxy - dsx * dsy) / (n_ticks * dsxx - dsx * dsx), 9)
        |  END AS kyle_lambda
        |FROM d ORDER BY event_type""".stripMargin,

    "q136_roll_spread" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |dp AS (
        |  SELECT event_type, CAST(v - pv AS DECIMAL(16,6)) AS d1,
        |    lag(CAST(v - pv AS DECIMAL(16,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS d0
        |  FROM b),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_pairs,
        |    SUM(d1) AS sa, SUM(d0) AS sb,
        |    SUM(CAST(d1 * d0 AS DECIMAL(38,12))) AS sab
        |  FROM dp WHERE d1 IS NOT NULL AND d0 IS NOT NULL
        |  GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n_pairs,
        |    (CAST(CAST(sab AS VARCHAR) AS DOUBLE) -
        |     CAST(CAST(sa AS VARCHAR) AS DOUBLE) *
        |     CAST(CAST(sb AS VARCHAR) AS DOUBLE) / n_pairs) / n_pairs AS cov
        |  FROM s)
        |SELECT event_type, n_pairs, round(cov, 9) AS dp_autocov,
        |  CASE WHEN cov < 0 THEN round(2.0 * sqrt(-cov), 6) END AS roll_spread
        |FROM d ORDER BY event_type""".stripMargin,

    "q133_pair_spread" ->
      """WITH base AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |perkey AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS DECIMAL(21,9)) AS x
        |  FROM base GROUP BY event_type, bucket),
        |p AS (
        |  SELECT a.event_type AS key_a, b.event_type AS key_b, bucket,
        |    a.x AS xa, b.x AS xb
        |  FROM perkey a JOIN perkey b USING (bucket)
        |  WHERE a.event_type < b.event_type),
        |s AS (
        |  SELECT key_a, key_b, COUNT(*) AS n_buckets,
        |    SUM(xa) AS sa, SUM(xb) AS sb,
        |    SUM(CAST(xa * xb AS DECIMAL(38,18))) AS sab,
        |    SUM(CAST(xa * xa AS DECIMAL(38,18))) AS saa,
        |    SUM(CAST(xb * xb AS DECIMAL(38,18))) AS sbb,
        |    MAX(bucket) AS last_bucket,
        |    max_by(xa, bucket) AS la, max_by(xb, bucket) AS lb
        |  FROM p GROUP BY key_a, key_b),
        |d AS (
        |  SELECT key_a, key_b, n_buckets, last_bucket,
        |    CAST(n_buckets AS DOUBLE) AS n,
        |    CAST(CAST(sa AS VARCHAR) AS DOUBLE) AS dsa, CAST(CAST(sb AS VARCHAR) AS DOUBLE) AS dsb,
        |    CAST(CAST(sab AS VARCHAR) AS DOUBLE) AS dsab, CAST(CAST(saa AS VARCHAR) AS DOUBLE) AS dsaa,
        |    CAST(CAST(sbb AS VARCHAR) AS DOUBLE) AS dsbb,
        |    CAST(CAST(la AS VARCHAR) AS DOUBLE) AS dla,
        |    CAST(CAST(lb AS VARCHAR) AS DOUBLE) AS dlb
        |  FROM s),
        |f AS (
        |  SELECT key_a, key_b, n_buckets, last_bucket, dla, dlb, n, dsa,
        |    dsbb - dsb * dsb / n AS sbbc,
        |    dsab - dsa * dsb / n AS sabc,
        |    dsaa - dsa * dsa / n AS saac,
        |    dsb
        |  FROM d),
        |g AS (
        |  SELECT *, sabc / sbbc AS beta,
        |    (dsa - (sabc / sbbc) * dsb) / n AS alpha,
        |    saac - (sabc / sbbc) * sabc AS rss
        |  FROM f)
        |SELECT key_a, key_b, n_buckets, last_bucket,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 THEN round(beta, 6) END AS beta,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 THEN round(alpha, 6) END AS alpha,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 AND rss > 0 THEN
        |    round((dla - alpha - beta * dlb) / sqrt(rss / (n_buckets - 2)), 6)
        |  END AS last_z,
        |  CASE WHEN n_buckets >= 3 AND sbbc > 0 AND rss > 0 THEN
        |    CAST(abs((dla - alpha - beta * dlb) / sqrt(rss / (n_buckets - 2)))
        |      >= 2.0 AS INT)
        |  END AS diverged
        |FROM g ORDER BY key_a, key_b""".stripMargin,

    "q134_vol_cone" ->
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
        |rv AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(CAST(SUM(CAST(r * r AS DECIMAL(38,18))) AS VARCHAR)
        |      AS DOUBLE), 12) AS DECIMAL(30,12)) AS rvd
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type, bucket),
        |roll AS (
        |  SELECT event_type, h, cnt, rsum FROM (
        |    SELECT event_type, 5 AS h,
        |      COUNT(rvd) OVER w5 AS cnt, SUM(rvd) OVER w5 AS rsum
        |    FROM rv WINDOW w5 AS (PARTITION BY event_type ORDER BY bucket ASC
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |    UNION ALL
        |    SELECT event_type, 10 AS h,
        |      COUNT(rvd) OVER w10 AS cnt, SUM(rvd) OVER w10 AS rsum
        |    FROM rv WINDOW w10 AS (PARTITION BY event_type ORDER BY bucket ASC
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |    UNION ALL
        |    SELECT event_type, 21 AS h,
        |      COUNT(rvd) OVER w21 AS cnt, SUM(rvd) OVER w21 AS rsum
        |    FROM rv WINDOW w21 AS (PARTITION BY event_type ORDER BY bucket ASC
        |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW))
        |  WHERE cnt = h),
        |vols AS (
        |  SELECT event_type, h,
        |    CAST(round(sqrt(CAST(CAST(rsum AS VARCHAR) AS DOUBLE) / h), 9)
        |      AS DECIMAL(16,9)) AS vol
        |  FROM roll),
        |agg AS (
        |  SELECT event_type, h AS horizon, COUNT(*) AS n_windows,
        |    MIN(vol) AS mn, MAX(vol) AS mx, SUM(vol) AS sm
        |  FROM vols GROUP BY event_type, h)
        |SELECT event_type, horizon, n_windows,
        |  CAST(CAST(mn AS VARCHAR) AS DOUBLE) AS min_vol,
        |  round(CAST(CAST(sm AS VARCHAR) AS DOUBLE) / n_windows, 9) AS mean_vol,
        |  CAST(CAST(mx AS VARCHAR) AS DOUBLE) AS max_vol
        |FROM agg ORDER BY event_type, horizon""".stripMargin,

    "q131_containment_dups" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |sh AS (
        |  SELECT DISTINCT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') AS shingle
        |  FROM toks WHERE len(w) < 5),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_a, n_b, containment, jaccard FROM (
        |  SELECT doc_a, doc_b, sa.n_sh AS n_a, sb.n_sh AS n_b,
        |    CAST(shared AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS containment,
        |    CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
        |  FROM shared
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b)
        |WHERE containment >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,

    "q132_zipf_slope" ->
      """WITH tf AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |f AS (SELECT source, token, COUNT(*) AS freq FROM tf
        |      WHERE token <> '' GROUP BY 1, 2),
        |rk AS (
        |  SELECT source, freq,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY freq DESC, token ASC) AS r
        |  FROM f),
        |l AS (
        |  SELECT source,
        |    CAST(round(ln(r), 12) AS DECIMAL(14,12)) AS x,
        |    CAST(round(ln(freq), 12) AS DECIMAL(14,12)) AS y
        |  FROM rk WHERE r <= 100),
        |s AS (
        |  SELECT source, COUNT(*) AS n_ranks,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(38,24))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,24))) AS sxx
        |  FROM l GROUP BY source)
        |SELECT source, n_ranks,
        |  CASE WHEN n_ranks >= 2 THEN
        |    round((n_ranks * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) -
        |           CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
        |          (n_ranks * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
        |           CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)), 6)
        |  END AS zipf_slope
        |FROM s ORDER BY source""".stripMargin,

    "q125_var_cvar" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r
        |  FROM b),
        |k AS (
        |  SELECT event_type, r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY r ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM r WHERE r IS NOT NULL),
        |-- k = ceil(alpha*n) from an EXACT decimal alpha: a double 0.05*n
        |-- can land one ulp above the integer and ceil past it
        |t AS (
        |  SELECT event_type, r, rn, n,
        |    CAST(ceil(CAST(0.05 AS DECIMAL(10,6)) * n) AS BIGINT) AS kk
        |  FROM k)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_returns,
        |  round(CAST(CAST(MAX(r) AS VARCHAR) AS DOUBLE), 9) AS var_return,
        |  round(CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) / MAX(kk), 9) AS es_return
        |FROM t WHERE rn <= kk GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q126_sortino" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
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
        |    SUM(CAST(CASE WHEN r < 0 THEN r * r
        |      ELSE CAST(0 AS DECIMAL(32,18)) END AS DECIMAL(38,18))) AS sd2
        |  FROM r WHERE r IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_returns,
        |  round(CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_returns, 9) AS mean_return,
        |  round(sqrt(CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) / n_returns), 9) AS downside_dev,
        |  CASE WHEN sd2 > 0 THEN
        |    round((CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_returns) /
        |      sqrt(CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) / n_returns), 6)
        |  END AS sortino
        |FROM s ORDER BY event_type""".stripMargin,

    "q127_flow_imbalance" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |sg AS (
        |  SELECT event_type, ts, qty,
        |    last_value(CASE WHEN v - pv > 0 THEN 1
        |                    WHEN v - pv < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
        |  FROM b),
        |f AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket, sgn,
        |    CAST(qty AS DECIMAL(28,6)) AS q
        |  FROM sg WHERE sgn IS NOT NULL AND qty IS NOT NULL),
        |s AS (
        |  SELECT event_type, bucket, COUNT(*) AS n_ticks,
        |    SUM(CASE WHEN sgn = 1 THEN q ELSE -q END) AS sq, SUM(q) AS tq
        |  FROM f GROUP BY event_type, bucket)
        |SELECT event_type, bucket, n_ticks,
        |  round(CAST(CAST(sq AS VARCHAR) AS DOUBLE), 6) AS signed_qty,
        |  round(CAST(CAST(tq AS VARCHAR) AS DOUBLE), 6) AS total_qty,
        |  CASE WHEN tq > 0 THEN round(CAST(CAST(sq AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(tq AS VARCHAR) AS DOUBLE), 6) END AS ofi
        |FROM s ORDER BY event_type, bucket""".stripMargin,

    "q128_atr_channels" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL),
        |bars AS (
        |  SELECT event_type, bar,
        |    CAST(MAX(value) AS DECIMAL(18,6)) AS high,
        |    CAST(MIN(value) AS DECIMAL(18,6)) AS low,
        |    CAST(MAX(CASE WHEN rn_last = 1 THEN value END) AS DECIMAL(18,6)) AS close
        |  FROM ticks GROUP BY event_type, bar),
        |trv AS (
        |  SELECT event_type, bar, high, low, close,
        |    CAST(CASE WHEN pc IS NULL THEN high - low
        |      ELSE greatest(high - low, abs(high - pc), abs(low - pc))
        |    END AS DECIMAL(20,6)) AS tr
        |  FROM (SELECT *, lag(close) OVER
        |    (PARTITION BY event_type ORDER BY bar ASC) AS pc FROM bars)),
        |ch AS (
        |  SELECT event_type, bar, high, low, close,
        |    COUNT(tr) OVER wt AS trn, SUM(tr) OVER wt AS trs,
        |    MAX(high) OVER wp AS dh, MIN(low) OVER wp AS dl
        |  FROM trv
        |  WINDOW wt AS (PARTITION BY event_type ORDER BY bar ASC
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
        |  wp AS (PARTITION BY event_type ORDER BY bar ASC
        |    ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, bar,
        |  CAST(CAST(high AS VARCHAR) AS DOUBLE) AS high,
        |  CAST(CAST(low AS VARCHAR) AS DOUBLE) AS low,
        |  CAST(CAST(close AS VARCHAR) AS DOUBLE) AS close,
        |  CASE WHEN trn = 14 THEN
        |    round(CAST(CAST(trs AS VARCHAR) AS DOUBLE) / 14, 6) END AS atr,
        |  CAST(CAST(dh AS VARCHAR) AS DOUBLE) AS donchian_high,
        |  CAST(CAST(dl AS VARCHAR) AS DOUBLE) AS donchian_low,
        |  CASE WHEN dh IS NOT NULL THEN CAST(close > dh AS INT) END AS breakout_up,
        |  CASE WHEN dl IS NOT NULL THEN CAST(close < dl AS INT) END AS breakout_down
        |FROM ch ORDER BY event_type, bar""".stripMargin,

    "q129_momentum_rank" ->
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
        |x AS (
        |  SELECT bucket, event_type, ret,
        |    row_number() OVER (PARTITION BY bucket
        |      ORDER BY ret DESC, event_type ASC) AS rank_in_bucket,
        |    COUNT(*) OVER (PARTITION BY bucket) AS n_keys
        |  FROM r)
        |-- floor, not a bare int cast of the quotient: engines disagree on
        |-- double->int cast rounding (Spark truncates, DuckDB rounds)
        |SELECT bucket, event_type,
        |  CAST(CAST(ret AS VARCHAR) AS DOUBLE) AS bucket_return,
        |  rank_in_bucket, n_keys,
        |  CAST(floor(((rank_in_bucket - 1) * 10) / n_keys) + 1 AS INT) AS decile
        |FROM x ORDER BY bucket, event_type""".stripMargin,

    "q130_intraday_profile" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r,
        |    CAST(qty AS DECIMAL(28,6)) AS q
        |  FROM b),
        |s AS (
        |  SELECT event_type, hour_of_day, COUNT(*) AS n_ticks,
        |    COUNT(r) AS nr, SUM(abs(r)) AS sar, SUM(q) AS sq
        |  FROM r GROUP BY event_type, hour_of_day),
        |t AS (
        |  SELECT *, SUM(sq) OVER (PARTITION BY event_type) AS tq FROM s)
        |SELECT event_type, hour_of_day, n_ticks,
        |  CASE WHEN nr > 0 THEN
        |    round(CAST(CAST(sar AS VARCHAR) AS DOUBLE) / nr, 9) END AS mean_abs_return,
        |  CASE WHEN tq > 0 THEN
        |    round(CAST(CAST(sq AS VARCHAR) AS DOUBLE) /
        |      CAST(CAST(tq AS VARCHAR) AS DOUBLE), 6) END AS qty_share
        |FROM t ORDER BY event_type, hour_of_day""".stripMargin,

    "q123_amihud" ->
      """WITH b AS (
        |  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty,
        |    lag(CAST(value AS DECIMAL(18,6))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS pv
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |r AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CASE WHEN pv > 0 THEN CAST(round(
        |      CAST(v - pv AS DOUBLE) / CAST(pv AS DOUBLE), 9) AS DECIMAL(16,9))
        |    END AS r,
        |    CAST(v * CAST(qty AS DECIMAL(18,6)) AS DECIMAL(38,12)) AS dv
        |  FROM b),
        |-- every decimal->double goes through VARCHAR/strtod: DuckDB's
        |-- direct cast is not correctly rounded (see q121)
        |il AS (
        |  SELECT event_type, bucket,
        |    CAST(round(CAST(CAST(abs(r) AS VARCHAR) AS DOUBLE) /
        |      CAST(CAST(dv AS VARCHAR) AS DOUBLE), 12) AS DECIMAL(32,12)) AS il
        |  FROM r WHERE r IS NOT NULL AND dv > 0),
        |s AS (
        |  SELECT event_type, bucket, COUNT(*) AS n_ticks, SUM(il) AS ils
        |  FROM il GROUP BY event_type, bucket)
        |SELECT event_type, bucket, n_ticks,
        |  round(CAST(CAST(ils AS VARCHAR) AS DOUBLE) / n_ticks, 12) AS illiq
        |FROM s ORDER BY event_type, bucket""".stripMargin,

    "q122_cross_source_dups" ->
      s"""WITH $shingleCte,
        |$jacPairsCte,
        |ds AS (SELECT doc_id, source FROM documents)
        |SELECT least(a.source, b.source) AS source_a,
        |  greatest(a.source, b.source) AS source_b,
        |  COUNT(*) AS n_dup_pairs
        |FROM jac p
        |JOIN ds a ON a.doc_id = p.doc_a
        |JOIN ds b ON b.doc_id = p.doc_b
        |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    "q100_level_alerts" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, ts, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |ew AS (
        |  SELECT event_type,
        |    round(list_reduce(lst, (acc, x) -> acc * 0.75 + 0.25 * x), 6) AS ewma_ref
        |  FROM (
        |    SELECT event_type,
        |      list(CAST(value AS DOUBLE)) OVER (
        |        PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst,
        |      row_number() OVER (
        |        PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1),
        |d AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(value AS DECIMAL(18,6))
        |      - lag(CAST(value AS DECIMAL(18,6))) OVER w AS delta
        |  FROM ev
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |rs AS (
        |  SELECT event_type,
        |    CASE WHEN g + l > 0
        |         THEN round(100.0 * CAST(g AS DOUBLE) / CAST(g + l AS DOUBLE), 6)
        |    END AS rsi_ref
        |  FROM (
        |    SELECT event_type,
        |      SUM(CASE WHEN delta > 0 THEN delta WHEN delta <= 0 THEN 0 END) OVER fr AS g,
        |      SUM(CASE WHEN delta < 0 THEN -delta WHEN delta >= 0 THEN 0 END) OVER fr AS l,
        |      row_number() OVER (
        |        PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM d
        |    WINDOW fr AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) WHERE rn = 1),
        |vw AS (
        |  SELECT event_type,
        |    round(CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(qty AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DOUBLE)
        |      / CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE), 6) AS vwap_ref
        |  FROM ev GROUP BY event_type
        |  HAVING SUM(CAST(qty AS DECIMAL(18,6))) <> 0),
        |sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2
        |  FROM ev GROUP BY event_type),
        |m AS (
        |  SELECT event_type,
        |    sqrt(greatest(0.0, (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))) AS std_v
        |  FROM sums WHERE n > 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - ew.ewma_ref) / m.std_v, 4) AS z_vs_ewma,
        |  round((e.value - vw.vwap_ref) / vw.vwap_ref * 100, 4) AS vwap_dev_pct,
        |  CASE WHEN rs.rsi_ref >= 70 THEN 'overbought'
        |       WHEN rs.rsi_ref <= 30 THEN 'oversold'
        |       ELSE 'neutral' END AS regime
        |FROM ev e
        |JOIN m USING (event_type) JOIN ew USING (event_type)
        |JOIN rs USING (event_type) JOIN vw USING (event_type)
        |WHERE m.std_v > 0 AND vw.vwap_ref IS NOT NULL AND vw.vwap_ref <> 0
        |  AND (abs(round((e.value - ew.ewma_ref) / m.std_v, 4)) >= 1.5
        |       OR abs(round((e.value - vw.vwap_ref) / vw.vwap_ref * 100, 4)) >= 3.0)
        |ORDER BY event_id""".stripMargin,

    // the q75 edge CTE + three unrolled PageRank iterations; every
    // formula mirrors the Spark side shape-for-shape (double ops, per-
    // row DECIMAL(28,14) contribution casts, round 14 per iteration)
    // so the doubles agree bitwise
    "q89_pagerank" ->
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
        |edges AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (
        |      PARTITION BY src ORDER BY cos_sim DESC, dst) AS rnk
        |    FROM pairs) WHERE rnk <= 5),
        |outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS p FROM nodes, nn),
        |i1 AS (
        |  SELECT nodes.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |      + COALESCE(CAST(s.c AS DOUBLE), CAST(0.0 AS DOUBLE)), 14) AS p
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      SUM(CAST(p.p / o.od * CAST(0.85 AS DOUBLE) AS DECIMAL(28,14))) AS c
        |    FROM edges e JOIN p0 p ON p.node = e.src JOIN outd o ON o.src = e.src
        |    GROUP BY e.dst) s ON s.node = nodes.node),
        |i2 AS (
        |  SELECT nodes.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |      + COALESCE(CAST(s.c AS DOUBLE), CAST(0.0 AS DOUBLE)), 14) AS p
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      SUM(CAST(p.p / o.od * CAST(0.85 AS DOUBLE) AS DECIMAL(28,14))) AS c
        |    FROM edges e JOIN i1 p ON p.node = e.src JOIN outd o ON o.src = e.src
        |    GROUP BY e.dst) s ON s.node = nodes.node),
        |i3 AS (
        |  SELECT nodes.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |      + COALESCE(CAST(s.c AS DOUBLE), CAST(0.0 AS DOUBLE)), 14) AS p
        |  FROM nodes CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      SUM(CAST(p.p / o.od * CAST(0.85 AS DOUBLE) AS DECIMAL(28,14))) AS c
        |    FROM edges e JOIN i2 p ON p.node = e.src JOIN outd o ON o.src = e.src
        |    GROUP BY e.dst) s ON s.node = nodes.node)
        |SELECT node AS vec_id, round(p, 10) AS pagerank
        |FROM i3 ORDER BY vec_id""".stripMargin,

    "q88_boilerplate" ->
      """WITH lines AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents)),
        |freq AS (SELECT line, COUNT(DISTINCT doc_id) AS ldf FROM lines GROUP BY line),
        |kept AS (
        |  SELECT doc_id, i, line FROM lines JOIN freq USING (line) WHERE ldf <= 1)
        |SELECT doc_id,
        |  string_agg(line, chr(10) ORDER BY i) AS clean_text,
        |  COUNT(*) AS n_lines_kept
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the oracle aggregates the parquet table DIRECTLY — matching hashes
    // prove the Spark-side parquet→ORC→scan roundtrip loses nothing
    "q87_orc_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // same shingle construction (incl. the short-doc whole-text
    // fallback) as the jaccard oracle, then doc-frequency >= 2 counts
    "q85_dup_shingles" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |sh AS (
        |  SELECT DISTINCT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') AS shingle
        |  FROM toks WHERE len(w) < 5),
        |freq AS (SELECT shingle, COUNT(*) AS sdf FROM sh GROUP BY shingle)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN f.sdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  round(CAST(SUM(CASE WHEN f.sdf >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_fraction
        |FROM sh JOIN freq f USING (shingle)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q42_embedding_norms" ->
      """WITH n AS (
        |  SELECT label,
        |    round(sqrt(list_dot_product(
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS l2_norm
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n_vecs,
        |  ROUND(CAST(SUM(CAST(l2_norm AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    // the PNG dims Spark reads back out of the encoded headers are pure
    // functions of doc_id, so the oracle recomputes them arithmetically —
    // a hash match proves the javax.imageio roundtrip decoded for real
    // (decoded=TRUE for every row: the JDK PNG reader must claim each one)
    "q43_media_features" ->
      """SELECT doc_id AS media_id, 'png' AS format,
        |  CAST(1 + doc_id % 64 AS INT) AS width,
        |  CAST(1 + doc_id % 48 AS INT) AS height,
        |  TRUE AS decoded
        |FROM documents ORDER BY media_id""".stripMargin,

    "q44_approx_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q52_decile_cutpoints" ->
      """SELECT CAST(range + 1 AS BIGINT) AS bucket,
        |  TRUE AS range_ok, TRUE AS ordered_ok, TRUE AS covers_all
        |FROM range(10) ORDER BY bucket""".stripMargin,

    "q46_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.50), 6) AS p50,
        |  round(quantile_cont(value, 0.75), 6) AS p75
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q47_top_words" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
        |  FROM documents)
        |GROUP BY word HAVING COUNT(*) >= 20 ORDER BY word""".stripMargin,

    "q48_window_nav" ->
      """SELECT event_id, user_id,
        |  first_value(value) OVER wf AS first_val,
        |  last_value(value) OVER wf AS last_val,
        |  nth_value(value, 2) OVER wf AS second_val,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q49_moment_stats" ->
      """WITH sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CAST(s1 AS DOUBLE) / n, 6) AS mean_val,
        |  round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 6) AS var_samp,
        |  round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)), 6) AS stddev_samp
        |FROM sums ORDER BY event_type""".stripMargin,

    "q50_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_e,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_e,
        |  CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos,
        |  round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        |    + CAST(embedding[3] AS DOUBLE), 6) AS head3_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q51_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q53_train_split" ->
      """SELECT source,
        |  CASE WHEN doc_id % 100 < 80 THEN 'train'
        |       WHEN doc_id % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q54_correlation" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(value AS DECIMAL(18,6)) AS x,
        |    CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6)) AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL),
        |sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
        |    SUM(CAST(y * y AS DECIMAL(38,12))) AS syy
        |  FROM base GROUP BY event_type)
        |SELECT event_type, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_vk
        |FROM sums ORDER BY event_type""".stripMargin,

    "q55_range_frame" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS day_total_dec,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d_epoch
        |  FROM orders GROUP BY 1, 3)
        |SELECT d,
        |  ROUND(CAST(day_total_dec AS DOUBLE), 2) AS day_total,
        |  ROUND(CAST(SUM(day_total_dec) OVER (ORDER BY d_epoch
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS trailing_7d
        |FROM daily ORDER BY d""".stripMargin,

    "q56_union_evolve" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, NULL AS value FROM events WHERE event_type = 'signup'
        |ORDER BY event_id""".stripMargin,

    "q57_map_funcs" ->
      """SELECT event_id,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q58_hof_lambdas" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
        |  len(list_filter(v, x -> x > 1.5)) > 0 AS any_big,
        |  round(list_sort(v, 'DESC')[1], 6) AS max_e
        |FROM e ORDER BY vec_id""".stripMargin,

    "q59_ohlc_bars" ->
      """WITH ticks AS (
        |  SELECT event_type, CAST(ts AS DATE) AS bar, value,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts ASC, event_id ASC) AS rn_first,
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, bar,
        |  MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
        |  MAX(value) AS high,
        |  MIN(value) AS low,
        |  MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS volume,
        |  COUNT(*) AS n_ticks
        |FROM ticks GROUP BY event_type, bar
        |ORDER BY event_type, bar""".stripMargin,

    "q60_token_packing" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT source, n_tokens,
        |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 4096) AS BIGINT) AS batch_id
        |  FROM toks)
        |SELECT source, batch_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
        |FROM packed GROUP BY source, batch_id
        |ORDER BY source, batch_id""".stripMargin,

    "q61_quality_audit" ->
      """SELECT * FROM (
        |  SELECT 'docs_nchars_match' AS check_name,
        |    (SELECT COUNT(*) FROM documents
        |     WHERE NOT COALESCE(n_chars = length(text), FALSE)) AS violations
        |  UNION ALL
        |  SELECT 'events_user_ts_unique',
        |    (SELECT COUNT(*) FROM events) -
        |    (SELECT COUNT(*) FROM (SELECT DISTINCT user_id, ts FROM events))
        |  UNION ALL
        |  SELECT 'events_value_nulls',
        |    (SELECT COUNT(*) FROM events WHERE value IS NULL)
        |  UNION ALL
        |  SELECT 'lineitem_order_orphans',
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |  UNION ALL
        |  SELECT 'orders_cust_orphans',
        |    (SELECT COUNT(*) FROM orders
        |     WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)))
        |ORDER BY check_name""".stripMargin,

    "q62_merge_upsert" ->
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value FROM events
        |  WHERE event_id % 3 <> 0 AND event_id % 2 <> 0
        |  UNION ALL
        |  SELECT event_id, user_id, value + 1000.0 AS value FROM events
        |  WHERE event_id % 2 = 0)
        |ORDER BY event_id""".stripMargin,

    "q63_dup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
        |$jacPairsCte,
        |$ccWalkCte
        |SELECT node AS doc_id, MIN(comp) AS cluster_id,
        |  node = MIN(comp) AS is_canonical
        |FROM walk GROUP BY node ORDER BY doc_id""".stripMargin,

    "q64_token_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, w, unnest(range(0, len(w), 48)) AS s
        |  FROM toks WHERE NOT (len(w) = 1 AND w[1] = ''))
        |SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(w, s + 1, s + 64), ' ') AS chunk_text,
        |  CAST(least(64, len(w) - s) AS BIGINT) AS n_tokens
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin,

    "q65_decontaminate" ->
      s"""WITH $shingleCte,
        |ev AS (
        |  SELECT DISTINCT s.shingle FROM sh s
        |  JOIN documents d ON d.doc_id = s.doc_id WHERE d.source = 'src0'),
        |hits AS (
        |  SELECT s.doc_id, COUNT(*) AS n_shared FROM sh s
        |  JOIN ev USING (shingle) GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.source <> 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    // identical oracle to q65 BY DESIGN: the Bloom pre-filter must not
    // change the exact result, and a shared oracle proves it doesn't
    "q93_bloom_decontaminate" ->
      s"""WITH $shingleCte,
        |ev AS (
        |  SELECT DISTINCT s.shingle FROM sh s
        |  JOIN documents d ON d.doc_id = s.doc_id WHERE d.source = 'src0'),
        |hits AS (
        |  SELECT s.doc_id, COUNT(*) AS n_shared FROM sh s
        |  JOIN ev USING (shingle) GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.source <> 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    "q66_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |bg AS (
        |  SELECT a.word || ' ' || b.word AS bigram
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT array_to_string(w, ' ') FROM toks WHERE len(w) < 2),
        |counts AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1)
        |SELECT bigram, n, ROUND(CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS DOUBLE), 6) AS p_cond
        |FROM counts ORDER BY n DESC, bigram LIMIT 50""".stripMargin,

    "q67_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (SELECT doc_id, unnest(w) AS term FROM toks),
        |tf AS (SELECT doc_id, term, COUNT(*) AS n FROM words GROUP BY 1, 2),
        |tf2 AS (SELECT *, SUM(n) OVER (PARTITION BY doc_id) AS n_doc FROM tf),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    ROUND((CAST(n AS DOUBLE) / n_doc) * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf2 JOIN dfreq USING (term) CROSS JOIN tot),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, tfidf, rnk FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q68_curation_pipeline" ->
      """WITH RECURSIVE feats AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(
        |      regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      t -> t IN ('the','a','and','of','to','in','is','on'))) AS BIGINT) AS n_stopwords
        |  FROM documents),
        |docs AS (
        |  SELECT doc_id, lang, text, n_tokens FROM feats
        |  WHERE n_tokens >= 25 AND CAST(n_stopwords AS DOUBLE) / n_tokens <= 0.15),
        |toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM docs),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |sh AS (
        |  SELECT DISTINCT a.doc_id,
        |    a.word || ' ' || b.word || ' ' || c.word || ' ' || d.word || ' ' || e.word AS shingle
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
        |  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4
        |  UNION
        |  SELECT doc_id, array_to_string(w, ' ') AS shingle
        |  FROM toks WHERE len(w) < 5),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT doc_a, doc_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5),
        |exact AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM docs a
        |  JOIN docs b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM jac
        |  UNION SELECT doc_b, doc_a FROM jac
        |  UNION SELECT doc_a, doc_b FROM exact
        |  UNION SELECT doc_b, doc_a FROM exact),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM docs
        |  UNION
        |  SELECT e.v, w.comp FROM walk w
        |  JOIN edges e ON e.u = w.node WHERE w.comp < e.v),
        |lab AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM walk GROUP BY node),
        |kept AS (
        |  SELECT d.* FROM docs d
        |  JOIN lab l ON l.doc_id = d.doc_id AND l.cluster_id = d.doc_id)
        |SELECT
        |  CASE WHEN doc_id % 10 < 8 THEN 'train'
        |       WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |  lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM kept GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "q69_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
        |UNION ALL SELECT 'click', (SELECT COUNT(*) FROM c)
        |UNION ALL SELECT 'purchase', (SELECT COUNT(*) FROM p)""".stripMargin,

    "q70_cohort_retention" ->
      """WITH firsts AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date
        |  FROM events GROUP BY 1)
        |SELECT cohort_date,
        |  CAST(datediff('day', cohort_date, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN firsts f ON f.user_id = e.user_id
        |WHERE datediff('day', cohort_date, CAST(e.ts AS DATE)) <= 7
        |GROUP BY 1, 2 ORDER BY cohort_date, day_offset""".stripMargin,

    "q71_label_centroids" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS e,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings)
        |SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  ROUND(CAST(SUM(CAST(CAST(e AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE)
        |    / COUNT(*), 6) AS centroid
        |FROM ex GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    "q72_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |g AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 3)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  ROUND((COUNT(*) - COUNT(DISTINCT sh)) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q73_doc_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |bg AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word AS bigram
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 2),
        |lm AS (
        |  SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1),
        |lm2 AS (
        |  SELECT bigram, n,
        |    SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS nw1
        |  FROM lm)
        |SELECT doc_id,
        |  ROUND(CAST(SUM(CAST(ROUND(ln(CAST(n AS DOUBLE) / nw1), 9) AS DECIMAL(20,9))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_logprob,
        |  COUNT(*) AS n_bigrams
        |FROM bg JOIN lm2 USING (bigram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q74_source_mixture" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source = 'src0' THEN 2.5
        |         WHEN source = 'src1' THEN 0.5 ELSE 1.0 END AS wt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |    CAST(FLOOR(wt) + CASE WHEN doc_id % 100 <
        |      ROUND((wt - FLOOR(wt)) * 100) THEN 1 ELSE 0 END AS BIGINT) AS copies
        |  FROM w),
        |x AS (
        |  SELECT doc_id, source, unnest(range(0, copies)) AS epoch
        |  FROM c WHERE copies > 0)
        |SELECT source, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "q75_knn_graph" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY src ORDER BY cos_sim DESC, dst) AS BIGINT) AS rnk
        |  FROM pairs)
        |SELECT src, dst, cos_sim, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY src, rnk""".stripMargin,

    "q76_anomalies" ->
      """WITH sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS s1,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS s2
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |m AS (
        |  SELECT event_type, CAST(s1 AS DOUBLE) / n AS mean_v,
        |    sqrt(greatest(0.0, (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))) AS std_v
        |  FROM sums WHERE n > 1)
        |SELECT event_id, event_type, value,
        |  round((value - mean_v) / std_v, 4) AS z
        |FROM events JOIN m USING (event_type)
        |WHERE value IS NOT NULL AND std_v > 0
        |  AND abs(round((value - mean_v) / std_v, 4)) >= 3.0
        |ORDER BY event_id""".stripMargin,

    "q77_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |bounds AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        |  FROM events WHERE value IS NOT NULL),
        |grid AS (
        |  SELECT t.event_type, g.h AS hour
        |  FROM (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g)
        |SELECT g.event_type, g.hour,
        |  last_value(h.avg_v IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  h.avg_v IS NULL AS is_gap
        |FROM grid g LEFT JOIN hourly h
        |  ON h.event_type = g.event_type AND h.hour = g.hour
        |ORDER BY g.event_type, g.hour""".stripMargin,

    "q78_packed_sequences" ->
      """WITH toks AS (
        |  SELECT source, doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT source, doc_id, text, n_tokens,
        |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 4096) AS BIGINT) AS batch_id
        |  FROM toks)
        |SELECT source, batch_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
        |  string_agg(text, ' <eos> ' ORDER BY doc_id) AS packed_text
        |FROM packed GROUP BY source, batch_id
        |ORDER BY source, batch_id""".stripMargin,

    "q79_dataset_card" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS nt,
        |    md5(text) AS h
        |  FROM documents)
        |SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  round(1.0 - COUNT(DISTINCT h) / CAST(COUNT(*) AS DOUBLE), 6) AS exact_dup_rate,
        |  round(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS mean_tokens
        |FROM d""".stripMargin,

    "q80_source_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |words AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM toks),
        |g AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
        |  FROM words a
        |  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 3),
        |rep AS (
        |  SELECT doc_id,
        |    ROUND((COUNT(*) - COUNT(DISTINCT sh)) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
        |  FROM g GROUP BY doc_id),
        |bg AS (
        |  SELECT a.doc_id, a.word || ' ' || b.word AS bigram
        |  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM toks WHERE len(w) < 2),
        |lm AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1),
        |lm2 AS (
        |  SELECT bigram, n,
        |    SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS nw1
        |  FROM lm),
        |lp AS (
        |  SELECT doc_id,
        |    ROUND(CAST(SUM(CAST(ROUND(ln(CAST(n AS DOUBLE) / nw1), 9) AS DECIMAL(20,9))) AS DOUBLE)
        |      / COUNT(*), 6) AS avg_logprob
        |  FROM bg JOIN lm2 USING (bigram) GROUP BY doc_id)
        |SELECT d.source, COUNT(*) AS n_docs,
        |  round(CAST(SUM(CAST(rep.dup_ratio AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_dup_ratio,
        |  round(CAST(SUM(CAST(lp.avg_logprob AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_logprob
        |FROM documents d
        |JOIN rep ON rep.doc_id = d.doc_id
        |JOIN lp ON lp.doc_id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin
  )
}
