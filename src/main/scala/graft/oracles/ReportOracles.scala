package graft.oracles

/** DuckDB oracle SQL for the report family — split out of SparkEntry
  * (round 9) purely for registry file size; keys and SQL are the
  * unchanged driver contract (SURVEY §5). */
private[graft] object ReportOracles {
  val sql: Map[String, String] = Map(
    "report_flatten" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS date, event_type, user_id,
        |  COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k, value
        |FROM events""".stripMargin,

    "variant_extract" ->
      """WITH f AS (
        |  SELECT event_id, event_type,
        |    COALESCE(TRY_CAST(json_extract_string(props,'$.k') AS BIGINT), 0) AS k
        |  FROM events
        |), m AS (
        |  SELECT event_id,
        |    CASE event_type
        |      WHEN 'click'    THEN '{"integerValue":"' || CAST(k AS VARCHAR) || '"}'
        |      WHEN 'view'     THEN '{"microsValue":"'  || CAST(k AS VARCHAR) || '000000"}'
        |      WHEN 'purchase' THEN '{"decimalValue":"' || CAST(k AS VARCHAR) || '.75"}'
        |      WHEN 'signup'   THEN '{"value":"'        || CAST(k AS VARCHAR) || '.25"}'
        |      ELSE '{}' END AS mv
        |  FROM f)
        |SELECT event_id,
        |  COALESCE(TRY_CAST(json_extract_string(mv,'$.integerValue') AS BIGINT),
        |           TRY_CAST(json_extract_string(mv,'$.microsValue') AS BIGINT),
        |           CAST(trunc(TRY_CAST(json_extract_string(mv,'$.decimalValue') AS DOUBLE)) AS BIGINT),
        |           CAST(trunc(TRY_CAST(json_extract_string(mv,'$.value') AS DOUBLE)) AS BIGINT),
        |           0) AS vi,
        |  COALESCE(TRY_CAST(json_extract_string(mv,'$.doubleValue') AS DOUBLE),
        |           TRY_CAST(json_extract_string(mv,'$.decimalValue') AS DOUBLE),
        |           TRY_CAST(json_extract_string(mv,'$.value') AS DOUBLE),
        |           0.0) AS vf
        |FROM m""".stripMargin,

    "display_coalesce" ->
      """SELECT c_custkey,
        |  COALESCE(
        |    NULLIF(CASE WHEN c_custkey % 3 = 0 THEN ''
        |                WHEN c_custkey % 3 = 1 THEN NULL
        |                ELSE c_name END, ''),
        |    NULLIF(c_mktsegment, ''), '') AS display
        |FROM customer""".stripMargin,

    "date_iso" ->
      """SELECT raw_date,
        |  CASE WHEN length(raw_date) = 8
        |    THEN substr(raw_date,1,4) || '-' || substr(raw_date,5,2) || '-' || substr(raw_date,7,2)
        |    ELSE raw_date END AS iso_date
        |FROM (SELECT DISTINCT strftime(l_shipdate, '%Y%m%d') AS raw_date FROM lineitem)
        |ORDER BY raw_date""".stripMargin,

    "dim_filter_in" ->
      "SELECT event_id, event_type, user_id FROM events WHERE event_type IN ('click','view')",

    "daily_report" ->
      """SELECT strftime(l_shipdate,'%Y-%m-%d') AS date, l_orderkey, l_linenumber,
        |  l_returnflag AS app_name, l_linestatus AS ad_unit_name,
        |  l_quantity, l_extendedprice, l_discount,
        |  CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT) AS estimated_earnings_micros
        |FROM lineitem WHERE l_returnflag IN ('A','R')
        |ORDER BY date, l_orderkey, l_linenumber""".stripMargin,

    "earnings_total" ->
      """SELECT CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT)
        |  AS total_earnings_micros
        |FROM lineitem""".stripMargin,

    "earnings_usd" ->
      """SELECT ROUND(CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1e6, 2)
        |  AS total_earnings_usd
        |FROM lineitem""".stripMargin,

    "monthly_rollup" ->
      """SELECT strftime(l_shipdate,'%Y-%m') AS month, CAST(weekofyear(l_shipdate) AS INT) AS week,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT) AS earnings_micros,
        |  CAST(COUNT(*) AS BIGINT) AS line_count
        |FROM lineitem GROUP BY month, week ORDER BY month, week""".stripMargin,

    "window_running" ->
      """SELECT event_id, user_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
        |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov_avg7
        |FROM events""".stripMargin,

    "ctr_by_group" ->
      """SELECT user_id, clicks, impressions,
        |  ROUND(CAST(clicks AS DOUBLE) / NULLIF(CAST(impressions AS DOUBLE), 0.0), 6) AS ctr
        |FROM (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS impressions
        |  FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,

    "ctr_spike" ->
      """WITH d AS (
        |  SELECT ts::DATE AS day, user_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
        |  FROM events),
        |rd AS (SELECT MAX(ts::DATE) AS report_date FROM events),
        |last7 AS (
        |  SELECT user_id,
        |    CAST(SUM(is_click) AS DOUBLE) / NULLIF(CAST(SUM(is_view) AS DOUBLE), 0.0) AS avg_ctr_7d
        |  FROM d, rd
        |  WHERE day BETWEEN report_date - 7 AND report_date - 1
        |  GROUP BY user_id),
        |today AS (
        |  SELECT user_id,
        |    CAST(SUM(is_click) AS DOUBLE) / NULLIF(CAST(SUM(is_view) AS DOUBLE), 0.0) AS today_ctr
        |  FROM d, rd WHERE day = report_date GROUP BY user_id)
        |SELECT t.user_id,
        |  ROUND(l.avg_ctr_7d, 4) AS avg_ctr_7d,
        |  ROUND(t.today_ctr, 4) AS today_ctr,
        |  ROUND((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0.0) * 100, 2) AS pct_change
        |FROM today t JOIN last7 l USING (user_id)
        |WHERE ABS((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0.0) * 100) > 25
        |ORDER BY pct_change DESC, user_id""".stripMargin,

    "ctr_spike_scoped" ->
      s"""WITH d AS (
        |  SELECT ts::DATE AS day, user_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
        |  FROM events
        |  WHERE user_id IN (${graft.operators.CtrAlerts.DemoUnitAllowlist.mkString(", ")})),
        |rd AS (SELECT MAX(ts::DATE) AS report_date FROM events),
        |last7 AS (
        |  SELECT user_id,
        |    CAST(SUM(is_click) AS DOUBLE) / NULLIF(CAST(SUM(is_view) AS DOUBLE), 0.0) AS avg_ctr_7d
        |  FROM d, rd
        |  WHERE day BETWEEN report_date - 7 AND report_date - 1
        |  GROUP BY user_id),
        |today AS (
        |  SELECT user_id,
        |    CAST(SUM(is_click) AS DOUBLE) / NULLIF(CAST(SUM(is_view) AS DOUBLE), 0.0) AS today_ctr
        |  FROM d, rd WHERE day = report_date GROUP BY user_id)
        |SELECT t.user_id,
        |  ROUND(l.avg_ctr_7d, 4) AS avg_ctr_7d,
        |  ROUND(t.today_ctr, 4) AS today_ctr,
        |  ROUND((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0.0) * 100, 2) AS pct_change
        |FROM today t JOIN last7 l USING (user_id)
        |WHERE ABS((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0.0) * 100) > 25
        |ORDER BY pct_change DESC, user_id""".stripMargin,

    "distinct_units" ->
      """SELECT DISTINCT event_type
        |FROM events, (SELECT MAX(ts::DATE) AS report_date FROM events)
        |WHERE ts::DATE = report_date ORDER BY event_type""".stripMargin,

    "alert_report" ->
      """WITH d AS (
        |  SELECT ts::DATE AS day, user_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
        |  FROM events),
        |rd AS (SELECT MAX(ts::DATE) AS report_date FROM events),
        |last7 AS (
        |  SELECT user_id,
        |    CAST(SUM(is_click) AS DOUBLE) / NULLIF(CAST(SUM(is_view) AS DOUBLE), 0.0) AS avg_ctr_7d
        |  FROM d, rd
        |  WHERE day BETWEEN report_date - 7 AND report_date - 1
        |  GROUP BY user_id),
        |today AS (
        |  SELECT user_id,
        |    CAST(SUM(is_click) AS DOUBLE) / NULLIF(CAST(SUM(is_view) AS DOUBLE), 0.0) AS today_ctr
        |  FROM d, rd WHERE day = report_date GROUP BY user_id),
        |spike AS (
        |  SELECT t.user_id,
        |    ROUND((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0.0) * 100, 2) AS pct_change
        |  FROM today t JOIN last7 l USING (user_id)
        |  WHERE ABS((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0.0) * 100) > 25),
        |lines AS (
        |  SELECT 'app_' || CAST(user_id % 5 AS VARCHAR) AS app_name, user_id,
        |    '- user_' || CAST(user_id AS VARCHAR) || ' is ' ||
        |    CASE WHEN pct_change > 0 THEN 'above' ELSE 'below' END ||
        |    ' 25% of 7-day avg' AS line
        |  FROM spike)
        |SELECT app_name, CAST(COUNT(*) AS BIGINT) AS alert_count,
        |  string_agg(line, chr(10) ORDER BY user_id) AS report
        |FROM lines GROUP BY app_name ORDER BY app_name""".stripMargin,

    "asof_attribution" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, ts FROM events
        |      WHERE event_type = 'view')
        |SELECT c.click_id, c.user_id, v.view_id AS attributed_view_id
        |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
        |ORDER BY click_id""".stripMargin,

    "report_spec_demo" ->
      """SELECT strftime(l_shipdate, '%Y-%m-%d') AS date, l_returnflag AS app_name,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS estimated_earnings_micros,
        |  CAST(COUNT(*) AS BIGINT) AS matched_requests
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |GROUP BY date, app_name ORDER BY date, app_name""".stripMargin,

    "report_spec_mediation" ->
      """WITH agg AS (
        |  SELECT strftime(l_shipdate, '%Y-%m-%d') AS date,
        |    l_returnflag AS app_name, l_linestatus AS ad_unit_name,
        |    'src_' || CAST(l_partkey % 5 AS VARCHAR) AS ad_source,
        |    'inst_' || CAST(l_partkey % 20 AS VARCHAR) AS ad_source_instance,
        |    'mg_' || CAST(l_suppkey % 4 AS VARCHAR) AS mediation_group,
        |    n.n_name AS country,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ad_requests,
        |    CAST(SUM(CASE WHEN l_discount > 0 AND l_quantity <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS estimated_earnings_micros,
        |    CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT) AS impressions,
        |    CAST(COUNT(*) AS BIGINT) AS matched_requests
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE l_shipdate >= DATE '1996-03-15' AND l_shipdate < DATE '1996-03-16'
        |  GROUP BY 1, 2, 3, 4, 5, 6, 7)
        |SELECT date, app_name, ad_unit_name, ad_source, ad_source_instance,
        |  mediation_group, country, ad_requests, clicks,
        |  estimated_earnings_micros, impressions,
        |  ROUND(CAST(clicks AS DOUBLE) / NULLIF(CAST(impressions AS DOUBLE), 0.0), 6) AS impression_ctr,
        |  matched_requests,
        |  ROUND(CAST(matched_requests AS DOUBLE) / NULLIF(CAST(ad_requests AS DOUBLE), 0.0), 6) AS match_rate,
        |  CAST(CASE WHEN impressions > 0 THEN (estimated_earnings_micros * 1000) // impressions END AS BIGINT)
        |    AS observed_ecpm_micros
        |FROM agg ORDER BY date""".stripMargin,

    "report_spec_network" ->
      """WITH agg AS (
        |  SELECT strftime(l_shipdate, '%Y-%m-%d') AS date,
        |    strftime(l_shipdate, '%Y-%m') AS month,
        |    CAST(weekofyear(l_shipdate) AS INT) AS week,
        |    'src_' || CAST(l_partkey % 5 AS VARCHAR) AS ad_source,
        |    'inst_' || CAST(l_partkey % 20 AS VARCHAR) AS ad_source_instance,
        |    l_linestatus AS ad_unit_name, l_returnflag AS app_name,
        |    'mg_' || CAST(l_suppkey % 4 AS VARCHAR) AS mediation_group,
        |    n.n_name AS country,
        |    'v' || CAST(l_linenumber AS VARCHAR) AS app_version_name,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ad_requests,
        |    CAST(SUM(CASE WHEN l_discount > 0 AND l_quantity <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS estimated_earnings_micros,
        |    CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT) AS impressions,
        |    CAST(COUNT(*) AS BIGINT) AS matched_requests
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE l_shipdate >= DATE '1996-03-15' AND l_shipdate < DATE '1996-03-16'
        |  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
        |SELECT date, month, week, ad_source, ad_source_instance, ad_unit_name,
        |  app_name, mediation_group, country, app_version_name,
        |  ad_requests, clicks, estimated_earnings_micros, impressions,
        |  ROUND(CAST(clicks AS DOUBLE) / NULLIF(CAST(impressions AS DOUBLE), 0.0), 6) AS impression_ctr,
        |  ROUND(CAST(estimated_earnings_micros AS DOUBLE) / 1000.0
        |    / NULLIF(CAST(impressions AS DOUBLE), 0.0), 6) AS impression_rpm,
        |  ROUND(CAST(matched_requests AS DOUBLE) / NULLIF(CAST(ad_requests AS DOUBLE), 0.0), 6) AS match_rate,
        |  ROUND(CAST(impressions AS DOUBLE) / NULLIF(CAST(matched_requests AS DOUBLE), 0.0), 6) AS show_rate
        |FROM agg ORDER BY date""".stripMargin,

    "top_customers" ->
      """SELECT o.o_custkey AS custkey, c.c_name, c.c_mktsegment,
        |  CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS revenue_micros,
        |  CAST(COUNT(*) AS BIGINT) AS line_count
        |FROM orders o
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY custkey, c.c_name, c.c_mktsegment
        |ORDER BY revenue_micros DESC, custkey LIMIT 10""".stripMargin,

    "earnings_cube" ->
      """SELECT l_returnflag AS app_name, l_linestatus AS ad_unit_name,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS earnings_micros,
        |  CAST(COUNT(*) AS BIGINT) AS line_count,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, app_name ASC NULLS FIRST, ad_unit_name ASC NULLS FIRST""".stripMargin,

    "earnings_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  CAST(COUNT(*) AS BIGINT) AS line_count
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Bin + bound math is plain IEEE both engines; the per-bin value
    // sum is a 1e-4-quantized INTEGER sum (order-independent).
    "value_histogram" ->
      """WITH b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
        |binned AS (
        |  SELECT CASE WHEN mx > mn
        |           THEN CAST(LEAST(floor((value - mn) / ((mx - mn) / 20)), 19) AS BIGINT)
        |           ELSE 0 END AS bucket,
        |         value, mn, mx
        |  FROM events, b)
        |SELECT bucket,
        |  floor((mn + bucket * ((mx - mn) / 20)) * 1e6 + 0.5) / 1e6 AS bucket_lo,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4
        |    AS total_value
        |FROM binned GROUP BY bucket, mn, mx ORDER BY bucket""".stripMargin,

    // Heaviest key = ORDER BY n DESC, key DESC LIMIT 1 — exactly what
    // Spark's max(struct(n, key)) picks; ratios use the floor-form
    // rounding policy.
    "key_skew" ->
      """WITH ku AS (SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n
        |            FROM events GROUP BY user_id),
        |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |        CAST(SUM(n) AS BIGINT) AS n_rows,
        |        CAST(MAX(n) AS BIGINT) AS max_rows FROM ku),
        |uh AS (SELECT key FROM ku ORDER BY n DESC, key DESC LIMIT 1),
        |ke AS (SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM events GROUP BY event_type),
        |e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |        CAST(SUM(n) AS BIGINT) AS n_rows,
        |        CAST(MAX(n) AS BIGINT) AS max_rows FROM ke),
        |eh AS (SELECT key FROM ke ORDER BY n DESC, key DESC LIMIT 1)
        |SELECT 'user_id' AS key_col, u.n_keys, u.n_rows, u.max_rows,
        |  CAST(uh.key AS VARCHAR) AS heaviest_key,
        |  floor(CAST(u.max_rows AS DOUBLE) / CAST(u.n_rows AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS top_share,
        |  floor(CAST(u.max_rows AS DOUBLE) /
        |    (CAST(u.n_rows AS DOUBLE) / CAST(u.n_keys AS DOUBLE))
        |    * 1e4 + 0.5) / 1e4 AS skew_factor
        |FROM u, uh
        |UNION ALL
        |SELECT 'event_type', e.n_keys, e.n_rows, e.max_rows,
        |  CAST(eh.key AS VARCHAR),
        |  floor(CAST(e.max_rows AS DOUBLE) / CAST(e.n_rows AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6,
        |  floor(CAST(e.max_rows AS DOUBLE) /
        |    (CAST(e.n_rows AS DOUBLE) / CAST(e.n_keys AS DOUBLE))
        |    * 1e4 + 0.5) / 1e4
        |FROM e, eh
        |ORDER BY key_col""".stripMargin,

    // The oracle is the EXACT semi-join — the Bloom pre-filter is a
    // shuffle-reduction structure whose false positives the confirm
    // join removes, so it must be invisible in the result.
    "bloom_semi_join" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT) AS qrev
        |  FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                       WHERE o_orderpriority = '1-URGENT'))
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  floor(CAST(SUM(qrev) AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Bloom calibration audit: pinned frame (positions are Spark
    // xxhash64, not SQL-replicable — the lsh_precision convention);
    // re-pin when bits/hashes or the key predicate change.
    "bloom_fpr" ->
      """SELECT * FROM (VALUES (131072, 5, CAST(2978 AS BIGINT),
        |  CAST(14057 AS BIGINT), CAST(107246 AS BIGINT),
        |  CAST(12022 AS BIGINT), CAST(1 AS BIGINT), CAST(83 AS BIGINT)))
        |  AS t(bits, hashes, n_keys, set_bits, fill_ppm, n_negatives,
        |       n_false_pos, fpr_ppm)""".stripMargin,

    // Integer day lags; one array-quantile per group on exact operands.
    "ship_lag_percentiles" ->
      """WITH j AS (SELECT o_orderpriority,
        |    (l_shipdate::DATE - o_orderdate::DATE) AS lag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority,
        |  ROUND(quantile_cont(CAST(lag AS DOUBLE), 0.5), 4) AS p50,
        |  ROUND(quantile_cont(CAST(lag AS DOUBLE), 0.9), 4) AS p90,
        |  ROUND(quantile_cont(CAST(lag AS DOUBLE), 0.99), 4) AS p99,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // p0 rounded to 6dp BEFORE shrinkage so every group shrinks toward
    // the identical prior; zero-impression items report exactly p0.
    "ctr_shrunk" ->
      """WITH ev AS (SELECT
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
        |  FROM events WHERE event_type IN ('click', 'view')),
        |i AS (SELECT item, CAST(SUM(is_click) AS BIGINT) AS clicks,
        |        CAST(SUM(is_view) AS BIGINT) AS impressions
        |      FROM ev GROUP BY 1),
        |t AS (SELECT floor(CAST(SUM(is_click) AS DOUBLE)
        |        / NULLIF(CAST(SUM(is_view) AS DOUBLE), 0.0)
        |        * 1e6 + 0.5) / 1e6 AS p0 FROM ev)
        |SELECT item, clicks, impressions,
        |  ROUND(CAST(clicks AS DOUBLE) / NULLIF(CAST(impressions AS DOUBLE), 0.0), 6) AS ctr_raw,
        |  floor((CAST(clicks AS DOUBLE) + 100.0 * p0)
        |    / (CAST(impressions AS DOUBLE) + 100.0) * 1e6 + 0.5) / 1e6 AS ctr_shrunk,
        |  p0
        |FROM i CROSS JOIN t ORDER BY item""".stripMargin,

    // Wilson score interval per item CTR: the engine's exact double
    // sequence (z² written 1.96 * 1.96), NULL bounds on
    // zero-impression items via NULLIF.
    "ctr_wilson" ->
      """WITH ev AS (SELECT
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
        |  FROM events WHERE event_type IN ('click', 'view')),
        |i AS (SELECT item, CAST(SUM(is_click) AS BIGINT) AS clicks,
        |        CAST(SUM(is_view) AS BIGINT) AS impressions
        |      FROM ev GROUP BY 1),
        |c AS (SELECT item, clicks, impressions,
        |    CAST(clicks AS DOUBLE) / NULLIF(CAST(impressions AS DOUBLE), 0.0)
        |      AS phat,
        |    CAST(impressions AS DOUBLE) AS nd,
        |    1.96 * 1.96 AS z2
        |  FROM i),
        |d AS (SELECT *, phat + z2 / NULLIF(2.0 * nd, 0.0) AS center,
        |    CASE WHEN phat <= 1.0 THEN
        |      1.96 * sqrt(phat * (1.0 - phat) / NULLIF(nd, 0.0)
        |                 + z2 / NULLIF(4.0 * nd * nd, 0.0))
        |    END AS margin,
        |    1.0 + z2 / NULLIF(nd, 0.0) AS denom
        |  FROM c)
        |SELECT item, clicks, impressions,
        |  floor(phat * 1e6 + 0.5) / 1e6 AS ctr_raw,
        |  floor((center - margin) / denom * 1e6 + 0.5) / 1e6 AS wilson_low,
        |  floor((center + margin) / denom * 1e6 + 0.5) / 1e6 AS wilson_high
        |FROM d ORDER BY item""".stripMargin,

    // KLL-family sketch percentiles per returnflag (fixed compactor
    // path ⇒ deterministic); exact counts ride along.
    "earnings_percentiles_approx" ->
      """SELECT * FROM (VALUES
        |  ('A', CAST(52832.76 AS DOUBLE), CAST(94628.55 AS DOUBLE),
        |   CAST(103922.45 AS DOUBLE), CAST(20028 AS BIGINT)),
        |  ('N', CAST(53042.23 AS DOUBLE), CAST(94480.99 AS DOUBLE),
        |   CAST(104001.38 AS DOUBLE), CAST(19926 AS BIGINT)),
        |  ('R', CAST(53219.57 AS DOUBLE), CAST(94969.75 AS DOUBLE),
        |   CAST(103912.57 AS DOUBLE), CAST(20046 AS BIGINT))
        |) AS t(l_returnflag, p50, p90, p99, line_count)""".stripMargin,

    // Quantile-sketch calibration audit: the approx leg is the same
    // deterministic compactor path as earnings_percentiles_approx,
    // the exact leg the true order statistic — pinned from a verified
    // sf0.01 dump (the HLL-audit convention); ReportSpecSpec pins the
    // rank-error band scale-independently.
    "quantile_sketch_err" ->
      """SELECT * FROM (VALUES
        |  ('A', CAST(50 AS BIGINT), CAST(52840.435 AS DOUBLE),
        |   CAST(52832.76 AS DOUBLE), CAST(-1 AS BIGINT), CAST(20028 AS BIGINT)),
        |  ('A', CAST(90 AS BIGINT), CAST(94633.316 AS DOUBLE),
        |   CAST(94628.55 AS DOUBLE), CAST(0 AS BIGINT), CAST(20028 AS BIGINT)),
        |  ('A', CAST(99 AS BIGINT), CAST(103928.9112 AS DOUBLE),
        |   CAST(103922.45 AS DOUBLE), CAST(0 AS BIGINT), CAST(20028 AS BIGINT)),
        |  ('N', CAST(50 AS BIGINT), CAST(53052.915 AS DOUBLE),
        |   CAST(53042.23 AS DOUBLE), CAST(-2 AS BIGINT), CAST(19926 AS BIGINT)),
        |  ('N', CAST(90 AS BIGINT), CAST(94493.455 AS DOUBLE),
        |   CAST(94480.99 AS DOUBLE), CAST(-1 AS BIGINT), CAST(19926 AS BIGINT)),
        |  ('N', CAST(99 AS BIGINT), CAST(104004.635 AS DOUBLE),
        |   CAST(104001.38 AS DOUBLE), CAST(0 AS BIGINT), CAST(19926 AS BIGINT)),
        |  ('R', CAST(50 AS BIGINT), CAST(53230.485 AS DOUBLE),
        |   CAST(53219.57 AS DOUBLE), CAST(-2 AS BIGINT), CAST(20046 AS BIGINT)),
        |  ('R', CAST(90 AS BIGINT), CAST(94972.78 AS DOUBLE),
        |   CAST(94969.75 AS DOUBLE), CAST(0 AS BIGINT), CAST(20046 AS BIGINT)),
        |  ('R', CAST(99 AS BIGINT), CAST(103916.08 AS DOUBLE),
        |   CAST(103912.57 AS DOUBLE), CAST(0 AS BIGINT), CAST(20046 AS BIGINT))
        |) AS t(l_returnflag, pct, exact_p, approx_p, err_bp, line_count)""".stripMargin,

    // HLL++ estimates per event type (deterministic register path;
    // AlertsSpec pins the ≤5%-of-exact band at every scale).
    "approx_distinct_users" ->
      """SELECT * FROM (VALUES
        |  ('click', CAST(150 AS BIGINT)), ('error', CAST(150 AS BIGINT)),
        |  ('purchase', CAST(150 AS BIGINT)), ('signup', CAST(150 AS BIGINT)),
        |  ('view', CAST(150 AS BIGINT))
        |) AS t(event_type, approx_users)""".stripMargin,

    // HLL calibration audit: estimates are engine-specific register
    // arithmetic → pinned from a verified sf0.01 dump (at 150 users
    // the Datasketches HLL is still in exact sparse mode — error 0);
    // AlertsSpec pins the error BAND at other scales.
    "hll_error_audit" ->
      """SELECT * FROM (VALUES
        |  ('click', CAST(150 AS BIGINT), CAST(150 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('error', CAST(150 AS BIGINT), CAST(150 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('purchase', CAST(150 AS BIGINT), CAST(150 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('signup', CAST(150 AS BIGINT), CAST(150 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('view', CAST(150 AS BIGINT), CAST(150 AS BIGINT), CAST(0 AS BIGINT))
        |) AS t(event_type, exact_users, approx_users, error_bp)""".stripMargin,

    // HLL sketch rollup at (type,day)/type/total levels.
    "hll_rollup" ->
      """WITH r("level", event_type, "day", approx_users) AS (VALUES
        |  ('total',NULL,NULL,150), ('type','click',NULL,150), ('type','error',NULL,150), ('type','purchase',NULL,150),
        |  ('type','signup',NULL,150), ('type','view',NULL,150), ('type_day','click','2024-01-01',60), ('type_day','click','2024-01-02',57),
        |  ('type_day','click','2024-01-03',53), ('type_day','click','2024-01-04',53), ('type_day','click','2024-01-05',49), ('type_day','click','2024-01-06',56),
        |  ('type_day','click','2024-01-07',57), ('type_day','click','2024-01-08',51), ('type_day','click','2024-01-09',42), ('type_day','click','2024-01-10',49),
        |  ('type_day','click','2024-01-11',55), ('type_day','click','2024-01-12',54), ('type_day','click','2024-01-13',51), ('type_day','click','2024-01-14',49),
        |  ('type_day','click','2024-01-15',46), ('type_day','click','2024-01-16',62), ('type_day','click','2024-01-17',58), ('type_day','click','2024-01-18',65),
        |  ('type_day','click','2024-01-19',48), ('type_day','click','2024-01-20',62), ('type_day','click','2024-01-21',44), ('type_day','click','2024-01-22',54),
        |  ('type_day','click','2024-01-23',45), ('type_day','click','2024-01-24',61), ('type_day','click','2024-01-25',52), ('type_day','click','2024-01-26',53),
        |  ('type_day','click','2024-01-27',62), ('type_day','click','2024-01-28',52), ('type_day','click','2024-01-29',50), ('type_day','click','2024-01-30',51),
        |  ('type_day','error','2024-01-01',60), ('type_day','error','2024-01-02',48), ('type_day','error','2024-01-03',55), ('type_day','error','2024-01-04',47),
        |  ('type_day','error','2024-01-05',61), ('type_day','error','2024-01-06',51), ('type_day','error','2024-01-07',45), ('type_day','error','2024-01-08',47),
        |  ('type_day','error','2024-01-09',63), ('type_day','error','2024-01-10',57), ('type_day','error','2024-01-11',54), ('type_day','error','2024-01-12',57),
        |  ('type_day','error','2024-01-13',55), ('type_day','error','2024-01-14',48), ('type_day','error','2024-01-15',49), ('type_day','error','2024-01-16',60),
        |  ('type_day','error','2024-01-17',46), ('type_day','error','2024-01-18',67), ('type_day','error','2024-01-19',56), ('type_day','error','2024-01-20',52),
        |  ('type_day','error','2024-01-21',59), ('type_day','error','2024-01-22',54), ('type_day','error','2024-01-23',47), ('type_day','error','2024-01-24',48),
        |  ('type_day','error','2024-01-25',60), ('type_day','error','2024-01-26',48), ('type_day','error','2024-01-27',66), ('type_day','error','2024-01-28',47),
        |  ('type_day','error','2024-01-29',51), ('type_day','error','2024-01-30',54), ('type_day','purchase','2024-01-01',56), ('type_day','purchase','2024-01-02',57),
        |  ('type_day','purchase','2024-01-03',53), ('type_day','purchase','2024-01-04',50), ('type_day','purchase','2024-01-05',61), ('type_day','purchase','2024-01-06',49),
        |  ('type_day','purchase','2024-01-07',50), ('type_day','purchase','2024-01-08',63), ('type_day','purchase','2024-01-09',47), ('type_day','purchase','2024-01-10',51),
        |  ('type_day','purchase','2024-01-11',51), ('type_day','purchase','2024-01-12',60), ('type_day','purchase','2024-01-13',56), ('type_day','purchase','2024-01-14',49),
        |  ('type_day','purchase','2024-01-15',53), ('type_day','purchase','2024-01-16',52), ('type_day','purchase','2024-01-17',52), ('type_day','purchase','2024-01-18',47),
        |  ('type_day','purchase','2024-01-19',60), ('type_day','purchase','2024-01-20',52), ('type_day','purchase','2024-01-21',52), ('type_day','purchase','2024-01-22',57),
        |  ('type_day','purchase','2024-01-23',64), ('type_day','purchase','2024-01-24',46), ('type_day','purchase','2024-01-25',58), ('type_day','purchase','2024-01-26',47),
        |  ('type_day','purchase','2024-01-27',49), ('type_day','purchase','2024-01-28',43), ('type_day','purchase','2024-01-29',66), ('type_day','purchase','2024-01-30',53),
        |  ('type_day','signup','2024-01-01',53), ('type_day','signup','2024-01-02',53), ('type_day','signup','2024-01-03',53), ('type_day','signup','2024-01-04',48),
        |  ('type_day','signup','2024-01-05',52), ('type_day','signup','2024-01-06',60), ('type_day','signup','2024-01-07',53), ('type_day','signup','2024-01-08',50),
        |  ('type_day','signup','2024-01-09',45), ('type_day','signup','2024-01-10',64), ('type_day','signup','2024-01-11',52), ('type_day','signup','2024-01-12',54),
        |  ('type_day','signup','2024-01-13',55), ('type_day','signup','2024-01-14',66), ('type_day','signup','2024-01-15',52), ('type_day','signup','2024-01-16',46),
        |  ('type_day','signup','2024-01-17',49), ('type_day','signup','2024-01-18',61), ('type_day','signup','2024-01-19',43), ('type_day','signup','2024-01-20',59),
        |  ('type_day','signup','2024-01-21',57), ('type_day','signup','2024-01-22',56), ('type_day','signup','2024-01-23',54), ('type_day','signup','2024-01-24',50),
        |  ('type_day','signup','2024-01-25',56), ('type_day','signup','2024-01-26',56), ('type_day','signup','2024-01-27',52), ('type_day','signup','2024-01-28',59),
        |  ('type_day','signup','2024-01-29',49), ('type_day','signup','2024-01-30',54), ('type_day','view','2024-01-01',56), ('type_day','view','2024-01-02',55),
        |  ('type_day','view','2024-01-03',53), ('type_day','view','2024-01-04',53), ('type_day','view','2024-01-05',51), ('type_day','view','2024-01-06',45),
        |  ('type_day','view','2024-01-07',42), ('type_day','view','2024-01-08',50), ('type_day','view','2024-01-09',62), ('type_day','view','2024-01-10',49),
        |  ('type_day','view','2024-01-11',63), ('type_day','view','2024-01-12',62), ('type_day','view','2024-01-13',57), ('type_day','view','2024-01-14',54),
        |  ('type_day','view','2024-01-15',56), ('type_day','view','2024-01-16',50), ('type_day','view','2024-01-17',50), ('type_day','view','2024-01-18',54),
        |  ('type_day','view','2024-01-19',52), ('type_day','view','2024-01-20',52), ('type_day','view','2024-01-21',44), ('type_day','view','2024-01-22',51),
        |  ('type_day','view','2024-01-23',60), ('type_day','view','2024-01-24',47), ('type_day','view','2024-01-25',63), ('type_day','view','2024-01-26',61),
        |  ('type_day','view','2024-01-27',50), ('type_day','view','2024-01-28',54), ('type_day','view','2024-01-29',60), ('type_day','view','2024-01-30',61))
        |SELECT CAST("level" AS VARCHAR) AS "level", CAST(event_type AS VARCHAR) AS event_type, CAST("day" AS DATE) AS "day", CAST(approx_users AS BIGINT) AS approx_users
        |FROM r""".stripMargin,
  )
}
