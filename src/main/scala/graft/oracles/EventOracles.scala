package graft.oracles

/** DuckDB oracle SQL for the event family — split out of SparkEntry
  * (round 9) purely for registry file size; keys and SQL are the
  * unchanged driver contract (SURVEY §5). */
private[graft] object EventOracles {
  import OracleFragments._

  // The unpruned triple count — apriori_triples' oracle (identical to
  // the engine's pruned form by downward closure). The same join
  // chain with `where` restricting the basket events also serves the
  // FP-Growth twin `fpgrowth_triples` (purchase-only baskets — the
  // sparse slice whose lattice MLlib's uncapped miner can walk; hash
  // equality certifies the ML path's counts against exact SQL).
  private def frequentTriplesSql(where: String): String =
    s"""WITH i AS (SELECT DISTINCT user_id,
      |    COALESCE(TRY_CAST(json_extract_string(props,'$$.k') AS BIGINT), 0) AS item
      |  FROM events$where),
      |t AS (SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
      |        CAST(COUNT(*) AS BIGINT) AS support
      |      FROM i a
      |      JOIN i b ON a.user_id = b.user_id AND a.item < b.item
      |      JOIN i c ON b.user_id = c.user_id AND b.item < c.item
      |      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5)
      |SELECT item_a, item_b, item_c, support
      |FROM t ORDER BY support DESC, item_a, item_b, item_c
      |LIMIT 30""".stripMargin

  val sql: Map[String, String] = Map(

    "apriori_triples" -> frequentTriplesSql(""),

    "fpgrowth_triples" ->
      frequentTriplesSql(" WHERE event_type = 'purchase'"),

    "sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us,
        |  ROUND(CAST(MAX(us) - MIN(us) AS DOUBLE) / 1e6, 3) AS duration_sec
        |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,

    // Session-depth conversion: the sessionize window pass with the
    // purchase flag in the same per-session aggregate; depth capped
    // at 10, exact-ppm conversion.
    "session_depth_conversion" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |g AS (SELECT user_id, session_idx, CAST(COUNT(*) AS BIGINT) AS depth,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM s GROUP BY 1, 2),
        |b AS (SELECT LEAST(depth, 10) AS depth_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |    CAST(SUM(converted) AS BIGINT) AS n_converted
        |  FROM g GROUP BY 1)
        |SELECT depth_bucket, n_sessions, n_converted,
        |  CAST((n_converted * 1000000) // n_sessions AS BIGINT) AS conv_ppm
        |FROM b ORDER BY depth_bucket""".stripMargin,

    // Power-user L28 curve: windowed (user, day) dedup, user fold,
    // ≤ 28-row histogram with exact-ppm shares.
    "power_user_curve" ->
      """WITH bo AS (SELECT MAX(ts::DATE) AS d1 FROM events),
        |ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events, bo
        |  WHERE ts::DATE >= d1 - 27),
        |pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS days_active
        |  FROM ud GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pu)
        |SELECT days_active, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST((COUNT(*) * 1000000) // MAX(t.n_total) AS BIGINT)
        |    AS user_share_ppm
        |FROM pu, t GROUP BY 1 ORDER BY days_active""".stripMargin,

    // Day-over-day audience Jaccard on the deduped (user, day) frame.
    // First-seen cohort sizes + calendar running sum = cumulative
    // distinct users; active side from the same (user, day) dedup.
    "user_growth" ->
      """WITH d AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |fs AS (SELECT user_id, MIN(day) AS day FROM d GROUP BY user_id),
        |nu AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new_users
        |       FROM fs GROUP BY day),
        |na AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active_users
        |       FROM d GROUP BY day)
        |SELECT na.day, n_active_users,
        |  COALESCE(n_new_users, 0) AS n_new_users,
        |  CAST(SUM(COALESCE(n_new_users, 0)) OVER (ORDER BY na.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM na LEFT JOIN nu USING (day) ORDER BY day""".stripMargin,

    "audience_overlap" ->
      """WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |sz AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM ud GROUP BY 1),
        |cm AS (SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n_common
        |      FROM ud a JOIN ud b
        |        ON a.user_id = b.user_id AND b.day = a.day + 1
        |      GROUP BY 1)
        |SELECT s.day, s.n AS n_users, t.n AS n_next,
        |  COALESCE(cm.n_common, 0) AS n_common,
        |  floor(CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
        |    / CAST(s.n + t.n - COALESCE(cm.n_common, 0) AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS jaccard,
        |  (COALESCE(cm.n_common, 0) * 1000000) // s.n AS retained_ppm
        |FROM sz s JOIN sz t ON t.day = s.day + 1
        |LEFT JOIN cm ON cm.day = s.day
        |ORDER BY s.day""".stripMargin,

    // Trending items: 2^(horizon-age) integer weights, top-20 by
    // decayed mass, smaller-item ties.
    "trending_items" ->
      """WITH md AS (SELECT max(ts::DATE) AS report_date FROM events),
        |e AS (SELECT
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item,
        |    report_date - ts::DATE AS age
        |  FROM events, md WHERE report_date - ts::DATE <= 20),
        |g AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(1 AS BIGINT) << (20 - age)) AS BIGINT) AS wsum
        |  FROM e GROUP BY item),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY wsum DESC, item) AS rank
        |      FROM g)
        |SELECT CAST(rank AS INT) AS rank, item, n_events,
        |  floor(CAST(wsum AS DOUBLE) / 1048576.0 * 1e4 + 0.5) / 1e4 AS score
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // Nearest as-of: per click the view minimizing |Δ|, ties backward
    // then smallest view_id (ORDER BY abs(d), d, view_id). The oracle
    // theta-joins per user (fine at oracle scale); the Spark side is
    // the two-pass union-and-carry. Grain: µs (the parquet view).
    "asof_nearest" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS vus
        |      FROM events WHERE event_type = 'view'),
        |p AS (SELECT c.click_id, c.user_id, v.view_id,
        |        v.vus - c.cus AS d,
        |        ROW_NUMBER() OVER (PARTITION BY c.click_id
        |          ORDER BY abs(v.vus - c.cus), v.vus - c.cus, v.view_id) AS rn
        |      FROM c LEFT JOIN v ON c.user_id = v.user_id)
        |SELECT click_id, user_id, view_id AS nearest_view_id,
        |  d AS delta_us
        |FROM p WHERE rn = 1 ORDER BY click_id""".stripMargin,

    // Interval-overlap join: the sessionize CTE + calendar campaigns,
    // exact-µs overlap of [ss, se+1) against [start 00:00, end+1 00:00).
    "session_campaign_overlap" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |sess AS (SELECT user_id, session_idx,
        |        MIN(us) AS ss, MAX(us) AS se
        |      FROM s GROUP BY user_id, session_idx),
        |d0 AS (SELECT MIN(ts::DATE) AS day0 FROM events),
        |camp AS (SELECT CAST(r.range AS BIGINT) AS campaign_id,
        |        epoch_us(CAST(day0 + CAST(2 * r.range AS INTEGER) AS TIMESTAMP)) AS cs,
        |        epoch_us(CAST(day0 + CAST(2 * r.range + 5 AS INTEGER) AS TIMESTAMP)) AS ce
        |      FROM range(10) r, d0),
        |ov AS (SELECT campaign_id, user_id, session_idx,
        |        LEAST(se + 1, ce) - GREATEST(ss, cs) AS overlap_us
        |      FROM sess, camp
        |      WHERE LEAST(se + 1, ce) - GREATEST(ss, cs) > 0)
        |SELECT campaign_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  floor(CAST(SUM(overlap_us) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
        |    AS total_overlap_s
        |FROM ov GROUP BY campaign_id ORDER BY campaign_id""".stripMargin,

    "zscore_outliers" ->
      """WITH s AS (
        |  SELECT user_id, AVG(value) AS mu, STDDEV_SAMP(value) AS sd, COUNT(*) AS n
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.value,
        |  ROUND((e.value - s.mu) / s.sd, 4) AS z
        |FROM events e JOIN s USING (user_id)
        |WHERE s.n > 1 AND s.sd > 0 AND ABS((e.value - s.mu) / s.sd) > 3
        |ORDER BY event_id""".stripMargin,

    "interval_join" ->
      """WITH d0 AS (SELECT MIN(ts::DATE) AS day0 FROM events),
        |c AS (SELECT CAST(r.range AS BIGINT) AS campaign_id,
        |        day0 + CAST(2 * r.range AS INTEGER) AS start_day,
        |        day0 + CAST(2 * r.range + 4 AS INTEGER) AS end_day
        |      FROM range(10) r, d0)
        |SELECT c.campaign_id, e.event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  ROUND(SUM(e.value), 4) AS total_value
        |FROM events e JOIN c ON e.ts::DATE BETWEEN c.start_day AND c.end_day
        |GROUP BY c.campaign_id, e.event_type
        |ORDER BY campaign_id, event_type""".stripMargin,

    // Grid = per-user day span exploded; forward fill via
    // last_value IGNORE NULLS over the same user/day order; daily
    // totals are 1e-4-quantized integer sums (order-independent).
    "daily_fill" ->
      """WITH daily AS (
        |  SELECT user_id, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4
        |      AS day_total,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id, ts::DATE),
        |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |         FROM daily GROUP BY user_id),
        |g0 AS (SELECT user_id, d0, unnest(generate_series(0, d1 - d0)) AS i
        |       FROM span),
        |grid AS (SELECT user_id, d0 + CAST(i AS INTEGER) AS day FROM g0)
        |SELECT g.user_id, g.day,
        |  last_value(d.day_total IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_total,
        |  COALESCE(d.n_events, 0) AS n_events,
        |  d.day_total IS NOT NULL AS is_observed
        |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,

    // Ordered-step funnel: each step's min-time is strictly after the
    // previous step's; conv_pct uses the floor-form rounding so the
    // halfway double rounds identically in both engines.
    // Funnel per md5-parity arm: the funnel_steps CTEs with the arm
    // riding the group keys; conversion vs each arm's own step-1 base,
    // lift in floor-rounded percentage points.
    "funnel_by_arm" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM events),
        |v AS (SELECT arm, user_id, MIN(us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (SELECT e.arm, e.user_id, MIN(e.us) AS t2 FROM e
        |      JOIN v ON e.arm = v.arm AND e.user_id = v.user_id AND e.us > v.t1
        |      WHERE e.event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT e.arm, e.user_id, MIN(e.us) AS t3 FROM e
        |      JOIN c ON e.arm = c.arm AND e.user_id = c.user_id AND e.us > c.t2
        |      WHERE e.event_type = 'purchase' GROUP BY 1, 2),
        |s AS (SELECT 'view' AS step, 1 AS ord,
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE arm = 0) AS users_0,
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM v WHERE arm = 1) AS users_1
        |      UNION ALL SELECT 'click', 2,
        |        (SELECT COUNT(*) FROM c WHERE arm = 0),
        |        (SELECT COUNT(*) FROM c WHERE arm = 1)
        |      UNION ALL SELECT 'purchase', 3,
        |        (SELECT COUNT(*) FROM p WHERE arm = 0),
        |        (SELECT COUNT(*) FROM p WHERE arm = 1)),
        |r AS (SELECT step, ord, users_0, users_1,
        |    CASE WHEN (SELECT users_0 FROM s WHERE ord = 1) = 0 THEN 0.0
        |      ELSE floor(CAST(users_0 AS DOUBLE) /
        |        CAST((SELECT users_0 FROM s WHERE ord = 1) AS DOUBLE)
        |        * 100 * 100 + 0.5) / 100 END AS conv_pct_0,
        |    CASE WHEN (SELECT users_1 FROM s WHERE ord = 1) = 0 THEN 0.0
        |      ELSE floor(CAST(users_1 AS DOUBLE) /
        |        CAST((SELECT users_1 FROM s WHERE ord = 1) AS DOUBLE)
        |        * 100 * 100 + 0.5) / 100 END AS conv_pct_1
        |  FROM s)
        |SELECT step, ord, users_0, users_1, conv_pct_0, conv_pct_1,
        |  floor((conv_pct_1 - conv_pct_0) * 100 + 0.5) / 100 AS lift_pp
        |FROM r ORDER BY ord""".stripMargin,

    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e
        |      JOIN v ON e.user_id = v.user_id AND e.us > v.t1
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e
        |      JOIN c ON e.user_id = c.user_id AND e.us > c.t2
        |      WHERE e.event_type = 'purchase' GROUP BY 1),
        |s AS (SELECT 'view' AS step, 1 AS ord,
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS users
        |      UNION ALL SELECT 'click', 2, (SELECT COUNT(*) FROM c)
        |      UNION ALL SELECT 'purchase', 3, (SELECT COUNT(*) FROM p))
        |SELECT step, ord, users,
        |  CASE WHEN (SELECT users FROM s WHERE ord = 1) = 0 THEN 0.0
        |    ELSE floor(CAST(users AS DOUBLE) /
        |      CAST((SELECT users FROM s WHERE ord = 1) AS DOUBLE)
        |      * 100 * 100 + 0.5) / 100 END AS conv_pct
        |FROM s ORDER BY ord""".stripMargin,

    "cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT f.cohort_day,
        |  CAST(datediff('day', f.cohort_day, a.day) AS INT) AS day_offset,
        |  CAST(COUNT(*) AS BIGINT) AS users
        |FROM a JOIN f ON a.user_id = f.user_id
        |WHERE datediff('day', f.cohort_day, a.day) BETWEEN 0 AND 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Wide day × event-type report; sums quantized to integer micros
    // before aggregation so the totals are addition-order independent.
    "pivot_report" ->
      """WITH q AS (SELECT ts::DATE AS day, event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv FROM events)
        |SELECT day,
        |  floor(CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN qv END), 0) AS DOUBLE) / 100 + 0.5) / 1e4 AS click,
        |  floor(CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN qv END), 0) AS DOUBLE) / 100 + 0.5) / 1e4 AS "error",
        |  floor(CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN qv END), 0) AS DOUBLE) / 100 + 0.5) / 1e4 AS purchase,
        |  floor(CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN qv END), 0) AS DOUBLE) / 100 + 0.5) / 1e4 AS signup,
        |  floor(CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN qv END), 0) AS DOUBLE) / 100 + 0.5) / 1e4 AS "view"
        |FROM q GROUP BY day ORDER BY day""".stripMargin,

    "event_transitions" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |           FROM events),
        |t AS (SELECT event_type, lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS prev_type FROM e),
        |g AS (SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, SUM(n) OVER (PARTITION BY prev_type) AS row_total FROM g)
        |SELECT prev_type, event_type, n,
        |  floor(CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) * 1e4 + 0.5) / 1e4 AS p
        |FROM r ORDER BY prev_type, event_type""".stripMargin,

    "rolling_reach" ->
      """WITH a AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |d AS (SELECT DISTINCT day FROM a),
        |c AS (SELECT a.user_id, a.day + CAST(g.i AS INTEGER) AS day
        |      FROM a, generate_series(0, 6) AS g(i))
        |SELECT c.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS users_7d
        |FROM c JOIN d USING (day)
        |GROUP BY c.day ORDER BY c.day""".stripMargin,

    "range_window" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv FROM events)
        |SELECT event_id, user_id, us,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
        |  floor(CAST(SUM(qv) OVER w AS DOUBLE) / 100 + 0.5) / 1e4 AS sum_win
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Integer-exact EWMA: weights are literal powers of two, so num and
    // den are exact BIGINT sums on both engines (DuckDB's HUGEINT SUM
    // only feeds the final CAST AS DOUBLE); λ = 1/2, horizon 14.
    "ewma_smooth" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qrev
        |  FROM events GROUP BY 1, 2),
        |contrib AS (
        |  SELECT d.event_type, d.day + CAST(g.i AS INTEGER) AS day,
        |    SUM(d.qrev * (CAST(1 AS BIGINT) << (13 - CAST(g.i AS INTEGER)))) AS num,
        |    SUM(CAST(1 AS BIGINT) << (13 - CAST(g.i AS INTEGER))) AS den
        |  FROM daily d, generate_series(0, 13) AS g(i)
        |  GROUP BY 1, 2)
        |SELECT d.event_type, d.day,
        |  floor(CAST(d.qrev AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue,
        |  floor(CAST(c.num AS DOUBLE) / CAST(c.den AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS ewma
        |FROM daily d JOIN contrib c ON d.event_type = c.event_type AND d.day = c.day
        |ORDER BY d.event_type, d.day""".stripMargin,

    // Time-of-week is pure arithmetic ((days-since-epoch) mod 7), NOT
    // dayofweek() — week-start conventions differ between engines and
    // the bucket is only a category. E and (O−E)²/E mirror the Spark
    // expression order exactly; rounding happens once at the edge.
    "chi2_contingency" ->
      """WITH cells AS (SELECT event_type,
        |    CAST((ts::DATE - DATE '1970-01-01') % 7 AS INT) AS tow,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT tow, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
        |SELECT c.event_type, c.tow, c.o,
        |  floor(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS e,
        |  floor((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    * 1e4 + 0.5) / 1e4 AS contrib
        |FROM cells c JOIN rt USING (event_type) JOIN ct USING (tow), n
        |ORDER BY c.event_type, c.tow""".stripMargin,

    // Adjusted residuals share chi2_contingency's cells/margins CTEs;
    // the multiply chain and the nullif'd sqrt denominator mirror the
    // Spark expression ORDER exactly so the driving flag compares the
    // same double.
    "chi2_residuals" ->
      """WITH cells AS (SELECT event_type,
        |    CAST((ts::DATE - DATE '1970-01-01') % 7 AS INT) AS tow,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT tow, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |x AS (SELECT c.event_type, c.tow, c.o,
        |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS e,
        |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      / NULLIF(sqrt((CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (1.0 - CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (1.0 - CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))), 0.0) AS resid
        |  FROM cells c JOIN rt USING (event_type) JOIN ct USING (tow), n)
        |SELECT event_type, tow, o,
        |  floor(e * 1e4 + 0.5) / 1e4 AS e,
        |  floor(resid * 1e4 + 0.5) / 1e4 AS adj_residual,
        |  abs(resid) > 2 AS driving
        |FROM x ORDER BY event_type, tow""".stripMargin,

    // One-way ANOVA per type over the md5-mod-3 arms: exact decimal
    // moments pivoted to fixed arm order, the double combination in
    // ONE deterministic sequence (three s²/n terms, two subtractions,
    // one nullif'd division), F vs the asymptotic F(2,inf)=2.9957.
    "anova_f" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 3 AS arm
        |  FROM events),
        |pa AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(vq AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(vq AS DECIMAL(38,0)) * vq) AS ss
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type,
        |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN arm = 2 THEN n END) AS n2,
        |    MAX(CASE WHEN arm = 0 THEN s END) AS s0,
        |    MAX(CASE WHEN arm = 1 THEN s END) AS s1,
        |    MAX(CASE WHEN arm = 2 THEN s END) AS s2,
        |    MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
        |    MAX(CASE WHEN arm = 1 THEN ss END) AS ss1,
        |    MAX(CASE WHEN arm = 2 THEN ss END) AS ss2
        |  FROM pa GROUP BY 1),
        |calc AS (SELECT event_type, n0, n1, n2,
        |    CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |      + CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS sb,
        |    CAST(s0 + s1 + s2 AS DOUBLE) AS st,
        |    CAST(ss0 + ss1 + ss2 AS DOUBLE) AS sst
        |  FROM w
        |  WHERE n0 IS NOT NULL AND n1 IS NOT NULL AND n2 IS NOT NULL
        |    AND n0 + n1 + n2 > 3),
        |f AS (SELECT event_type, n0, n1, n2,
        |    ((sb - st * st / CAST(n0 + n1 + n2 AS DOUBLE)) / 2.0)
        |      / NULLIF((sst - sb) / CAST(n0 + n1 + n2 - 3 AS DOUBLE), 0.0) AS f
        |  FROM calc)
        |SELECT event_type, n0, n1, n2,
        |  floor(f * 1e6 + 0.5) / 1e6 AS f_stat,
        |  f > 2.9957 AS significant
        |FROM f ORDER BY event_type""".stripMargin,

    // Brown–Forsythe W: lower medians off the (type, arm, value)
    // grid cumsum, exact integer |v − m| z-moments on DECIMAL, then
    // the anova_f double chain verbatim on the z frame.
    "brown_forsythe" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 3 AS arm
        |  FROM events),
        |grid AS (SELECT event_type, arm, vq, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |cum AS (SELECT *, SUM(c) OVER (PARTITION BY event_type, arm
        |      ORDER BY vq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum,
        |    SUM(c) OVER (PARTITION BY event_type, arm) AS n
        |  FROM grid),
        |med AS (SELECT event_type, arm, MIN(vq) AS m
        |  FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1, 2),
        |pa AS (SELECT g.event_type, g.arm, CAST(SUM(g.c) AS BIGINT) AS n,
        |    SUM(CAST(abs(g.vq - med.m) AS DECIMAL(38,0)) * g.c) AS s,
        |    SUM(CAST(abs(g.vq - med.m) AS DECIMAL(38,0))
        |      * abs(g.vq - med.m) * g.c) AS ss
        |  FROM grid g JOIN med ON med.event_type = g.event_type
        |    AND med.arm = g.arm
        |  GROUP BY 1, 2),
        |w AS (SELECT event_type,
        |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN arm = 2 THEN n END) AS n2,
        |    MAX(CASE WHEN arm = 0 THEN s END) AS s0,
        |    MAX(CASE WHEN arm = 1 THEN s END) AS s1,
        |    MAX(CASE WHEN arm = 2 THEN s END) AS s2,
        |    MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
        |    MAX(CASE WHEN arm = 1 THEN ss END) AS ss1,
        |    MAX(CASE WHEN arm = 2 THEN ss END) AS ss2
        |  FROM pa GROUP BY 1),
        |calc AS (SELECT event_type, n0, n1, n2,
        |    CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |      + CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS sb,
        |    CAST(s0 + s1 + s2 AS DOUBLE) AS st,
        |    CAST(ss0 + ss1 + ss2 AS DOUBLE) AS sst
        |  FROM w
        |  WHERE n0 IS NOT NULL AND n1 IS NOT NULL AND n2 IS NOT NULL
        |    AND n0 + n1 + n2 > 3),
        |f AS (SELECT event_type, n0, n1, n2,
        |    ((sb - st * st / CAST(n0 + n1 + n2 AS DOUBLE)) / 2.0)
        |      / NULLIF((sst - sb) / CAST(n0 + n1 + n2 - 3 AS DOUBLE), 0.0) AS f
        |  FROM calc)
        |SELECT event_type, n0, n1, n2,
        |  floor(f * 1e6 + 0.5) / 1e6 AS w_stat,
        |  f > 2.9957 AS significant
        |FROM f ORDER BY event_type""".stripMargin,

    // Kruskal–Wallis H: doubled midranks off the (type, value) grid,
    // DECIMAL rank sums, tie-corrected; the double combination and
    // the rounded-H significance compare mirror the engine textually.
    // Wilcoxon signed-rank on day-paired purchase/view revenue:
    // doubled midranks on the |d| grid, tie-corrected normal z.
    "wilcoxon_signed_rank" ->
      """WITH daily AS (SELECT
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS ra,
        |    CAST(SUM(CASE WHEN event_type = 'view'
        |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS rb
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |dd AS (SELECT ra - rb AS d FROM daily WHERE ra - rb <> 0),
        |g AS (SELECT abs(d) AS ad, CAST(COUNT(*) AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS np
        |  FROM dd GROUP BY 1),
        |w AS (SELECT *,
        |    CAST(SUM(t) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) - t AS below
        |  FROM g),
        |a AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
        |    SUM(CAST(np AS DECIMAL(38,0)) * (2 * below + t + 1)) AS w2,
        |    SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tcub
        |  FROM w),
        |f AS (SELECT n, CAST(w2 AS BIGINT) AS w_plus_x2,
        |    floor(
        |      (CAST(w2 AS DOUBLE)
        |        - CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 2.0)
        |      / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
        |            * CAST(2 * n + 1 AS DOUBLE) / 6.0
        |          - CAST(tcub AS DOUBLE) / 12.0), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS z
        |  FROM a WHERE n > 0)
        |SELECT n AS n_pairs, w_plus_x2, z,
        |  CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > 1.96 END
        |    AS significant
        |FROM f""".stripMargin,

    // QTE: per (type, arm) nearest-rank quantiles off the cumulative
    // value grid, integer position (q*n+99)//100, exact micro lifts.
    "quantile_lift" ->
      """WITH e AS (SELECT event_type,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT event_type, arm, vq, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |w AS (SELECT *,
        |    CAST(SUM(c) OVER (PARTITION BY event_type, arm ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY event_type, arm) AS BIGINT)
        |      AS n
        |  FROM g),
        |p AS (SELECT event_type, arm, q, CAST(MIN(vq) AS BIGINT) AS v,
        |    CAST(MAX(n) AS BIGINT) AS n
        |  FROM w, (VALUES (25), (50), (75), (90)) AS qq(q)
        |  WHERE cum >= (q * n + 99) // 100
        |  GROUP BY 1, 2, 3)
        |SELECT a0.event_type, CAST(a0.q AS BIGINT) AS q,
        |  a0.n AS n0, a1.n AS n1, a0.v AS v0, a1.v AS v1,
        |  a1.v - a0.v AS lift_micro
        |FROM p a0 JOIN p a1
        |  ON a0.event_type = a1.event_type AND a0.q = a1.q
        |  AND a0.arm = 0 AND a1.arm = 1
        |ORDER BY a0.event_type, q""".stripMargin,

    // Dunn post-hoc: the kruskal_wallis grid/rank chain verbatim, a
    // 3-pair VALUES fan-out on the bounded frame, the engine z chain.
    "dunn_posthoc" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 3 AS arm
        |  FROM events),
        |g AS (SELECT event_type, vq,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT *, c0 + c1 + c2 AS ct,
        |    CAST(SUM(c0 + c1 + c2) OVER (PARTITION BY event_type ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - (c0 + c1 + c2) AS below
        |  FROM g),
        |a AS (SELECT event_type,
        |    CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2,
        |    SUM(CAST(c0 AS DECIMAL(38,0)) * (2 * below + ct + 1)) AS r0,
        |    SUM(CAST(c1 AS DECIMAL(38,0)) * (2 * below + ct + 1)) AS r1,
        |    SUM(CAST(c2 AS DECIMAL(38,0)) * (2 * below + ct + 1)) AS r2,
        |    SUM(CAST(ct AS DECIMAL(38,0)) * ct * ct - ct) AS tcub
        |  FROM w GROUP BY 1),
        |f AS (SELECT *, n0 + n1 + n2 AS nn FROM a
        |  WHERE n0 > 0 AND n1 > 0 AND n2 > 0 AND n0 + n1 + n2 > 3),
        |pr AS (SELECT f.event_type, f.nn, f.tcub,
        |    CAST(p.a AS BIGINT) AS arm_a, CAST(p.b AS BIGINT) AS arm_b,
        |    CASE p.a WHEN 0 THEN n0 WHEN 1 THEN n1 ELSE n2 END AS na,
        |    CASE p.b WHEN 0 THEN n0 WHEN 1 THEN n1 ELSE n2 END AS nb,
        |    CASE p.a WHEN 0 THEN r0 WHEN 1 THEN r1 ELSE r2 END AS ra,
        |    CASE p.b WHEN 0 THEN r0 WHEN 1 THEN r1 ELSE r2 END AS rb
        |  FROM f, (VALUES (0, 1), (0, 2), (1, 2)) AS p(a, b)),
        |zc AS (SELECT event_type, arm_a, arm_b, na AS n_a, nb AS n_b,
        |    floor(CAST(ra AS DOUBLE) / CAST(na AS DOUBLE) / 2.0
        |      * 1e4 + 0.5) / 1e4 AS mean_rank_a,
        |    floor(CAST(rb AS DOUBLE) / CAST(nb AS DOUBLE) / 2.0
        |      * 1e4 + 0.5) / 1e4 AS mean_rank_b,
        |    floor(
        |      (CAST(ra AS DOUBLE) / CAST(na AS DOUBLE)
        |        - CAST(rb AS DOUBLE) / CAST(nb AS DOUBLE))
        |      / NULLIF(2.0 * sqrt(
        |          greatest(
        |            CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE) / 12.0
        |            - CAST(tcub AS DOUBLE)
        |              / (12.0 * CAST(nn - 1 AS DOUBLE)), 0.0)
        |          * (1.0 / CAST(na AS DOUBLE)
        |             + 1.0 / CAST(nb AS DOUBLE))), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS z
        |  FROM pr)
        |SELECT event_type, arm_a, arm_b, n_a, n_b, mean_rank_a,
        |  mean_rank_b, z,
        |  CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > 2.393980 END
        |    AS significant
        |FROM zc ORDER BY event_type, arm_a, arm_b""".stripMargin,

    // Durbin-Watson on the seasonal_strength weekday-model residuals:
    // exact HUGEINT quadratic sums, one double division, heuristic
    // 1.5/2.5 bands.
    "durbin_watson" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT event_type, day, v,
        |    CAST(datediff('day', DATE '1970-01-01', day) % 7 AS BIGINT) AS w
        |  FROM daily),
        |wm AS (SELECT event_type, w,
        |    CAST((CAST(SUM(v) AS HUGEINT) * 1000000) // COUNT(*) AS BIGINT)
        |      AS wmq
        |  FROM dw GROUP BY 1, 2),
        |r AS (SELECT dw.event_type, dw.day,
        |    CAST(dw.v AS HUGEINT) * 1000000 - wmq AS e
        |  FROM dw JOIN wm ON wm.event_type = dw.event_type AND wm.w = dw.w),
        |lg AS (SELECT event_type, e,
        |    lag(e) OVER (PARTITION BY event_type ORDER BY day) AS ep
        |  FROM r),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    SUM(e * e) AS se2,
        |    SUM(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep)
        |        ELSE 0 END) AS sd2
        |  FROM lg GROUP BY 1 HAVING COUNT(*) > 1),
        |d AS (SELECT event_type, n_days,
        |    floor(CAST(sd2 AS DOUBLE) / NULLIF(CAST(se2 AS DOUBLE), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS dw
        |  FROM s)
        |SELECT event_type, n_days, dw,
        |  CASE WHEN dw IS NULL THEN 'undefined'
        |       WHEN dw < 1.5 THEN 'positive'
        |       WHEN dw > 2.5 THEN 'negative'
        |       ELSE 'none' END AS autocorrelation
        |FROM d ORDER BY event_type""".stripMargin,

    // MDE design readout off the ab_test user/arm fold: fixed
    // z-literals 1.959964/0.841621, rounded then NULLIF(0) when the
    // pooled rate carries no variance.
    "power_mde" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase'
        |          AND CAST(make_timestamp(epoch_us(ts)) AS DATE) = report_date
        |        THEN 1 ELSE 0 END) AS converted,
        |    CAST(('0x' || substring(md5('ab:' || CAST(MIN(user_id) AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM events, md GROUP BY user_id),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv1
        |  FROM u),
        |f AS (SELECT n0, n1, conv0, conv1,
        |    NULLIF(floor(
        |      (1.959964 + 0.841621)
        |      * sqrt(CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
        |        * (1.0 - CAST(conv0 + conv1 AS DOUBLE)
        |                 / CAST(n0 + n1 AS DOUBLE))
        |        * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |      * 1e6 + 0.5) / 1e6, 0.0) AS mde,
        |    floor(abs(CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      * 1e6 + 0.5) / 1e6 AS observed_diff
        |  FROM a WHERE n0 > 0 AND n1 > 0)
        |SELECT n0, n1, conv0, conv1, mde, observed_diff,
        |  CASE WHEN mde IS NULL THEN FALSE
        |       ELSE observed_diff > mde END AS adequately_powered
        |FROM f""".stripMargin,

    "kruskal_wallis" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 3 AS arm
        |  FROM events),
        |g AS (SELECT event_type, vq,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT *, c0 + c1 + c2 AS ct,
        |    CAST(SUM(c0 + c1 + c2) OVER (PARTITION BY event_type ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - (c0 + c1 + c2) AS below
        |  FROM g),
        |a AS (SELECT event_type,
        |    CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2,
        |    SUM(CAST(c0 AS DECIMAL(38,0)) * (2 * below + ct + 1)) AS r0,
        |    SUM(CAST(c1 AS DECIMAL(38,0)) * (2 * below + ct + 1)) AS r1,
        |    SUM(CAST(c2 AS DECIMAL(38,0)) * (2 * below + ct + 1)) AS r2,
        |    SUM(CAST(ct AS DECIMAL(38,0)) * ct * ct - ct) AS tcub
        |  FROM w GROUP BY 1),
        |f AS (SELECT *, n0 + n1 + n2 AS nn FROM a
        |  WHERE n0 > 0 AND n1 > 0 AND n2 > 0 AND n0 + n1 + n2 > 3),
        |hv AS (SELECT event_type, n0, n1, n2,
        |    floor(
        |      (3.0 * (CAST(r0 AS DOUBLE) * CAST(r0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |            + CAST(r1 AS DOUBLE) * CAST(r1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |            + CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |         / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
        |       - 3.0 * CAST(nn + 1 AS DOUBLE))
        |      / NULLIF(1.0 - CAST(tcub AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |           - CAST(nn AS DOUBLE)), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS h
        |  FROM f)
        |SELECT event_type, n0, n1, n2, h,
        |  CASE WHEN h IS NULL THEN FALSE ELSE h > 5.9915 END AS significant
        |FROM hv ORDER BY event_type""".stripMargin,

    // Welch t + Cohen's d: anova_f's pivoted integer moments with two
    // arms; means/variances/se²/t/df/d in the engine's exact double
    // sequence; significance compares the ROUNDED t.
    "welch_test" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM events),
        |pa AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(vq AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(vq AS DECIMAL(38,0)) * vq) AS ss
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type,
        |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN arm = 0 THEN s END) AS s0,
        |    MAX(CASE WHEN arm = 1 THEN s END) AS s1,
        |    MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
        |    MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        |  FROM pa GROUP BY 1),
        |c AS (SELECT event_type, n0, n1,
        |    CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    (CAST(ss0 AS DOUBLE)
        |     - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |    / CAST(n0 - 1 AS DOUBLE) AS v0,
        |    (CAST(ss1 AS DOUBLE)
        |     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    / CAST(n1 - 1 AS DOUBLE) AS v1
        |  FROM w WHERE n0 > 1 AND n1 > 1),
        |c2 AS (SELECT *, v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE)
        |    AS se2 FROM c),
        |r AS (SELECT event_type, n0, n1,
        |    floor((m1 - m0) / 1e6 * 1e6 + 0.5) / 1e6 AS mean_diff,
        |    floor((m1 - m0) / NULLIF(sqrt(se2), 0.0) * 1e6 + 0.5) / 1e6
        |      AS t_stat,
        |    floor(se2 * se2
        |      / NULLIF((v0 / CAST(n0 AS DOUBLE)) * (v0 / CAST(n0 AS DOUBLE))
        |                 / CAST(n0 - 1 AS DOUBLE)
        |             + (v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
        |                 / CAST(n1 - 1 AS DOUBLE), 0.0)
        |      * 1e4 + 0.5) / 1e4 AS df,
        |    floor((m1 - m0)
        |      / NULLIF(sqrt((CAST(n0 - 1 AS DOUBLE) * v0
        |                   + CAST(n1 - 1 AS DOUBLE) * v1)
        |                  / CAST(n0 + n1 - 2 AS DOUBLE)), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS cohens_d
        |  FROM c2)
        |SELECT event_type, n0, n1, mean_diff, t_stat, df, cohens_d,
        |  CASE WHEN t_stat IS NULL THEN FALSE
        |    ELSE abs(t_stat) > 1.96 END AS significant
        |FROM r ORDER BY event_type""".stripMargin,

    // Funnel pairing (first view, first strictly-later purchase) in µs;
    // quantile interpolation over exact integer delays, µs→sec + 4dp
    // floor rounding once at the edge.
    "conversion_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.us) AS t2, MIN(v.t1) AS t1
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND e.us > v.t1
        |      GROUP BY 1)
        |SELECT CAST(make_timestamp(t1) AS DATE) AS view_day,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  floor(quantile_cont(CAST(t2 - t1 AS DOUBLE), 0.5) / 1e6 * 1e4 + 0.5) / 1e4 AS p50_sec,
        |  floor(quantile_cont(CAST(t2 - t1 AS DOUBLE), 0.9) / 1e6 * 1e4 + 0.5) / 1e4 AS p90_sec
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // Item id via the report family's variant fallback chain; lift
    // parenthesization mirrors the Spark expression (cf. collocations).
    // Item-item cosine: exact int64 counts, two IEEE sqrts, 6-dp grid
    // BEFORE the per-item rank (grid-stable ordering).
    "item_cosine" ->
      """WITH it AS (SELECT DISTINCT user_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |        CAST(COUNT(*) AS BIGINT) AS c12
        |      FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |c1 AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c1 FROM it GROUP BY 1),
        |sc AS (SELECT item_a, item_b, c12,
        |        floor(CAST(c12 AS DOUBLE)
        |          / (sqrt(CAST(ca.c1 AS DOUBLE)) * sqrt(CAST(cb.c1 AS DOUBLE)))
        |          * 1e6 + 0.5) / 1e6 AS cosine
        |      FROM p JOIN c1 ca ON ca.item = p.item_a
        |             JOIN c1 cb ON cb.item = p.item_b),
        |sym AS (SELECT item_a AS item, item_b AS neighbor, c12, cosine FROM sc
        |        UNION ALL SELECT item_b, item_a, c12, cosine FROM sc),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY item
        |        ORDER BY cosine DESC, neighbor) AS INT) AS "rank" FROM sym)
        |SELECT item, neighbor, c12, cosine, "rank"
        |FROM r WHERE "rank" <= 3 ORDER BY item, "rank"""".stripMargin,

    // DiD over per-user period means on the milli grid; cell moments
    // pivoted to fixed order, Welch SE in the engine's exact double
    // sequence (v11 + v10 + v01 + v00).
    "did_readout" ->
      """WITH pu AS (SELECT user_id,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS period,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv
        |  FROM events),
        |g AS (SELECT user_id, arm, period,
        |    CAST(floor(CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |      / 1000.0 + 0.5) AS BIGINT) AS q
        |  FROM pu GROUP BY 1, 2, 3),
        |c AS (SELECT arm, period, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(q AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(q AS DECIMAL(38,0)) * q) AS ss
        |  FROM g GROUP BY 1, 2),
        |w AS (SELECT
        |    MAX(CASE WHEN arm = 0 AND period = 0 THEN n END) AS n00,
        |    MAX(CASE WHEN arm = 0 AND period = 1 THEN n END) AS n01,
        |    MAX(CASE WHEN arm = 1 AND period = 0 THEN n END) AS n10,
        |    MAX(CASE WHEN arm = 1 AND period = 1 THEN n END) AS n11,
        |    MAX(CASE WHEN arm = 0 AND period = 0 THEN s END) AS s00,
        |    MAX(CASE WHEN arm = 0 AND period = 1 THEN s END) AS s01,
        |    MAX(CASE WHEN arm = 1 AND period = 0 THEN s END) AS s10,
        |    MAX(CASE WHEN arm = 1 AND period = 1 THEN s END) AS s11,
        |    MAX(CASE WHEN arm = 0 AND period = 0 THEN ss END) AS ss00,
        |    MAX(CASE WHEN arm = 0 AND period = 1 THEN ss END) AS ss01,
        |    MAX(CASE WHEN arm = 1 AND period = 0 THEN ss END) AS ss10,
        |    MAX(CASE WHEN arm = 1 AND period = 1 THEN ss END) AS ss11
        |  FROM c),
        |m AS (SELECT *,
        |    CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / 1000.0 AS m00,
        |    CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / 1000.0 AS m01,
        |    CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / 1000.0 AS m10,
        |    CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / 1000.0 AS m11,
        |    (CAST(ss00 AS DOUBLE) - CAST(s00 AS DOUBLE) * CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE))
        |      / (CAST(n00 AS DOUBLE) - 1.0) / CAST(n00 AS DOUBLE) / 1e6 AS v00,
        |    (CAST(ss01 AS DOUBLE) - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE))
        |      / (CAST(n01 AS DOUBLE) - 1.0) / CAST(n01 AS DOUBLE) / 1e6 AS v01,
        |    (CAST(ss10 AS DOUBLE) - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
        |      / (CAST(n10 AS DOUBLE) - 1.0) / CAST(n10 AS DOUBLE) / 1e6 AS v10,
        |    (CAST(ss11 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE))
        |      / (CAST(n11 AS DOUBLE) - 1.0) / CAST(n11 AS DOUBLE) / 1e6 AS v11
        |  FROM w
        |  WHERE n00 IS NOT NULL AND n01 IS NOT NULL
        |    AND n10 IS NOT NULL AND n11 IS NOT NULL),
        |d AS (SELECT *, (m11 - m10) - (m01 - m00) AS did,
        |    sqrt(v11 + v10 + v01 + v00) AS se FROM m)
        |SELECT n00, n01, n10, n11,
        |  floor(m00 * 1e4 + 0.5) / 1e4 AS mean_ctrl_pre,
        |  floor(m01 * 1e4 + 0.5) / 1e4 AS mean_ctrl_post,
        |  floor(m10 * 1e4 + 0.5) / 1e4 AS mean_treat_pre,
        |  floor(m11 * 1e4 + 0.5) / 1e4 AS mean_treat_post,
        |  floor(did * 1e4 + 0.5) / 1e4 AS did,
        |  floor(did / NULLIF(se, 0.0) * 1e4 + 0.5) / 1e4 AS z
        |FROM d
        |WHERE n00 > 1 AND n01 > 1 AND n10 > 1 AND n11 > 1""".stripMargin,

    // Qini: pre-period mean as the targeting score, NTILE(10) deciles
    // (= the engine's two-phase arithmetic ntile), cumulative
    // incremental conversions per depth.
    "qini_curve" ->
      """WITH pu AS (SELECT user_id,
        |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |        THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) END) AS pre_sum,
        |    COUNT(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 END) AS pre_n,
        |    MAX(CASE WHEN event_type = 'purchase'
        |          AND ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY user_id),
        |s AS (SELECT user_id,
        |    CAST(floor(CAST(pre_sum AS DOUBLE) / CAST(pre_n AS DOUBLE)
        |      / 1000.0 + 0.5) AS BIGINT) AS score,
        |    converted,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM pu WHERE pre_n > 0),
        |r AS (SELECT *, CAST(NTILE(10) OVER (ORDER BY score DESC, user_id) AS INT)
        |        AS decile FROM s),
        |d AS (SELECT decile,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
        |    CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_treat,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
        |    CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_ctrl
        |  FROM r GROUP BY decile),
        |c AS (SELECT *,
        |    CAST(SUM(conv_treat) OVER w AS BIGINT) AS ct,
        |    CAST(SUM(conv_ctrl) OVER w AS BIGINT) AS cc,
        |    CAST(SUM(n_treat) OVER w AS BIGINT) AS nt,
        |    CAST(SUM(n_ctrl) OVER w AS BIGINT) AS nc
        |  FROM d
        |  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n_treat, n_ctrl,
        |  floor((CAST(conv_treat AS DOUBLE) / NULLIF(CAST(n_treat AS DOUBLE), 0.0)
        |    - CAST(conv_ctrl AS DOUBLE) / NULLIF(CAST(n_ctrl AS DOUBLE), 0.0))
        |    * 1e4 + 0.5) / 1e4 AS uplift,
        |  floor((CAST(ct AS DOUBLE) - CAST(cc AS DOUBLE)
        |    * (CAST(nt AS DOUBLE) / NULLIF(CAST(nc AS DOUBLE), 0.0)))
        |    * 1e4 + 0.5) / 1e4 AS qini
        |FROM c ORDER BY decile""".stripMargin,

    "item_affinity" ->
      """WITH i AS (SELECT DISTINCT user_id,
        |    COALESCE(TRY_CAST(json_extract_string(props,'$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM i),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |        CAST(COUNT(*) AS BIGINT) AS c12
        |      FROM i a JOIN i b ON a.user_id = b.user_id AND a.item < b.item
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |c1 AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c1 FROM i GROUP BY 1)
        |SELECT item_a, item_b, c12,
        |  ROUND((CAST(c12 AS DOUBLE) / CAST(n_users AS DOUBLE)) /
        |        ((CAST(ca.c1 AS DOUBLE) / CAST(n_users AS DOUBLE)) *
        |         (CAST(cb.c1 AS DOUBLE) / CAST(n_users AS DOUBLE))), 4) AS lift
        |FROM p JOIN c1 ca ON p.item_a = ca.item
        |       JOIN c1 cb ON p.item_b = cb.item, n
        |ORDER BY c12 DESC, lift DESC, item_a, item_b LIMIT 50""".stripMargin,

    // Mod-7 epoch-day weekday (chi2_contingency's convention); both
    // means are exact-integer sums divided once; one half-up rounding
    // at the end of each output column.
    // Linear multi-touch attribution: integer micro split qv//n with
    // the remainder to the earliest touches; unattributed purchases
    // on the explicit item -1 row.
    "linear_attribution" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS tc, event_id AS click_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS tp, event_id AS pid,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT p.pid, p.qv, c.item, c.tc, c.click_id
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.tc < p.tp AND c.tc >= p.tp - 259200000000),
        |s AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY pid) AS BIGINT) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tc, click_id) AS rk
        |  FROM t),
        |sh AS (SELECT item, pid,
        |    (CASE WHEN qv < 0 THEN -1 ELSE 1 END)
        |      * (abs(qv) // n
        |         + CASE WHEN rk <= abs(qv) % n THEN 1 ELSE 0 END) AS share
        |  FROM s),
        |a AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |    CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
        |    CAST(SUM(share) AS BIGINT) AS micros
        |  FROM sh GROUP BY item),
        |u AS (SELECT CAST(-1 AS BIGINT) AS item, CAST(0 AS BIGINT) AS n_touches,
        |    CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |    CAST(COALESCE(SUM(qv), 0) AS BIGINT) AS micros
        |  FROM p WHERE pid NOT IN (SELECT pid FROM t)),
        |r AS (SELECT * FROM a UNION ALL SELECT * FROM u WHERE n_purchases > 0)
        |SELECT item, n_touches, n_purchases,
        |  floor(CAST(micros AS DOUBLE) / 100 + 0.5) / 1e4 AS attributed_usd
        |FROM r ORDER BY item""".stripMargin,

    // Dormancy spells: (user, day) dedup + per-user lag, gap >= 2,
    // exact ppm shares against the 1-row spell total.
    "dormancy_spells" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day FROM events),
        |g AS (SELECT CAST(datediff('day', lag(day) OVER
        |      (PARTITION BY user_id ORDER BY day), day) AS BIGINT) AS gap_days
        |  FROM ud),
        |f AS (SELECT gap_days FROM g
        |  WHERE gap_days IS NOT NULL AND gap_days >= 2),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM f)
        |SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS n_spells,
        |  CAST((COUNT(*) * 1000000) // NULLIF(MAX(t.n_total), 0) AS BIGINT)
        |    AS share_ppm
        |FROM f, t GROUP BY gap_days ORDER BY gap_days""".stripMargin,

    // Growth accounting: one (user, day) dedup, per-user lag/lead
    // classification, full-outer day join, max-day churn fence.
    "growth_accounting" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day FROM events),
        |f AS (SELECT user_id, day,
        |    lag(day) OVER w AS prev, lead(day) OVER w AS nxt
        |  FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY day)),
        |md AS (SELECT MAX(day) AS max_day FROM ud),
        |c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau,
        |    CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new_users,
        |    CAST(SUM(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS retained,
        |    CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> day - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        |  FROM f GROUP BY day),
        |ch AS (SELECT day + 1 AS day, CAST(COUNT(*) AS BIGINT) AS churned
        |  FROM f, md WHERE (nxt IS NULL OR nxt <> day + 1)
        |    AND day + 1 <= max_day
        |  GROUP BY 1),
        |j AS (SELECT COALESCE(c.day, ch.day) AS day,
        |    COALESCE(dau, 0) AS dau, COALESCE(new_users, 0) AS new_users,
        |    COALESCE(retained, 0) AS retained,
        |    COALESCE(resurrected, 0) AS resurrected,
        |    COALESCE(churned, 0) AS churned
        |  FROM c FULL OUTER JOIN ch ON c.day = ch.day)
        |SELECT *, floor(CAST(new_users + resurrected AS DOUBLE)
        |    / NULLIF(CAST(churned AS DOUBLE), 0.0) * 1e4 + 0.5) / 1e4
        |  AS quick_ratio
        |FROM j ORDER BY day""".stripMargin,

    // Time-decay attribution: linear_attribution's touch window with
    // 2^(3−age_days) shift weights, |qv|·w // Σw base shares re-signed
    // by sign(qv), remainder +1 by RECENCY rank — conservation exact
    // per purchase for either sign (refunds included).
    "decay_attribution" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS tc, event_id AS click_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS tp, event_id AS pid,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT p.pid, p.qv, p.tp, c.item, c.tc, c.click_id
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.tc < p.tp AND c.tc >= p.tp - 259200000000),
        |s AS (SELECT *,
        |    (CAST(1 AS BIGINT) << CAST(3 - (tp - tc) // 86400000000 AS INT)) AS w,
        |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tc DESC, click_id) AS rk
        |  FROM t),
        |s2 AS (SELECT *, CAST(SUM(w) OVER (PARTITION BY pid) AS BIGINT) AS tw
        |  FROM s),
        |s3 AS (SELECT *, (abs(qv) * w) // tw AS base FROM s2),
        |s4 AS (SELECT *, abs(qv)
        |      - CAST(SUM(base) OVER (PARTITION BY pid) AS BIGINT)
        |    AS rem FROM s3),
        |sh AS (SELECT item, pid,
        |    (CASE WHEN qv < 0 THEN -1 ELSE 1 END)
        |      * (base + CASE WHEN rk <= rem THEN 1 ELSE 0 END) AS share
        |  FROM s4),
        |a AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |    CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
        |    CAST(SUM(share) AS BIGINT) AS micros
        |  FROM sh GROUP BY item),
        |u AS (SELECT CAST(-1 AS BIGINT) AS item, CAST(0 AS BIGINT) AS n_touches,
        |    CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |    CAST(COALESCE(SUM(qv), 0) AS BIGINT) AS micros
        |  FROM p WHERE pid NOT IN (SELECT pid FROM t)),
        |r AS (SELECT * FROM a UNION ALL SELECT * FROM u WHERE n_purchases > 0)
        |SELECT item, n_touches, n_purchases,
        |  floor(CAST(micros AS DOUBLE) / 100 + 0.5) / 1e4 AS attributed_usd
        |FROM r ORDER BY item""".stripMargin,

    // Classical additive decomposition: integer 7-day sums (NULL on
    // partial frames), weekday effect Σ(7x − s7)/(7n), residual
    // re-rounded ON the published 4-dp components.
    "seasonal_decompose" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |tr AS (SELECT *,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS w7,
        |    CASE WHEN COUNT(*) OVER w = 7
        |      THEN CAST(SUM(x) OVER w AS BIGINT) END AS t7,
        |    CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |eff AS (SELECT event_type, dow,
        |    CAST(SUM(7 * x - t7) AS BIGINT) AS dsum,
        |    CAST(COUNT(*) AS BIGINT) AS dn
        |  FROM tr WHERE t7 IS NOT NULL GROUP BY 1, 2),
        |j AS (SELECT tr.event_type, tr.day,
        |    floor(CAST(tr.x AS DOUBLE) / 100 * 1e4 + 0.5) / 1e4 AS revenue,
        |    floor(CAST(tr.t7 AS DOUBLE) / 7 / 100 * 1e4 + 0.5) / 1e4 AS trend,
        |    floor(CAST(eff.dsum AS DOUBLE) / CAST(7 * eff.dn AS DOUBLE) / 100
        |      * 1e4 + 0.5) / 1e4 AS weekday_effect
        |  FROM tr LEFT JOIN eff
        |    ON tr.event_type = eff.event_type AND tr.dow = eff.dow)
        |SELECT event_type, day, revenue, trend, weekday_effect,
        |  CASE WHEN trend IS NOT NULL AND weekday_effect IS NOT NULL
        |    THEN floor((revenue - trend - weekday_effect) * 1e4 + 0.5) / 1e4
        |  END AS residual
        |FROM j ORDER BY event_type, day""".stripMargin,

    "seasonal_profile" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qrev
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type,
        |    CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(qrev) AS BIGINT) AS qsum
        |  FROM daily GROUP BY 1, 2),
        |w AS (SELECT *, CAST(SUM(n_days) OVER (PARTITION BY event_type) AS BIGINT) AS td,
        |        CAST(SUM(qsum) OVER (PARTITION BY event_type) AS BIGINT) AS tq
        |      FROM g)
        |SELECT event_type, dow, n_days,
        |  floor(CAST(qsum AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
        |    AS avg_revenue,
        |  floor((CAST(qsum AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(tq AS DOUBLE) / CAST(td AS DOUBLE)) * 1e4 + 0.5) / 1e4
        |    AS seasonal_index
        |FROM w ORDER BY event_type, dow""".stripMargin,

    "pagerank" -> PagerankSql,

    "katz_centrality" -> KatzSql,

    "hits" -> HitsSql,

    "lpa_communities" -> LpaSql,

    "eigenvector_centrality" -> EigenvectorSql,

    "personalized_pagerank" -> PprSql,

    // Low->high oriented wedges closed by the third edge: each
    // triangle generated once; corners explode for per-node counts.
    "triangle_count" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM tr WHERE src IS NOT NULL AND src <> dst),
        |w AS (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e2.a = e1.b),
        |t AS (SELECT w.a, w.b, w.c FROM w JOIN e e3 ON e3.a = w.a AND e3.b = w.c),
        |corners AS (SELECT unnest([a, b, c]) AS item FROM t),
        |cnt AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM corners GROUP BY 1),
        |nodes AS (SELECT DISTINCT a AS item FROM e UNION SELECT DISTINCT b FROM e)
        |SELECT nodes.item, COALESCE(cnt.n, 0) AS n_triangles
        |FROM nodes LEFT JOIN cnt ON cnt.item = nodes.item
        |ORDER BY nodes.item""".stripMargin,

    // Exact-integer CUSUM: baseline mean as integer micros, running
    // deviation sum, first |S| > h*mu0 crossing per type.
    // Syntetos-Boylan quadrant: exact rational cutoffs
    // cross-multiplied on HUGEINT (3T >= 4n_d; 100·var-mass >=
    // 49·S²); ppm columns are readout-only.
    "demand_classes" ->
      """WITH p AS (SELECT
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
        |      AS item,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |daily AS (SELECT item, day, CAST(COUNT(*) AS BIGINT) AS s
        |  FROM p GROUP BY 1, 2),
        |bo AS (SELECT CAST(datediff('day', MIN(day), MAX(day)) + 1 AS BIGINT)
        |    AS t_days FROM daily),
        |m AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS nd,
        |    SUM(CAST(s AS HUGEINT)) AS ssum,
        |    SUM(CAST(s AS HUGEINT) * s) AS ssq
        |  FROM daily GROUP BY 1)
        |SELECT item, bo.t_days, nd,
        |  CAST((bo.t_days * 1000000) // nd AS BIGINT) AS adi_ppm,
        |  CAST(((nd * ssq - ssum * ssum) * 1000000) // (ssum * ssum)
        |    AS BIGINT) AS cv2_ppm,
        |  CASE WHEN 3 * bo.t_days >= 4 * nd THEN
        |    CASE WHEN 100 * (nd * ssq - ssum * ssum) >= 49 * ssum * ssum
        |      THEN 'lumpy' ELSE 'intermittent' END
        |  ELSE
        |    CASE WHEN 100 * (nd * ssq - ssum * ssum) >= 49 * ssum * ssum
        |      THEN 'erratic' ELSE 'smooth' END
        |  END AS demand_class
        |FROM m, bo ORDER BY item""".stripMargin,

    // Pettitt: pairwise CASE signs on the dense daily grid, boundary
    // sums, earliest |U| argmax, cross-multiplied 3.68888 verdict.
    "pettitt_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |ty AS (SELECT DISTINCT event_type FROM daily),
        |ix AS (SELECT unnest(generate_series(0,
        |      CAST(datediff('day', d0, d1) AS BIGINT))) AS idx, d0
        |  FROM bo),
        |dense AS (SELECT ty.event_type, CAST(ix.idx AS BIGINT) AS idx,
        |    ix.d0, COALESCE(d.c, 0) AS y
        |  FROM ty CROSS JOIN ix LEFT JOIN daily d
        |    ON d.event_type = ty.event_type
        |    AND d.day = ix.d0 + CAST(ix.idx AS INT)),
        |pairs AS (SELECT l.event_type, l.idx AS i, r.idx AS j,
        |    CASE WHEN l.y > r.y THEN 1 WHEN l.y < r.y THEN -1
        |      ELSE 0 END AS s
        |  FROM dense l JOIN dense r ON r.event_type = l.event_type
        |    AND l.idx < r.idx),
        |bd AS (SELECT event_type,
        |    unnest(generate_series(0, CAST(MAX(idx) - 1 AS BIGINT))) AS t
        |  FROM dense GROUP BY event_type),
        |u AS (SELECT p.event_type, bd.t, CAST(SUM(p.s) AS BIGINT) AS u
        |  FROM pairs p JOIN bd ON bd.event_type = p.event_type
        |  WHERE p.i <= bd.t AND p.j > bd.t
        |  GROUP BY 1, 2),
        |k AS (SELECT event_type,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) + 1 AS BIGINT)
        |      AS t_days,
        |    abs(u) AS k_stat, t AS change_idx,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY abs(u) DESC, t) AS rn
        |  FROM u)
        |SELECT k.event_type, k.t_days, k.k_stat, k.change_idx,
        |  bo.d0 + CAST(k.change_idx AS INT) AS change_day,
        |  CAST(6 * k.k_stat * k.k_stat AS DOUBLE) >
        |    3.68888 * CAST(k.t_days * k.t_days * k.t_days
        |      + k.t_days * k.t_days AS DOUBLE) AS significant
        |FROM k CROSS JOIN bo WHERE k.rn = 1
        |ORDER BY k.event_type""".stripMargin,

    "cusum_changepoint" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qrev
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |      FROM daily),
        |m AS (SELECT *, CAST(floor(
        |    CAST(SUM(CASE WHEN rn <= 7 THEN qrev END) OVER (PARTITION BY event_type) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN rn <= 7 THEN 1 END) OVER (PARTITION BY event_type) AS DOUBLE)
        |    + 0.5) AS BIGINT) AS mu0 FROM d),
        |c AS (SELECT *, CAST(SUM(qrev - mu0) OVER (PARTITION BY event_type ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
        |      FROM m),
        |f AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS fr
        |      FROM c WHERE abs(s) > 1 * mu0)
        |SELECT event_type, day AS changepoint_day,
        |  floor(CAST(qrev AS DOUBLE) / 100.0 + 0.5) / 1e4 AS revenue,
        |  floor(CAST(mu0 AS DOUBLE) / 100.0 + 0.5) / 1e4 AS baseline_mean,
        |  floor(CAST(s AS DOUBLE) / 100.0 + 0.5) / 1e4 AS cusum
        |FROM f WHERE fr = 1 ORDER BY event_type""".stripMargin,

    // Frequency-ranked keep-top mapping, (n DESC, item) tiebreak.
    "category_collapse" ->
      """WITH i AS (SELECT
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |g AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM i GROUP BY 1),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, item) AS INT)
        |        AS rank FROM g)
        |SELECT item, n, rank,
        |  CASE WHEN rank <= 10 THEN CAST(item AS VARCHAR) ELSE 'OTHER' END AS encoded
        |FROM r ORDER BY item""".stripMargin,

    // One conditional aggregate for both days; Δtotal as a window over
    // the bounded type frame; shares additive in exact micros.
    "change_contrib" ->
      """WITH rd AS (SELECT MAX(ts::DATE) AS report_date FROM events),
        |g AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN ts::DATE = report_date
        |      THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS q_last,
        |    CAST(SUM(CASE WHEN ts::DATE <> report_date
        |      THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS q_prev
        |  FROM events CROSS JOIN rd
        |  WHERE ts::DATE >= report_date - 1 GROUP BY 1),
        |d AS (SELECT *, q_last - q_prev AS delta_q,
        |        CAST(SUM(q_last - q_prev) OVER () AS BIGINT) AS total_dq FROM g)
        |SELECT event_type,
        |  floor(CAST(q_prev AS DOUBLE) / 100.0 + 0.5) / 1e4 AS rev_prev,
        |  floor(CAST(q_last AS DOUBLE) / 100.0 + 0.5) / 1e4 AS rev_last,
        |  floor(CAST(delta_q AS DOUBLE) / 100.0 + 0.5) / 1e4 AS delta,
        |  CASE WHEN total_dq <> 0 THEN
        |    floor(CAST(delta_q AS DOUBLE) / CAST(total_dq AS DOUBLE) * 1e4 + 0.5) / 1e4
        |  END AS share_of_change
        |FROM d
        |ORDER BY abs(floor(CAST(delta_q AS DOUBLE) / 100.0 + 0.5) / 1e4) DESC, event_type""".stripMargin,

    // Exact integer Gini on sorted per-user micro totals; (qu, user)
    // rank tiebreak is a total order.
    "gini_concentration" ->
      """WITH u AS (SELECT event_type, user_id,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qu
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY qu, user_id) AS BIGINT) AS i FROM u)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  floor(CAST(SUM(qu) AS DOUBLE) / 100.0 + 0.5) / 1e4 AS revenue,
        |  floor(CAST(2 * SUM(i * qu) - (COUNT(*) + 1) * SUM(qu) AS DOUBLE)
        |    / CAST(COUNT(*) * SUM(qu) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS gini
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // LOO weekday baseline: exact integer numerator, one division,
    // ratio rounded 4dp BEFORE the threshold compare.
    "seasonal_outliers" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qrev
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT *, CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow FROM daily),
        |w AS (SELECT *,
        |    CAST(SUM(qrev) OVER (PARTITION BY event_type, dow) AS BIGINT) AS dow_sum,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type, dow) AS BIGINT) AS n_dow
        |  FROM d),
        |r AS (SELECT event_type, day, dow,
        |    floor(CAST(qrev AS DOUBLE) / 100.0 + 0.5) / 1e4 AS revenue,
        |    floor(CAST(qrev AS DOUBLE)
        |      / (CAST(dow_sum - qrev AS DOUBLE) / CAST(n_dow - 1 AS DOUBLE))
        |      * 1e4 + 0.5) / 1e4 AS ratio
        |  FROM w WHERE n_dow >= 2)
        |SELECT * FROM r WHERE ratio < 0.5 OR ratio > 1.5
        |ORDER BY event_type, day""".stripMargin,

    // Same session reconstruction as the sessionize oracle; two lags
    // inside the session, |types|^3-bounded counts, (n DESC, path) top-k.
    "top_paths" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |p AS (SELECT lag(event_type, 2) OVER ws AS t1,
        |        lag(event_type, 1) OVER ws AS t2, event_type AS t3
        |      FROM s WINDOW ws AS (PARTITION BY user_id, session_idx
        |                           ORDER BY us, event_id))
        |SELECT t1 || '>' || t2 || '>' || t3 AS path, CAST(COUNT(*) AS BIGINT) AS n
        |FROM p WHERE t1 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    // LOO mean-target encoding: global mean as integer micros BEFORE
    // use; exact int64 numerator, one division per row, 4dp half-up.
    "target_encode" ->
      """WITH ev AS (SELECT event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv
        |  FROM events),
        |i AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(qv) AS BIGINT) AS s
        |      FROM ev GROUP BY 1),
        |m AS (SELECT CAST(floor(CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5)
        |        AS BIGINT) AS muq FROM ev)
        |SELECT event_id, item,
        |  floor(CAST(qv AS DOUBLE) / 100.0 + 0.5) / 1e4 AS value,
        |  floor(CAST(s - qv + 50 * muq AS DOUBLE) / CAST(n - 1 + 50 AS DOUBLE)
        |    / 1e6 * 1e4 + 0.5) / 1e4 AS enc
        |FROM ev JOIN i USING (item) CROSS JOIN m
        |ORDER BY event_id""".stripMargin,

    // Same transition-edge CTEs as the pagerank oracle; out/in sides
    // full-outer-merged, reciprocity via the edge-reversal self-join.
    "graph_degrees" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM tr
        |      WHERE src IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT src AS item, CAST(COUNT(*) AS BIGINT) AS out_deg,
        |        CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY 1),
        |i AS (SELECT dst AS item, CAST(COUNT(*) AS BIGINT) AS in_deg,
        |        CAST(SUM(w) AS BIGINT) AS in_w FROM e GROUP BY 1),
        |r AS (SELECT a.src AS item, CAST(COUNT(*) AS BIGINT) AS n_recip
        |      FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src GROUP BY 1)
        |SELECT COALESCE(o.item, i.item) AS item,
        |  COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg,
        |  COALESCE(out_w, 0) AS out_w, COALESCE(in_w, 0) AS in_w,
        |  COALESCE(n_recip, 0) AS n_recip
        |FROM o FULL JOIN i ON o.item = i.item
        |LEFT JOIN r ON COALESCE(o.item, i.item) = r.item
        |ORDER BY item""".stripMargin,

    // Per-user milli-quantized means; exact int64 moment sums; θ is
    // one double division rounded to 6dp BEFORE the adjustment.
    "cuped_adjust" ->
      """WITH u AS (SELECT user_id,
        |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |        THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) END) AS pre_sum,
        |    COUNT(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 END) AS pre_n,
        |    SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |        THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) END) AS post_sum,
        |    COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 END) AS post_n
        |  FROM events GROUP BY 1),
        |f AS (SELECT user_id,
        |    CAST(floor(CAST(pre_sum AS DOUBLE) / CAST(pre_n AS DOUBLE) / 1000.0 + 0.5) AS BIGINT) AS qx,
        |    CAST(floor(CAST(post_sum AS DOUBLE) / CAST(post_n AS DOUBLE) / 1000.0 + 0.5) AS BIGINT) AS qy
        |  FROM u WHERE pre_n > 0 AND post_n > 0),
        |a AS (SELECT user_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
        |    CAST(SUM(qx * qx) AS BIGINT) AS sxx,
        |    CAST(SUM(qx * qy) AS BIGINT) AS sxy
        |  FROM f GROUP BY 1),
        |w AS (SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS tn,
        |    CAST(SUM(sx) OVER () AS BIGINT) AS tsx,
        |    CAST(SUM(sy) OVER () AS BIGINT) AS tsy,
        |    CAST(SUM(sxx) OVER () AS BIGINT) AS tsxx,
        |    CAST(SUM(sxy) OVER () AS BIGINT) AS tsxy
        |  FROM a),
        |t AS (SELECT *, floor(
        |    (CAST(tn AS DOUBLE) * CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE))
        |    / (CAST(tn AS DOUBLE) * CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS theta FROM w)
        |SELECT arm, n AS n_users,
        |  floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0 * 1e4 + 0.5) / 1e4 AS mean_post,
        |  floor((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0
        |    - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0
        |      - CAST(tsx AS DOUBLE) / CAST(tn AS DOUBLE) / 1000.0)) * 1e4 + 0.5) / 1e4
        |    AS mean_post_adj,
        |  theta
        |FROM t ORDER BY arm""".stripMargin,

    // value·2^(horizon−age) in integer micros (bit shifts, no libm);
    // ages beyond the 20-day horizon contribute zero.
    "decayed_engagement" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |e AS (SELECT user_id,
        |        datediff('day', CAST(make_timestamp(epoch_us(ts)) AS DATE), report_date) AS age,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv
        |      FROM events, md),
        |w AS (SELECT user_id, qv * (CAST(1 AS BIGINT) << (20 - age)) AS wq
        |      FROM e WHERE age <= 20)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  floor(CAST(SUM(wq) AS DOUBLE) / 1048576.0 / 1e6 * 1e4 + 0.5) / 1e4 AS score
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Per-user top-k never-interacted items under the md5(user:item)
    // pseudo-random total order.
    "negative_samples" ->
      """WITH i AS (SELECT DISTINCT user_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
        |      AS item
        |  FROM events),
        |cat AS (SELECT DISTINCT item FROM i),
        |u AS (SELECT DISTINCT user_id FROM i),
        |cand AS (SELECT u.user_id, cat.item FROM u CROSS JOIN cat
        |         ANTI JOIN i ON i.user_id = u.user_id AND i.item = cat.item),
        |r AS (SELECT user_id, item,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY md5(CAST(user_id AS VARCHAR) || ':' ||
        |                   CAST(item AS VARCHAR)), item) AS INT) AS rank
        |  FROM cand)
        |SELECT user_id, item, "rank" FROM r WHERE "rank" <= 5
        |ORDER BY user_id, "rank"""".stripMargin,

    // md5-parity arms, max-flag conversion, pooled-variance z (sqrt is
    // correctly-rounded IEEE — engine-exact like the cosine path).
    "ab_test" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase'
        |          AND CAST(make_timestamp(epoch_us(ts)) AS DATE) = report_date
        |        THEN 1 ELSE 0 END) AS converted,
        |    CAST(('0x' || substring(md5('ab:' || CAST(MIN(user_id) AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM events, md GROUP BY user_id),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv1
        |  FROM u)
        |SELECT n0, n1, conv0, conv1,
        |  floor(CAST(conv0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0.0)
        |    * 1e4 + 0.5) / 1e4 AS p0,
        |  floor(CAST(conv1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0.0)
        |    * 1e4 + 0.5) / 1e4 AS p1,
        |  floor((CAST(conv1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0.0) -
        |         CAST(conv0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0.0)) /
        |    NULLIF(sqrt((CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) *
        |      (1.0 - CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) *
        |      (1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0) +
        |       1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0))), 0.0)
        |    * 1e4 + 0.5) / 1e4 AS z
        |FROM a""".stripMargin,

    // R/F/M quintiles with user-id tiebreaks; 5 = best on every axis.
    "rfm_segments" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |per AS (SELECT user_id,
        |    CAST(datediff('day', MAX(CAST(make_timestamp(epoch_us(ts)) AS DATE)),
        |      ANY_VALUE(report_date)) AS BIGINT) AS recency_days,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qm
        |  FROM events, md GROUP BY user_id),
        |t AS (SELECT *,
        |    CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS INT) AS r,
        |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT) AS f,
        |    CAST(ntile(5) OVER (ORDER BY qm, user_id) AS INT) AS m
        |  FROM per)
        |SELECT user_id, recency_days, frequency,
        |  floor(CAST(qm AS DOUBLE) / 100.0 + 0.5) / 1e4 AS monetary,
        |  r, f, m, CAST(r * 100 + f * 10 + m AS INT) AS segment
        |FROM t ORDER BY user_id""".stripMargin,

    // sessionize's session frame aggregated to per-start-day bounces.
    "bounce_rate" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |g AS (SELECT user_id, session_idx, CAST(COUNT(*) AS BIGINT) AS n_events,
        |        MIN(us) AS start_us
        |      FROM s GROUP BY user_id, session_idx),
        |d AS (SELECT CAST(make_timestamp(start_us) AS DATE) AS day, n_events FROM g)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  floor(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS bounce_rate
        |FROM d GROUP BY day ORDER BY day""".stripMargin,

    // Kaplan-Meier life table: risk set = reverse cumulative total.
    "churn_lifetable" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |u AS (SELECT user_id,
        |        min(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS first_day,
        |        max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS last_day
        |      FROM events GROUP BY user_id),
        |d AS (SELECT CAST(datediff('day', first_day, last_day) AS BIGINT) AS duration,
        |        CASE WHEN datediff('day', last_day, report_date) < 7
        |          THEN 1 ELSE 0 END AS censored
        |      FROM u, md),
        |t AS (SELECT duration, CAST(SUM(1 - censored) AS BIGINT) AS n_churned,
        |        CAST(SUM(censored) AS BIGINT) AS n_censored
        |      FROM d GROUP BY duration),
        |r AS (SELECT *, CAST(SUM(n_churned + n_censored) OVER
        |        (ORDER BY duration ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |        AS BIGINT) AS n_risk
        |      FROM t)
        |SELECT duration, n_risk, n_churned, n_censored,
        |  floor(CAST(n_churned AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS hazard
        |FROM r ORDER BY duration""".stripMargin,

    // TWAP concurrency: sessionize, clip each session to UTC day
    // bounds in integer µs, day-keyed HUGEINT sum, divide at the edge.
    "twap_concurrency" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |sess AS (SELECT user_id, session_idx,
        |    MIN(us) AS start_us, MAX(us) AS end_us
        |  FROM s GROUP BY user_id, session_idx),
        |x AS (SELECT start_us, end_us,
        |        unnest(generate_series(CAST(make_timestamp(start_us) AS DATE),
        |          CAST(make_timestamp(end_us) AS DATE), INTERVAL 1 DAY)) AS day
        |      FROM sess),
        |c AS (SELECT CAST(day AS DATE) AS day,
        |        GREATEST(start_us, epoch_us(CAST(day AS TIMESTAMP))) AS s,
        |        LEAST(end_us, epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP))) AS e
        |      FROM x)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  floor(CAST(SUM(CAST(e - s AS HUGEINT)) AS DOUBLE) / 1e3 + 0.5) / 1e3
        |    AS session_seconds,
        |  floor(CAST(SUM(CAST(e - s AS HUGEINT)) AS DOUBLE) / 86400e6
        |    * 1e4 + 0.5) / 1e4 AS twap_concurrent
        |FROM c GROUP BY day ORDER BY day""".stripMargin,

    // Stratified ATE: qini's score deciles via NTILE, per-stratum
    // arm means on HUGEINT milli sums, exact ppm weights, micro
    // contrib — Σ contrib IS the ATE.
    "stratified_ate" ->
      """WITH pu AS (SELECT user_id,
        |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |        THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) END) AS pre_sum,
        |    COUNT(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 END) AS pre_n,
        |    SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |        THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) END) AS post_sum,
        |    COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 END) AS post_n
        |  FROM events GROUP BY user_id),
        |s AS (SELECT user_id,
        |    CAST(floor(CAST(pre_sum AS DOUBLE) / CAST(pre_n AS DOUBLE)
        |      / 1000.0 + 0.5) AS BIGINT) AS score,
        |    CAST(floor(CAST(post_sum AS DOUBLE) / CAST(post_n AS DOUBLE)
        |      / 1000.0 + 0.5) AS BIGINT) AS y,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM pu WHERE pre_n > 0 AND post_n > 0),
        |r AS (SELECT *, CAST(NTILE(10) OVER (ORDER BY score DESC, user_id) AS INT)
        |        AS stratum FROM s),
        |c AS (SELECT stratum,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
        |    SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS s_ctrl,
        |    SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS s_treat
        |  FROM r GROUP BY stratum),
        |t AS (SELECT CAST(SUM(n_ctrl + n_treat) AS HUGEINT) AS n_all FROM c)
        |SELECT stratum, n_ctrl, n_treat,
        |  floor(CAST(s_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE) / 1000.0
        |    * 1e4 + 0.5) / 1e4 AS mean_ctrl,
        |  floor(CAST(s_treat AS DOUBLE) / CAST(n_treat AS DOUBLE) / 1000.0
        |    * 1e4 + 0.5) / 1e4 AS mean_treat,
        |  floor((CAST(s_treat AS DOUBLE) / CAST(n_treat AS DOUBLE) / 1000.0
        |    - CAST(s_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE) / 1000.0)
        |    * 1e4 + 0.5) / 1e4 AS diff,
        |  CAST((CAST(n_ctrl + n_treat AS HUGEINT) * 1000000) // n_all AS BIGINT)
        |    AS weight_ppm,
        |  floor((CAST(s_treat AS DOUBLE) / CAST(n_treat AS DOUBLE) / 1000.0
        |    - CAST(s_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE) / 1000.0)
        |    * (CAST(n_ctrl + n_treat AS DOUBLE) / CAST(n_all AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS contrib
        |FROM c, t WHERE n_ctrl > 0 AND n_treat > 0
        |ORDER BY stratum""".stripMargin,

    // Log-rank: per-arm risk sets on the duration frame, nano-grid
    // quantized (d1−e1)/v terms, one fixed-order double chain for z.
    "logrank_test" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |u AS (SELECT user_id,
        |        min(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS first_day,
        |        max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS last_day
        |      FROM events GROUP BY user_id),
        |d AS (SELECT CAST(datediff('day', first_day, last_day) AS BIGINT) AS duration,
        |        CASE WHEN datediff('day', last_day, report_date) < 7
        |          THEN 1 ELSE 0 END AS censored,
        |        CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |          AS BIGINT) % 2 AS arm
        |      FROM u, md),
        |t AS (SELECT duration,
        |        CAST(SUM(CASE WHEN arm = 0 THEN 1 - censored ELSE 0 END) AS BIGINT) AS d0,
        |        CAST(SUM(CASE WHEN arm = 1 THEN 1 - censored ELSE 0 END) AS BIGINT) AS d1,
        |        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0,
        |        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
        |      FROM d GROUP BY duration),
        |r AS (SELECT *,
        |        CAST(SUM(t0) OVER (ORDER BY duration ROWS BETWEEN CURRENT ROW
        |          AND UNBOUNDED FOLLOWING) AS BIGINT) AS n0,
        |        CAST(SUM(t1) OVER (ORDER BY duration ROWS BETWEEN CURRENT ROW
        |          AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1
        |      FROM t),
        |q AS (SELECT d1,
        |        CAST(floor((CAST(d1 AS DOUBLE) - CAST(d0 + d1 AS DOUBLE)
        |            * CAST(n1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) * 1e9 + 0.5)
        |          AS BIGINT) AS ome_q,
        |        CAST(floor(CAST(d0 + d1 AS DOUBLE)
        |            * (CAST(n0 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |            * (CAST(n1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |            * (CAST(n0 + n1 AS DOUBLE) - CAST(d0 + d1 AS DOUBLE))
        |            / NULLIF(CAST(n0 + n1 AS DOUBLE) - 1.0, 0.0) * 1e9 + 0.5)
        |          AS BIGINT) AS v_q
        |      FROM r)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_durations,
        |  CAST(SUM(d1) AS BIGINT) AS obs_treat,
        |  floor(CAST(SUM(ome_q) AS DOUBLE) / 1e3 + 0.5) / 1e6 AS o_minus_e,
        |  floor(CAST(SUM(ome_q) AS DOUBLE) / 1e9 /
        |    NULLIF(sqrt(CAST(SUM(COALESCE(v_q, 0)) AS DOUBLE) / 1e9), 0.0)
        |    * 1e4 + 0.5) / 1e4 AS z
        |FROM q""".stripMargin,

    // Session sweep: one lag pass, per-threshold conditional sums.
    "session_sweep" ->
      """WITH g AS (SELECT us - lag(us) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id) AS gap
        |      FROM (SELECT user_id, epoch_us(ts) AS us, event_id FROM events)),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT)
        |          - CAST(SUM(CASE WHEN gap IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |          AS n_users,
        |        CAST(COUNT(*) AS BIGINT) AS n_events,
        |        CAST(SUM(CASE WHEN gap > 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS g5,
        |        CAST(SUM(CASE WHEN gap > 900000000 THEN 1 ELSE 0 END) AS BIGINT) AS g15,
        |        CAST(SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS g30,
        |        CAST(SUM(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS g60
        |      FROM g),
        |u AS (SELECT 5 AS gap_minutes, n_users + g5 AS n_sessions, n_events FROM f
        |  UNION ALL SELECT 15, n_users + g15, n_events FROM f
        |  UNION ALL SELECT 30, n_users + g30, n_events FROM f
        |  UNION ALL SELECT 60, n_users + g60, n_events FROM f)
        |SELECT gap_minutes, n_sessions,
        |  floor(CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS mean_events_per_session
        |FROM u ORDER BY gap_minutes""".stripMargin,

    // Watermark loss: one running-max pass, per-threshold sums.
    "watermark_loss" ->
      """WITH l AS (SELECT us,
        |        max(us) OVER (PARTITION BY event_type ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |      FROM (SELECT event_type, event_id, epoch_us(ts) AS us FROM events)),
        |d AS (SELECT CASE WHEN hwm IS NOT NULL AND hwm > us THEN hwm - us
        |        ELSE 0 END AS late_us FROM l),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
        |        CAST(SUM(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        |        CAST(SUM(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS m5,
        |        CAST(SUM(CASE WHEN late_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS m30,
        |        CAST(SUM(CASE WHEN late_us > 7200000000 THEN 1 ELSE 0 END) AS BIGINT) AS m120
        |      FROM d),
        |u AS (SELECT 1 AS watermark_minutes, n_events, m1 AS n_dropped FROM f
        |  UNION ALL SELECT 5, n_events, m5 FROM f
        |  UNION ALL SELECT 30, n_events, m30 FROM f
        |  UNION ALL SELECT 120, n_events, m120 FROM f)
        |SELECT watermark_minutes, n_events, n_dropped,
        |  (n_dropped * 1000000) // n_events AS dropped_ppm
        |FROM u ORDER BY watermark_minutes""".stripMargin,

    // Markov backtest: argmax rule from pre-split pairs (smallest-type
    // tie), scored on post-split pairs vs the global-top baseline.
    "markov_accuracy" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
        |        (ts < TIMESTAMP '2024-01-16') AS in_train
        |      FROM events),
        |trp AS (SELECT prev_type, event_type FROM (
        |        SELECT event_type, lag(event_type) OVER
        |          (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |        FROM e WHERE in_train) WHERE prev_type IS NOT NULL),
        |tc AS (SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM trp GROUP BY 1, 2),
        |rule AS (SELECT prev_type, event_type AS predicted FROM (
        |        SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
        |          ORDER BY n DESC, event_type) AS rn FROM tc) WHERE rn = 1),
        |top AS (SELECT event_type AS global_top FROM (
        |        SELECT event_type, SUM(n) AS n FROM tc GROUP BY 1
        |        ORDER BY SUM(n) DESC, event_type LIMIT 1)),
        |tep AS (SELECT prev_type, event_type FROM (
        |        SELECT event_type, lag(event_type) OVER
        |          (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |        FROM e WHERE NOT in_train) WHERE prev_type IS NOT NULL)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_test_pairs,
        |  CAST(SUM(CASE WHEN tep.event_type = rule.predicted
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  (CAST(SUM(CASE WHEN tep.event_type = rule.predicted THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT) AS accuracy_ppm,
        |  (CAST(SUM(CASE WHEN tep.event_type = top.global_top THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT) AS baseline_ppm,
        |  CAST(SUM(CASE WHEN tep.event_type = rule.predicted THEN 1 ELSE 0 END)
        |    AS BIGINT) > CAST(SUM(CASE WHEN tep.event_type = top.global_top
        |      THEN 1 ELSE 0 END) AS BIGINT) AS beats_marginal
        |FROM tep JOIN rule USING (prev_type), top""".stripMargin,

    // Binary segmentation: integer cumsums (squares on the dollar
    // grid), per-candidate IEEE cost, quantized argmin, earliest tie.
    "binary_segmentation" ->
      """WITH daily AS (SELECT event_type,
        |        CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |        CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |      FROM events GROUP BY 1, 2),
        |d2 AS (SELECT *, (x + 50) // 100 AS xd FROM daily),
        |w AS (SELECT *, CAST(ROW_NUMBER() OVER tw AS BIGINT) AS i,
        |        CAST(SUM(x) OVER ctw AS BIGINT) AS cx,
        |        CAST(SUM(xd) OVER ctw AS BIGINT) AS cxd,
        |        CAST(SUM(xd * xd) OVER ctw AS BIGINT) AS cxx,
        |        CAST(COUNT(*) OVER pw AS BIGINT) AS n,
        |        CAST(SUM(x) OVER pw AS BIGINT) AS tx,
        |        CAST(SUM(xd) OVER pw AS BIGINT) AS txd,
        |        CAST(SUM(xd * xd) OVER pw AS BIGINT) AS txx
        |      FROM d2 WINDOW
        |        tw AS (PARTITION BY event_type ORDER BY day),
        |        ctw AS (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |        pw AS (PARTITION BY event_type)),
        |f AS (SELECT *,
        |        (CAST(cxx AS DOUBLE) - CAST(cxd AS DOUBLE) * CAST(cxd AS DOUBLE)
        |           / CAST(i AS DOUBLE))
        |        + (CAST(txx - cxx AS DOUBLE)
        |           - CAST(txd - cxd AS DOUBLE) * CAST(txd - cxd AS DOUBLE)
        |             / CAST(n - i AS DOUBLE)) AS cost
        |      FROM w WHERE n >= 3 AND i < n),
        |q AS (SELECT *, CAST(floor(cost + 0.5) AS BIGINT) AS cost_q,
        |        ROW_NUMBER() OVER (PARTITION BY event_type
        |          ORDER BY CAST(floor(cost + 0.5) AS BIGINT), i) AS rn
        |      FROM f)
        |SELECT event_type, day AS last_day_before_split, i AS days_before,
        |  n - i AS days_after,
        |  floor(CAST(cx AS DOUBLE) / CAST(i AS DOUBLE) / 100 * 1e4 + 0.5) / 1e4
        |    AS mean_before,
        |  floor(CAST(tx - cx AS DOUBLE) / CAST(n - i AS DOUBLE) / 100 * 1e4 + 0.5)
        |    / 1e4 AS mean_after,
        |  floor((1.0 - CAST(cost_q AS DOUBLE)
        |    / (CAST(txx AS DOUBLE) - CAST(txd AS DOUBLE) * CAST(txd AS DOUBLE)
        |       / CAST(n AS DOUBLE))) * 1e4 + 0.5) / 1e4 AS sse_reduction
        |FROM q WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // Lorenz: micro-grid per-user revenue, global ntile, ppm shares.
    "lorenz_curve" ->
      """WITH u AS (SELECT user_id,
        |        CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS rev
        |      FROM events GROUP BY 1),
        |d AS (SELECT *, ntile(10) OVER (ORDER BY rev, user_id) AS decile FROM u),
        |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
        |        CAST(SUM(rev) AS BIGINT) AS rev_q FROM d GROUP BY 1),
        |t AS (SELECT *, CAST(SUM(rev_q) OVER () AS BIGINT) AS total,
        |        CAST(SUM(rev_q) OVER (ORDER BY decile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_q
        |      FROM g)
        |SELECT decile, n_users,
        |  CAST((CAST(rev_q AS HUGEINT) * 1000000) // total AS BIGINT)
        |    AS share_ppm,
        |  CAST((CAST(cum_q AS HUGEINT) * 1000000) // total AS BIGINT)
        |    AS cum_share_ppm
        |FROM t ORDER BY decile""".stripMargin,

    // Return-time: the sessionize CTEs verbatim, one per-user lag on
    // the session frame, exact-integer percentile, hours at 4dp.
    "return_time" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |sess AS (SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |    MIN(us) AS start_us, MAX(us) AS end_us
        |  FROM s GROUP BY user_id, session_idx),
        |g AS (SELECT start_us - lag(end_us) OVER
        |        (PARTITION BY user_id ORDER BY session_idx) AS gap
        |      FROM sess)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_returns,
        |  floor(quantile_cont(gap, 0.5) / 3.6e9 * 1e4 + 0.5) / 1e4 AS p50_hours,
        |  floor(quantile_cont(gap, 0.9) / 3.6e9 * 1e4 + 0.5) / 1e4 AS p90_hours
        |FROM g WHERE gap IS NOT NULL""".stripMargin,

    // Peak concurrency: exclusive-end +1/-1 sweep on the session
    // frame, deterministic total order, per-day max of the prefix sum.
    "peak_concurrency" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |sess AS (SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |    MIN(us) AS start_us, MAX(us) AS end_us
        |  FROM s GROUP BY user_id, session_idx),
        |m AS (SELECT user_id, session_idx, start_us AS us,
        |        CAST(1 AS BIGINT) AS delta FROM sess
        |      UNION ALL
        |      SELECT user_id, session_idx, end_us + 1,
        |        CAST(-1 AS BIGINT) FROM sess),
        |r AS (SELECT *, CAST(SUM(delta) OVER (ORDER BY us, delta, user_id,
        |        session_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS BIGINT) AS running
        |      FROM m)
        |SELECT CAST(make_timestamp(us) AS DATE) AS day,
        |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sessions_started,
        |  CAST(MAX(running) AS BIGINT) AS peak_concurrent
        |FROM r GROUP BY 1 ORDER BY day""".stripMargin,

    // Seasonal-naive backtest: lag windows on the bounded daily frame,
    // both baselines scored on identical days, WAPE ppm integer.
    "forecast_backtest" ->
      """WITH d AS (SELECT event_type, CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |        CAST(COUNT(*) AS BIGINT) AS c
        |      FROM events GROUP BY 1, 2),
        |w AS (SELECT *, lag(c, 7) OVER tw AS p7, lag(c, 1) OVER tw AS p1
        |      FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day)),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |        CAST(SUM(c) AS BIGINT) AS actual_total,
        |        CAST(SUM(abs(c - p7)) AS BIGINT) AS err7,
        |        CAST(SUM(abs(c - p1)) AS BIGINT) AS err1
        |      FROM w WHERE p7 IS NOT NULL AND p1 IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_days,
        |  (err7 * 1000000) // actual_total AS wape_lag7_ppm,
        |  (err1 * 1000000) // actual_total AS wape_lag1_ppm,
        |  err7 < err1 AS seasonal_wins
        |FROM g ORDER BY event_type""".stripMargin,

    // Rich club: per-cutoff club semi-joins on the shared e/adj
    // derivation, unioned; NULL phi when n_k < 2.
    "rich_club" ->
      ("""WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM tr WHERE src IS NOT NULL AND src <> dst),
        |adj AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
        |""".stripMargin +
        Seq(80, 85, 90).map { k =>
          s"""c$k AS (SELECT u FROM deg WHERE deg > $k),
            |n$k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_k FROM c$k),
            |e$k AS (SELECT CAST(COUNT(*) AS BIGINT) AS e_k FROM e
            |  WHERE a IN (SELECT u FROM c$k) AND b IN (SELECT u FROM c$k))""".stripMargin
        }.mkString(",\n") + "\n" +
        Seq(80, 85, 90).map { k =>
          s"""SELECT $k AS k, n_k, e_k,
            |  CASE WHEN n_k < 2 THEN NULL ELSE
            |    floor(CAST(2 * e_k AS DOUBLE) / CAST(n_k * (n_k - 1) AS DOUBLE)
            |      * 1e6 + 0.5) / 1e6 END AS phi
            |FROM n$k, e$k""".stripMargin
        }.mkString("\nUNION ALL\n") + "\nORDER BY k"),

    // Cohort LTV: integer micro revenue, bounded cumsum, day-0 fixed
    // denominator, integer division before the 4dp render.
    "cohort_ltv" ->
      """WITH a AS (SELECT user_id,
        |        CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv
        |      FROM events),
        |w AS (SELECT *, MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        |      FROM a),
        |f AS (SELECT *, datediff('day', cohort_day, day) AS age FROM w
        |      WHERE datediff('day', cohort_day, day) BETWEEN 0 AND 7),
        |cells AS (SELECT cohort_day, age, CAST(SUM(qv) AS BIGINT) AS rev_q
        |          FROM f GROUP BY 1, 2),
        |sizes AS (SELECT cohort_day,
        |            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_cohort
        |          FROM f WHERE age = 0 GROUP BY 1),
        |c2 AS (SELECT cohort_day, age, rev_q,
        |        CAST(SUM(rev_q) OVER (PARTITION BY cohort_day ORDER BY age
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_q
        |       FROM cells)
        |SELECT c2.cohort_day, c2.age, s.n_cohort,
        |  floor(CAST(rev_q AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue,
        |  floor(CAST(cum_q // n_cohort AS DOUBLE) / 100 + 0.5) / 1e4
        |    AS cum_ltv_per_user
        |FROM c2 JOIN sizes s USING (cohort_day)
        |ORDER BY cohort_day, age""".stripMargin,

    // Disorder audit: adjacent arrival pairs (event_id order) whose
    // event time steps backward; integer micros and ppm.
    "disorder_audit" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
        |      FROM events),
        |w AS (SELECT event_type, us,
        |        lag(us) OVER (PARTITION BY event_type ORDER BY event_id)
        |          AS prev_us
        |      FROM e),
        |p AS (SELECT event_type,
        |        CASE WHEN us < prev_us THEN 1 ELSE 0 END AS bk,
        |        CASE WHEN us < prev_us THEN prev_us - us ELSE 0 END AS jump
        |      FROM w WHERE prev_us IS NOT NULL),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(bk) AS BIGINT) AS n_backward,
        |        CAST(MAX(jump) AS BIGINT) AS max_jump_us
        |      FROM p GROUP BY 1)
        |SELECT event_type, n_pairs, n_backward,
        |  (n_backward * 1000000) // n_pairs AS disorder_ppm,
        |  floor(CAST(max_jump_us AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
        |    AS max_backward_s
        |FROM g ORDER BY event_type""".stripMargin,

    // Rolling correlation: integer trailing-window moments on the
    // bounded daily frame; full windows only.
    "rolling_corr" ->
      """WITH d AS (SELECT CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |          AS BIGINT) AS x,
        |        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |          AS BIGINT) AS y
        |      FROM events WHERE event_type IN ('click', 'purchase')
        |      GROUP BY 1),
        |w AS (SELECT day, x, y,
        |        CAST(COUNT(*) OVER tw AS BIGINT) AS n,
        |        CAST(SUM(x) OVER tw AS BIGINT) AS sx,
        |        CAST(SUM(y) OVER tw AS BIGINT) AS sy,
        |        CAST(SUM(x * x) OVER tw AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) OVER tw AS BIGINT) AS syy,
        |        CAST(SUM(x * y) OVER tw AS BIGINT) AS sxy
        |      FROM d WINDOW tw AS (ORDER BY day
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, x AS clicks, y AS purchases,
        |  CASE WHEN n = 7 THEN
        |    floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |  END AS rolling_r
        |FROM w ORDER BY day""".stripMargin,

    // Nelson-Aalen: the life table's hazard increments nano-quantized
    // before the (order-blind) running sum.
    "nelson_aalen" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |u AS (SELECT user_id,
        |        min(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS first_day,
        |        max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS last_day
        |      FROM events GROUP BY user_id),
        |d AS (SELECT CAST(datediff('day', first_day, last_day) AS BIGINT) AS duration,
        |        CASE WHEN datediff('day', last_day, report_date) < 7
        |          THEN 1 ELSE 0 END AS censored
        |      FROM u, md),
        |t AS (SELECT duration, CAST(SUM(1 - censored) AS BIGINT) AS n_churned,
        |        CAST(SUM(censored) AS BIGINT) AS n_censored
        |      FROM d GROUP BY duration),
        |r AS (SELECT *, CAST(SUM(n_churned + n_censored) OVER
        |        (ORDER BY duration ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |        AS BIGINT) AS n_risk
        |      FROM t),
        |h AS (SELECT duration, n_risk, n_churned,
        |        CAST(floor(CAST(n_churned AS DOUBLE) / CAST(n_risk AS DOUBLE)
        |          * 1e9 + 0.5) AS BIGINT) AS hq
        |      FROM r)
        |SELECT duration, n_risk, n_churned,
        |  floor(CAST(SUM(hq) OVER (ORDER BY duration
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 1e3 + 0.5) / 1e6 AS cum_hazard
        |FROM h ORDER BY duration""".stripMargin,

    // Split-conformal: md5-bucket user split, train-side integer-micro
    // mean, k-th order statistic by rank (integer ceil form), exact
    // coverage count.
    "conformal_interval" ->
      """WITH e AS (SELECT event_type, user_id,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |        CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |          THEN 'train' ELSE 'calib' END AS side
        |      FROM events),
        |tm AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
        |        CAST(SUM(vq) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_q
        |      FROM e WHERE side = 'train' GROUP BY 1),
        |c AS (SELECT e.event_type, abs(vq - mean_q) AS res, tm.n_train,
        |        tm.mean_q
        |      FROM e JOIN tm USING (event_type) WHERE side = 'calib'),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_calib,
        |        least((9 * (CAST(COUNT(*) AS BIGINT) + 1) + 9) // 10,
        |          CAST(COUNT(*) AS BIGINT)) AS k
        |      FROM c GROUP BY 1),
        |rk AS (SELECT event_type, res,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY res) AS rn
        |      FROM c),
        |q AS (SELECT rk.event_type, rk.res AS qhat_q
        |      FROM rk JOIN n USING (event_type) WHERE rk.rn = n.k)
        |SELECT c.event_type, MAX(c.n_train) AS n_train,
        |  CAST(COUNT(*) AS BIGINT) AS n_calib,
        |  floor(CAST(MAX(c.mean_q) AS DOUBLE) / 100 + 0.5) / 1e4 AS mean_value,
        |  floor(CAST(MAX(q.qhat_q) AS DOUBLE) / 100 + 0.5) / 1e4 AS qhat,
        |  floor(CAST(SUM(CASE WHEN c.res <= q.qhat_q THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS coverage
        |FROM c JOIN q USING (event_type)
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin,

    // Integer-exact sample ACF: num/den multiplied through by n², the
    // lag pairing as a dense-grid self-join on day + k.
    "acf_daily" ->
      """WITH ev AS (SELECT event_type,
        |        CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day FROM events),
        |daily AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |grid AS (SELECT t.event_type, CAST(g.gs AS DATE) AS day
        |         FROM (SELECT DISTINCT event_type FROM daily) t,
        |              (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gs
        |               FROM b) g),
        |dense AS (SELECT grid.event_type, grid.day, COALESCE(daily.x, 0) AS x
        |          FROM grid LEFT JOIN daily
        |            ON grid.event_type = daily.event_type AND grid.day = daily.day),
        |dev AS (SELECT event_type, day,
        |          CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * x
        |            - CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS d
        |        FROM dense),
        |num AS (SELECT a.event_type, l.k AS lag, CAST(SUM(a.d * p.d) AS BIGINT) AS num
        |        FROM dev a
        |        JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) l(k) ON TRUE
        |        JOIN dev p ON p.event_type = a.event_type AND p.day = a.day + l.k
        |        GROUP BY 1, 2),
        |den AS (SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den,
        |          CAST(COUNT(*) AS BIGINT) AS n_days
        |        FROM dev GROUP BY 1)
        |SELECT n.event_type, CAST(n.lag AS INT) AS lag, d.n_days,
        |  CASE WHEN d.den = 0 THEN NULL
        |    ELSE floor(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE) * 1e4 + 0.5) / 1e4
        |  END AS acf
        |FROM num n JOIN den d USING (event_type)
        |ORDER BY event_type, lag""".stripMargin,

    // Purged time split: last 7 days test, 2-day embargo, user-overlap
    // audit against the train user set.
    "temporal_split" ->
      """WITH md AS (SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |            FROM events),
        |t AS (SELECT user_id, CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |        CASE WHEN datediff('day', CAST(make_timestamp(epoch_us(ts)) AS DATE),
        |               report_date) < 7 THEN 'test'
        |          WHEN datediff('day', CAST(make_timestamp(epoch_us(ts)) AS DATE),
        |               report_date) < 9 THEN 'embargo'
        |          ELSE 'train' END AS split
        |      FROM events, md),
        |tu AS (SELECT DISTINCT user_id FROM t WHERE split = 'train'),
        |pu AS (SELECT split, user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
        |         MIN(day) AS mn, MAX(day) AS mx
        |       FROM t GROUP BY 1, 2)
        |SELECT split, CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  MIN(mn) AS min_day, MAX(mx) AS max_day,
        |  CAST(SUM(CASE WHEN user_id IN (SELECT user_id FROM tu)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_users_in_train
        |FROM pu GROUP BY split ORDER BY split""".stripMargin,

    // Resource-allocation link prediction on the order-part bipartite
    // graph; per-order contribution in 1e6 fixed point (integer div).
    "link_predict" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |sz AS (SELECT o, CAST(COUNT(*) AS BIGINT) AS sz FROM op GROUP BY o),
        |pr AS (SELECT a.p AS p, b.p AS q, s.sz
        |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |       JOIN sz s ON s.o = a.o),
        |g AS (SELECT p, q, CAST(COUNT(*) AS BIGINT) AS n_common,
        |        CAST(SUM(1000000 // sz) AS BIGINT) AS raq
        |      FROM pr GROUP BY p, q)
        |SELECT p AS part_a, q AS part_b, n_common, raq,
        |  CAST(raq AS DOUBLE) / 1e6 AS ra_score
        |FROM g ORDER BY raq DESC, n_common DESC, part_a, part_b
        |LIMIT 30""".stripMargin,

    // funnel_steps with the 60-minute conversion deadline on each step.
    "funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e
        |      JOIN v ON e.user_id = v.user_id AND e.us > v.t1
        |        AND e.us <= v.t1 + 3600000000
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e
        |      JOIN c ON e.user_id = c.user_id AND e.us > c.t2
        |        AND e.us <= c.t2 + 3600000000
        |      WHERE e.event_type = 'purchase' GROUP BY 1),
        |s AS (SELECT 'view' AS step, 1 AS ord,
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS users
        |      UNION ALL SELECT 'click', 2, (SELECT COUNT(*) FROM c)
        |      UNION ALL SELECT 'purchase', 3, (SELECT COUNT(*) FROM p))
        |SELECT step, ord, users,
        |  CASE WHEN (SELECT users FROM s WHERE ord = 1) = 0 THEN 0.0
        |    ELSE floor(CAST(users AS DOUBLE) /
        |      CAST((SELECT users FROM s WHERE ord = 1) AS DOUBLE)
        |      * 100 * 100 + 0.5) / 100 END AS conv_pct
        |FROM s ORDER BY ord""".stripMargin,

    "kcore" -> KcoreSql,
    "modularity" -> ModularitySql,
    "khop_reach" -> KhopReachSql,

    // Double-sweep BFS diameter bound: two depth-capped recursive
    // UNION BFS CTEs folded by MIN(dist); UNION dedup keeps the
    // (item, dist) pair space finite on the cyclic graph, the dist
    // cap mirrors the engine's maxIter guard.
    "diameter_estimate" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM tr WHERE src IS NOT NULL AND src <> dst),
        |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
        |s1 AS (SELECT u AS item FROM deg ORDER BY deg DESC, u LIMIT 1),
        |b1 AS (SELECT item, CAST(0 AS BIGINT) AS dist FROM s1
        |  UNION
        |  SELECT a.v, b.dist + 1 FROM b1 b JOIN adj a ON a.u = b.item
        |  WHERE b.dist < 20),
        |d1 AS (SELECT item, CAST(MIN(dist) AS BIGINT) AS dist
        |  FROM b1 GROUP BY 1),
        |f1 AS (SELECT item FROM d1 ORDER BY dist DESC, item LIMIT 1),
        |b2 AS (SELECT item, CAST(0 AS BIGINT) AS dist FROM f1
        |  UNION
        |  SELECT a.v, b.dist + 1 FROM b2 b JOIN adj a ON a.u = b.item
        |  WHERE b.dist < 20),
        |d2 AS (SELECT item, CAST(MIN(dist) AS BIGINT) AS dist
        |  FROM b2 GROUP BY 1)
        |SELECT (SELECT item FROM s1) AS start_node,
        |  (SELECT MAX(dist) FROM d1) AS ecc_start,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS n_reached,
        |  (SELECT item FROM f1) AS far_node,
        |  (SELECT MAX(dist) FROM d2) AS diameter_lb""".stripMargin,
    "betweenness_sampled" -> BetweennessSampledSql,
    "harmonic_centrality" -> HarmonicCentralitySql,
    "markov_attribution" -> MarkovAttributionSql,
    "shapley_attribution" -> ShapleyAttributionSql,
    "ktruss" -> KtrussSql,

    // Gaps are exact integer micros from the same (us, event_id)
    // order as the Spark window; quantile_cont interpolates on exact
    // operands, seconds render through the 4 dp floor grid.
    // Weekday envelope: exact cent operands into quantile_cont (the
    // interarrival precedent), 4-dp dollars.
    "weekday_envelope" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT *, CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow
        |      FROM daily)
        |SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  floor(quantile_cont(x, 0.1) / 100 * 1e4 + 0.5) / 1e4 AS p10,
        |  floor(quantile_cont(x, 0.5) / 100 * 1e4 + 0.5) / 1e4 AS p50,
        |  floor(quantile_cont(x, 0.9) / 100 * 1e4 + 0.5) / 1e4 AS p90
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Entry conversion: the sessionize lag/cumsum CTE at event grain,
    // first event via window, conversion ppm by integer division.
    "entry_conversion" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s2 AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS sid FROM s),
        |g AS (SELECT user_id, sid, event_type,
        |    FIRST_VALUE(item) OVER (PARTITION BY user_id, sid
        |      ORDER BY us, event_id) AS entry_item
        |  FROM s2),
        |agg AS (SELECT user_id, sid, MIN(entry_item) AS entry_item,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM g GROUP BY 1, 2)
        |SELECT entry_item, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(conv) AS BIGINT) AS n_converted,
        |  (CAST(SUM(conv) AS BIGINT) * 1000000) // COUNT(*) AS conv_ppm
        |FROM agg GROUP BY 1 ORDER BY 1""".stripMargin,

    "interarrival_percentiles" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id FROM events),
        |g AS (SELECT event_type,
        |        us - lag(us) OVER (PARTITION BY event_type
        |          ORDER BY us, event_id) AS gap
        |      FROM e)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  floor(quantile_cont(gap, 0.5) / 1e6 * 1e4 + 0.5) / 1e4 AS p50_s,
        |  floor(quantile_cont(gap, 0.9) / 1e6 * 1e4 + 0.5) / 1e4 AS p90_s,
        |  floor(quantile_cont(gap, 0.99) / 1e6 * 1e4 + 0.5) / 1e4 AS p99_s
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Both endpoint orientations of the undirected distinct-neighbor
    // graph; exact int64 moment sums; r is one double division on the
    // symmetric Pearson form (Σx = Σy, so no sqrt), 6 dp floor-grid.
    "degree_assortativity" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM tr WHERE src IS NOT NULL AND src <> dst),
        |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |s AS (SELECT dx.d AS dx, dy.d AS dy
        |      FROM adj JOIN deg dx ON dx.u = adj.u JOIN deg dy ON dy.u = adj.v),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dx) AS BIGINT) AS sx,
        |        CAST(SUM(dx * dy) AS BIGINT) AS sxy,
        |        CAST(SUM(dx * dx) AS BIGINT) AS sxx FROM s),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM
        |        (SELECT DISTINCT a AS x FROM e UNION SELECT DISTINCT b FROM e)),
        |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
        |SELECT n_nodes, n_edges,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |    ELSE floor(CAST(n * sxy - sx * sx AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6
        |  END AS assortativity
        |FROM m, nn, ne""".stripMargin,

    // Triangle corners + distinct-neighbor degrees over the same
    // undirected edge CTEs as the triangle_count oracle; C = 2T/(d(d-1))
    // with NULL below degree 2.
    "clustering_coeff" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM tr WHERE src IS NOT NULL AND src <> dst),
        |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT u AS item, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM adj GROUP BY 1),
        |w AS (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e2.a = e1.b),
        |t AS (SELECT w.a, w.b, w.c FROM w JOIN e e3 ON e3.a = w.a AND e3.b = w.c),
        |corners AS (SELECT unnest([a, b, c]) AS item FROM t),
        |cnt AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM corners GROUP BY 1)
        |SELECT deg.item, degree, COALESCE(cnt.n, 0) AS n_triangles,
        |  CASE WHEN degree >= 2 THEN
        |    floor(CAST(2 * COALESCE(cnt.n, 0) AS DOUBLE)
        |      / CAST(degree * (degree - 1) AS DOUBLE) * 1e4 + 0.5) / 1e4
        |  END AS clustering_coeff
        |FROM deg LEFT JOIN cnt ON cnt.item = deg.item
        |ORDER BY deg.item""".stripMargin,

    // Zero days contribute nothing to Σc or Σc², so only observed
    // (type, day) rows aggregate; n = the full calendar span.
    "burstiness" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |        CAST(COUNT(*) AS BIGINT) AS c
        |      FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type,
        |        CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS BIGINT) AS n_days,
        |        CAST(SUM(c) AS BIGINT) AS n_events,
        |        CAST(SUM(c * c) AS BIGINT) AS ssq
        |      FROM d GROUP BY 1)
        |SELECT event_type, n_days, n_events,
        |  floor(CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS mean_daily,
        |  floor(CAST(n_days * ssq - n_events * n_events AS DOUBLE)
        |    / CAST(n_days * n_events AS DOUBLE) * 1e4 + 0.5) / 1e4 AS dispersion
        |FROM g ORDER BY event_type""".stripMargin,

    // chi2_contingency's scalar: per-cell contribution from exact
    // int64 operands over the COMPLETE margin grid (zero cells
    // included), micro-quantized before the (order-blind) sum.
    "cramers_v" ->
      """WITH cells AS (SELECT event_type,
        |    CAST((ts::DATE - DATE '1970-01-01') % 7 AS INT) AS tow,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT tow, CAST(SUM(o) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |w AS (SELECT rt.event_type, ct.tow,
        |    COALESCE(c.o, 0) AS o, rt.rt, ct.ct, tot.n
        |  FROM rt CROSS JOIN ct CROSS JOIN tot
        |  LEFT JOIN cells c
        |    ON c.event_type = rt.event_type AND c.tow = ct.tow),
        |q AS (SELECT n, event_type, tow,
        |    CAST(floor(CAST(o * n - rt * ct AS DOUBLE)
        |      * CAST(o * n - rt * ct AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |      * 1e6 + 0.5) AS BIGINT) AS contrib_q
        |  FROM w),
        |s AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |    CAST(COUNT(DISTINCT tow) AS BIGINT) AS n_tows,
        |    CAST(SUM(contrib_q) AS BIGINT) AS chi2_q FROM q)
        |SELECT n, n_types, n_tows,
        |  floor(CAST(chi2_q AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS chi2,
        |  floor(sqrt(CAST(chi2_q AS DOUBLE) / 1e6
        |    / (CAST(n AS DOUBLE) * CAST(least(n_types, n_tows) - 1 AS DOUBLE)))
        |    * 1e6 + 0.5) / 1e6 AS cramers_v
        |FROM s""".stripMargin,

    // SRM guardrail: distinct exposed users per md5-parity arm,
    // integer 1-df chi-square numerator/denominator, one division.
    "srm_check" ->
      """WITH ex AS (SELECT DISTINCT event_type, user_id FROM events),
        |a AS (SELECT event_type,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM ex),
        |c AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM a GROUP BY 1)
        |SELECT event_type, n0, n1,
        |  (n0 * 1000000) // (n0 + n1) AS arm0_ppm,
        |  floor(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
        |    / CAST(n0 + n1 AS DOUBLE) * 1e4 + 0.5) / 1e4 AS chi2,
        |  CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
        |    / CAST(n0 + n1 AS DOUBLE) > 3.8415 AS srm
        |FROM c ORDER BY event_type""".stripMargin,

    // MDE sizing: per-user micro sums, decimal(38,0) moments pivoted
    // to fixed arm order, one deterministic double sequence.
    "mde_power" ->
      """WITH per AS (SELECT event_type, user_id,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS uv
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, uv,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM per),
        |pa AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(uv AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(uv AS DECIMAL(38,0)) * uv) AS ss
        |  FROM a GROUP BY 1, 2),
        |w AS (SELECT event_type,
        |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN arm = 0 THEN s END) AS s0,
        |    MAX(CASE WHEN arm = 1 THEN s END) AS s1,
        |    MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
        |    MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        |  FROM pa GROUP BY 1),
        |f AS (SELECT event_type, n0, n1,
        |    sqrt(greatest((CAST(ss0 AS DOUBLE)
        |          - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |        / (CAST(n0 AS DOUBLE) - 1.0), 0.0) / CAST(n0 AS DOUBLE)
        |      + greatest((CAST(ss1 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |        / (CAST(n1 AS DOUBLE) - 1.0), 0.0) / CAST(n1 AS DOUBLE)) AS se,
        |    CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0
        |  FROM w WHERE n0 > 1 AND n1 > 1)
        |SELECT event_type, n0, n1,
        |  floor(m0 / 1e6 * 1e4 + 0.5) / 1e4 AS mean0,
        |  floor(2.801585 * se / 1e6 * 1e4 + 0.5) / 1e4 AS mde_abs,
        |  floor(2.801585 * se / NULLIF(m0, 0.0) * 1e4 + 0.5) / 1e4 AS mde_rel
        |FROM f ORDER BY event_type""".stripMargin,

    // RMST per arm: KM factors 1 − (d·1e9 // n)/1e9 folded in
    // ascending duration order by a recursive CTE (the operator's
    // aggregate() left-fold — same order, bit-equal doubles), each
    // step's area S-quantized to 1e-9 and summed in HUGEINT.
    "rmst_arms" ->
      """WITH RECURSIVE md AS (
        |  SELECT max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS report_date
        |  FROM events),
        |u AS (SELECT user_id,
        |        min(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS first_day,
        |        max(CAST(make_timestamp(epoch_us(ts)) AS DATE)) AS last_day
        |      FROM events GROUP BY user_id),
        |d AS (SELECT CAST(datediff('day', first_day, last_day) AS BIGINT) AS duration,
        |        CASE WHEN datediff('day', last_day, report_date) < 7
        |          THEN 1 ELSE 0 END AS censored,
        |        CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |          AS BIGINT) % 2 AS arm
        |      FROM u, md),
        |t AS (SELECT arm, duration,
        |        CAST(SUM(1 - censored) AS BIGINT) AS dd,
        |        CAST(COUNT(*) AS BIGINT) AS tt
        |      FROM d GROUP BY 1, 2),
        |r AS (SELECT arm, duration, dd,
        |        CAST(SUM(tt) OVER (PARTITION BY arm ORDER BY duration
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n
        |      FROM t),
        |s AS (SELECT arm, duration,
        |        CAST(1000000000 - (dd * 1000000000) // n AS DOUBLE) / 1e9 AS f,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY arm ORDER BY duration)
        |          AS BIGINT) AS i
        |      FROM r WHERE dd > 0),
        |arms AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users FROM d GROUP BY 1),
        |sc AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_steps FROM s GROUP BY 1),
        |rec AS (
        |  SELECT arm, CAST(0 AS BIGINT) AS i, CAST(1.0 AS DOUBLE) AS sv,
        |         CAST(0 AS BIGINT) AS tp, CAST(0 AS HUGEINT) AS tot
        |  FROM arms
        |  UNION ALL
        |  SELECT r2.arm, st.i, r2.sv * st.f, st.duration,
        |    r2.tot + CAST(CAST(floor(r2.sv * 1e9 + 0.5) AS BIGINT) AS HUGEINT)
        |      * CAST(least(st.duration, 28) - least(r2.tp, 28) AS HUGEINT)
        |  FROM rec r2 JOIN s st ON st.arm = r2.arm AND st.i = r2.i + 1),
        |fin AS (SELECT arm, sv, tp, tot,
        |          ROW_NUMBER() OVER (PARTITION BY arm ORDER BY i DESC) AS rn
        |        FROM rec)
        |SELECT a.arm, a.n_users, COALESCE(sc.n_steps, 0) AS n_steps,
        |  floor(CAST(f.tot
        |      + CAST(CAST(floor(f.sv * 1e9 + 0.5) AS BIGINT) AS HUGEINT)
        |        * CAST(28 - least(f.tp, 28) AS HUGEINT) AS DOUBLE)
        |    / 1e9 * 1e6 + 0.5) / 1e6 AS rmst_days
        |FROM arms a
        |JOIN fin f ON f.arm = a.arm AND f.rn = 1
        |LEFT JOIN sc ON sc.arm = a.arm
        |ORDER BY a.arm""".stripMargin,

    // Holt backtest: milli-scaled integer recursion halved by
    // arithmetic right shift (>> floors on both engines), recursive
    // CTE ≡ the operator's ascending-order fold; WAPE ppm integer div.
    "holt_backtest" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |ty AS (SELECT DISTINCT event_type FROM daily),
        |ix AS (SELECT unnest(generate_series(0,
        |      CAST(datediff('day', d0, d1) AS BIGINT))) AS idx,
        |    CAST(datediff('day', d0, d1) AS BIGINT) - 14 AS si, d0
        |  FROM bo),
        |spine AS (SELECT ty.event_type, CAST(ix.idx AS BIGINT) AS idx, ix.si,
        |    ix.d0 + CAST(ix.idx AS INT) AS day
        |  FROM ty, ix),
        |dense AS (SELECT s.event_type, s.idx, s.si,
        |    COALESCE(d.c, 0) * 1000 AS ym
        |  FROM spine s LEFT JOIN daily d
        |    ON d.event_type = s.event_type AND d.day = s.day),
        |tr AS (SELECT event_type, ym,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx) AS i
        |  FROM dense WHERE idx <= si),
        |rec AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS i, ym AS l,
        |    CAST(0 AS BIGINT) AS b
        |  FROM tr WHERE i = 1
        |  UNION ALL
        |  SELECT t.event_type, t.i, (t.ym + r.l + r.b) >> 1,
        |    (((t.ym + r.l + r.b) >> 1) - r.l + r.b) >> 1
        |  FROM rec r JOIN tr t ON t.event_type = r.event_type AND t.i = r.i + 1),
        |fit AS (SELECT event_type, si_f, l, b FROM (
        |  SELECT r.event_type, r.l, r.b,
        |    (SELECT MAX(si) FROM dense) AS si_f,
        |    ROW_NUMBER() OVER (PARTITION BY r.event_type ORDER BY r.i DESC) AS rn
        |  FROM rec r) WHERE rn = 1),
        |ev AS (SELECT d.event_type, d.ym,
        |    abs(d.ym - (f.l + (d.idx - f.si_f) * f.b)) AS errh,
        |    abs(d.ym - n7.ym) AS err7
        |  FROM dense d
        |  JOIN dense n7 ON n7.event_type = d.event_type AND n7.idx = d.idx - 7
        |  JOIN fit f ON f.event_type = d.event_type
        |  WHERE d.idx > d.si)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST((SUM(errh) * 1000000) // SUM(ym) AS BIGINT) AS wape_holt_ppm,
        |  CAST((SUM(err7) * 1000000) // SUM(ym) AS BIGINT) AS wape_naive_ppm,
        |  SUM(errh) < SUM(err7) AS holt_wins
        |FROM ev GROUP BY event_type
        |HAVING SUM(ym) > 0 ORDER BY event_type""".stripMargin,

    // Association rules: the item_affinity pair frame with BOTH
    // directional confidences as exact ppm; LIMIT ties total on
    // (support DESC, item_a, item_b).
    "association_rules" ->
      """WITH it AS (SELECT DISTINCT user_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |        CAST(COUNT(*) AS BIGINT) AS c12
        |      FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |c1 AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c1 FROM it GROUP BY 1)
        |SELECT p.item_a, p.item_b, p.c12, ca.c1 AS c1a, cb.c1 AS c1b,
        |  CAST((p.c12 * 1000000) // ca.c1 AS BIGINT) AS conf_ab_ppm,
        |  CAST((p.c12 * 1000000) // cb.c1 AS BIGINT) AS conf_ba_ppm
        |FROM p JOIN c1 ca ON ca.item = p.item_a
        |JOIN c1 cb ON cb.item = p.item_b
        |ORDER BY p.c12 DESC, p.item_a, p.item_b LIMIT 50""".stripMargin,

    // Directed reciprocity: distinct-edge frame, reversed-key join
    // (distinct ⇒ ≤ 1 match ≡ semi), exact ppm.
    "reciprocity" ->
      """WITH base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT src AS u, dst AS v FROM tr
        |      WHERE src IS NOT NULL AND src <> dst),
        |r AS (SELECT e1.u, e1.v FROM e e1
        |      JOIN e e2 ON e2.u = e1.v AND e2.v = e1.u)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM r) AS n_reciprocal,
        |  CAST(((SELECT COUNT(*) FROM r) * 1000000)
        |    // (SELECT COUNT(*) FROM e) AS BIGINT) AS reciprocity_ppm""".stripMargin,

    // Hour × weekday heatmap: arithmetic mod-7 weekday (engine-
    // portable), clock hour, 168-cell grid + 1-row total.
    "hourly_heatmap" ->
      """WITH c AS (SELECT
        |    CAST(datediff('day', DATE '1970-01-01', ts::DATE) % 7 AS INT)
        |      AS weekday,
        |    CAST(hour(ts) AS INT) AS hour_of_day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events),
        |g AS (SELECT weekday, hour_of_day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(vc) AS BIGINT) AS cents
        |  FROM c GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n_total FROM g)
        |SELECT weekday, hour_of_day, n_events,
        |  CAST((n_events * 1000000) // t.n_total AS BIGINT) AS share_ppm,
        |  floor(CAST(cents * 10000 AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue
        |FROM g, t ORDER BY weekday, hour_of_day""".stripMargin,

    // Funnel stage latency: the conversion_latency pairing chained
    // through the click; quantile_cont ≡ percentile on exact µs.
    "funnel_stage_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.us) AS t2, MIN(v.t1) AS t1
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.us) AS t3, MIN(c.t2) AS t2
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY 1),
        |s1 AS (SELECT 'view_to_click' AS stage,
        |    CAST(COUNT(*) AS BIGINT) AS n_users,
        |    floor(quantile_cont(CAST(t2 - t1 AS DOUBLE), 0.5) / 1e6
        |      * 1e4 + 0.5) / 1e4 AS p50_sec,
        |    floor(quantile_cont(CAST(t2 - t1 AS DOUBLE), 0.9) / 1e6
        |      * 1e4 + 0.5) / 1e4 AS p90_sec
        |  FROM c),
        |s2 AS (SELECT 'click_to_purchase' AS stage,
        |    CAST(COUNT(*) AS BIGINT) AS n_users,
        |    floor(quantile_cont(CAST(t3 - t2 AS DOUBLE), 0.5) / 1e6
        |      * 1e4 + 0.5) / 1e4 AS p50_sec,
        |    floor(quantile_cont(CAST(t3 - t2 AS DOUBLE), 0.9) / 1e6
        |      * 1e4 + 0.5) / 1e4 AS p90_sec
        |  FROM p)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY stage""".stripMargin,

    // Gateway items: first touch via rn = 1 (≡ the engine's
    // lexicographic struct min — event_id is unique), ever-purchased-
    // after flag, exact-ppm conversion.
    "gateway_items" ->
      """WITH t AS (SELECT user_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
        |      AS item,
        |    epoch_us(ts) AS us, event_id
        |  FROM events),
        |f AS (SELECT user_id, us AS t1, item FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS rn FROM t) WHERE rn = 1),
        |pu AS (SELECT user_id, MAX(epoch_us(ts)) AS lp FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT f.item,
        |    CASE WHEN pu.lp > f.t1 THEN 1 ELSE 0 END AS conv
        |  FROM f LEFT JOIN pu ON pu.user_id = f.user_id)
        |SELECT item, CAST(COUNT(*) AS BIGINT) AS n_first_users,
        |  CAST(SUM(conv) AS BIGINT) AS n_converted,
        |  CAST((SUM(conv) * 1000000) // COUNT(*) AS BIGINT) AS conv_ppm
        |FROM j GROUP BY 1 ORDER BY item""".stripMargin,

    // Within-session funnel: the sessionize pass, first-click min +
    // last-purchase max in one aggregate, 1-row fold.
    "session_funnel" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM f),
        |g AS (SELECT user_id, session_idx,
        |    MIN(CASE WHEN event_type = 'click' THEN us END) AS fc,
        |    MAX(CASE WHEN event_type = 'purchase' THEN us END) AS lp
        |  FROM s GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_click_sessions,
        |  CAST(SUM(CASE WHEN fc IS NOT NULL AND lp > fc THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_converted,
        |  CAST((SUM(CASE WHEN fc IS NOT NULL AND lp > fc THEN 1 ELSE 0 END)
        |      * 1000000)
        |    // NULLIF(SUM(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS conv_ppm
        |FROM g""".stripMargin,

    // Pivot SCC: two recursive reachability closures (UNION dedup on
    // the node alone — monotone, terminates) intersected VIA JOIN —
    // INTERSECT is rejected inside a WITH RECURSIVE block; the nodes
    // helper dedups via DISTINCT-over-UNION-ALL (the recursive-block
    // UNION pitfall).
    "pivot_scc" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT src AS u, dst AS v FROM tr
        |      WHERE src IS NOT NULL AND src <> dst),
        |nodes AS (SELECT DISTINCT item FROM
        |  (SELECT u AS item FROM e UNION ALL SELECT v FROM e)),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |pv AS (SELECT u AS item FROM deg ORDER BY deg DESC, u LIMIT 1),
        |fw AS (SELECT item FROM pv
        |  UNION
        |  SELECT e.v FROM fw JOIN e ON e.u = fw.item),
        |bw AS (SELECT item FROM pv
        |  UNION
        |  SELECT e.u FROM bw JOIN e ON e.v = bw.item),
        |scc AS (SELECT fw.item FROM fw JOIN bw ON bw.item = fw.item)
        |SELECT (SELECT item FROM pv) AS pivot,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fw) AS forward_reach,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bw) AS backward_reach,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM scc) AS scc_size,
        |  CAST(((SELECT COUNT(*) FROM scc) * 1000000)
        |    // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS scc_share_ppm""".stripMargin,

    // Repeat-purchase latency: two chained purchase mins, exact µs
    // gaps, quantile_cont ≡ percentile on exact integers, 4-dp days.
    "repeat_purchase_latency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, MIN(us) AS t1 FROM e GROUP BY 1),
        |s AS (SELECT e.user_id, MIN(e.us) AS t2, MIN(f.t1) AS t1
        |  FROM e JOIN f ON e.user_id = f.user_id
        |  WHERE e.us > f.t1 GROUP BY 1)
        |SELECT strftime(make_timestamp(t1), '%Y-%m') AS month,
        |  CAST(COUNT(*) AS BIGINT) AS n_repeaters,
        |  floor(quantile_cont(CAST(t2 - t1 AS DOUBLE), 0.5) / 86400e6
        |    * 1e4 + 0.5) / 1e4 AS p50_days,
        |  floor(quantile_cont(CAST(t2 - t1 AS DOUBLE), 0.9) / 86400e6
        |    * 1e4 + 0.5) / 1e4 AS p90_days
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // Poisson rate test: per-type counts vs the global 2-row user
    // exposure, the engine's exact double chain; rounded-z compare.
    "poisson_rate_test" ->
      """WITH u AS (SELECT
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |ex AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM u),
        |pt AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN CAST(('0x' || substring(md5('ab:' ||
        |      CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN CAST(('0x' || substring(md5('ab:' ||
        |      CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM events GROUP BY 1),
        |r AS (SELECT event_type, c0, c1, n0, n1,
        |    floor(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1e6 + 0.5) / 1e6
        |      AS rate0,
        |    floor(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 1e6 + 0.5) / 1e6
        |      AS rate1,
        |    floor((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |       - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      / NULLIF(sqrt(
        |          CAST(c0 AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))
        |        + CAST(c1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))),
        |        0.0) * 1e6 + 0.5) / 1e6 AS z
        |  FROM pt, ex WHERE n0 > 0 AND n1 > 0)
        |SELECT event_type, c0, c1, n0, n1, rate0, rate1, z,
        |  CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > 1.96 END AS significant
        |FROM r ORDER BY event_type""".stripMargin,

    // Cochran-Armitage trend: one user-dedup aggregate, cleared
    // denominators on DECIMAL, the engine's exact double chain.
    "cochran_armitage" ->
      """WITH u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |pa AS (SELECT
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 3 AS arm, conv
        |  FROM u),
        |g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(conv) AS BIGINT) AS r
        |  FROM pa GROUP BY 1),
        |w AS (SELECT
        |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN arm = 2 THEN n END) AS n2,
        |    MAX(CASE WHEN arm = 0 THEN r END) AS r0,
        |    MAX(CASE WHEN arm = 1 THEN r END) AS r1,
        |    MAX(CASE WHEN arm = 2 THEN r END) AS r2
        |  FROM g),
        |f AS (SELECT *, n0 + n1 + n2 AS nn, r0 + r1 + r2 AS rr FROM w
        |  WHERE n0 IS NOT NULL AND n1 IS NOT NULL AND n2 IS NOT NULL),
        |zc AS (SELECT n0, n1, n2, r0, r1, r2,
        |    floor(
        |      CAST(CAST(r1 AS DECIMAL(38,0)) * nn - CAST(n1 AS DECIMAL(38,0)) * rr
        |        + 2 * (CAST(r2 AS DECIMAL(38,0)) * nn
        |               - CAST(n2 AS DECIMAL(38,0)) * rr)
        |        AS DOUBLE)
        |      / NULLIF(sqrt(CAST(
        |          CAST(rr AS DECIMAL(38,0)) * (nn - rr)
        |            * (CAST(nn AS DECIMAL(38,0)) * (n1 + 4 * n2)
        |               - CAST(n1 + 2 * n2 AS DECIMAL(38,0)) * (n1 + 2 * n2))
        |          AS DOUBLE) / CAST(nn AS DOUBLE)), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS z
        |  FROM f)
        |SELECT n0, n1, n2, r0, r1, r2, z,
        |  CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > 1.96 END AS significant
        |FROM zc""".stripMargin,

    // Fisher index-of-dispersion Poisson check: exact HUGEINT daily
    // moments, the engine's fixed chains, sqrt-based normal approx.
    "overdispersion_check" -> {
      val disp = """((CAST(s2 AS DOUBLE)
        | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(t_days AS DOUBLE))
        | / CAST(t_days - 1 AS DOUBLE))
        | / (CAST(s1 AS DOUBLE) / CAST(t_days AS DOUBLE))""".stripMargin
      s"""WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t_days,
        |    SUM(CAST(c AS HUGEINT)) AS s1,
        |    SUM(CAST(c AS HUGEINT) * c) AS s2
        |  FROM daily GROUP BY 1),
        |ok AS (SELECT * FROM agg WHERE t_days > 1),
        |f AS (SELECT event_type, t_days,
        |    floor(CAST(s1 AS DOUBLE) / CAST(t_days AS DOUBLE) * 1e4 + 0.5)
        |      / 1e4 AS mean_c,
        |    floor(($disp) * 1e4 + 0.5) / 1e4 AS dispersion,
        |    floor((sqrt(2.0 * CAST(t_days - 1 AS DOUBLE) * ($disp))
        |      - sqrt(2.0 * CAST(t_days - 1 AS DOUBLE) - 1.0))
        |      * 1e4 + 0.5) / 1e4 AS z
        |  FROM ok)
        |SELECT event_type, t_days, mean_c, dispersion, z,
        |  CASE WHEN z > 1.96 THEN 'overdispersed'
        |       WHEN z < -1.96 THEN 'underdispersed'
        |       ELSE 'poisson' END AS verdict
        |FROM f ORDER BY event_type""".stripMargin
    },

    // Yuen trimmed-mean test: position-trimming off the value
    // histogram (HUGEINT sums), t/df through the engine's chains.
    "yuen_test" -> {
      val dd0 = """(CAST(sw20 AS DOUBLE)
        | - CAST(sw0 AS DOUBLE) * CAST(sw0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        | / (CAST(h0 AS DOUBLE) * CAST(h0 - 1 AS DOUBLE))""".stripMargin
      val dd1 = """(CAST(sw21 AS DOUBLE)
        | - CAST(sw1 AS DOUBLE) * CAST(sw1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        | / (CAST(h1 AS DOUBLE) * CAST(h1 - 1 AS DOUBLE))""".stripMargin
      s"""WITH g0 AS (SELECT event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM events),
        |grid AS (SELECT event_type, arm, vq, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM g0 GROUP BY 1, 2, 3),
        |w AS (SELECT event_type, arm, vq, c,
        |    SUM(c) OVER (PARTITION BY event_type, arm ORDER BY vq) - c AS b,
        |    SUM(c) OVER (PARTITION BY event_type, arm) AS n
        |  FROM grid),
        |w2 AS (SELECT *, n // 5 AS g FROM w),
        |w3 AS (SELECT *,
        |    greatest(0, least(b + c, n - g) - greatest(b, g)) AS cmid
        |  FROM w2),
        |agg AS (SELECT event_type, arm, MAX(n) AS n, MAX(g) AS g,
        |    MIN(CASE WHEN b + c >= g + 1 THEN vq END) AS lo,
        |    MIN(CASE WHEN b + c >= n - g THEN vq END) AS hi,
        |    SUM(CAST(cmid AS HUGEINT) * vq) AS ts,
        |    SUM(CAST(cmid AS HUGEINT) * vq * vq) AS ts2
        |  FROM w3 GROUP BY 1, 2),
        |agg2 AS (SELECT *, n - 2 * g AS h,
        |    ts + CAST(g AS HUGEINT) * lo + CAST(g AS HUGEINT) * hi AS sw,
        |    ts2 + CAST(g AS HUGEINT) * lo * lo
        |        + CAST(g AS HUGEINT) * hi * hi AS sw2
        |  FROM agg),
        |wide AS (SELECT event_type,
        |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN arm = 0 THEN h END) AS h0,
        |    MAX(CASE WHEN arm = 0 THEN ts END) AS ts0,
        |    MAX(CASE WHEN arm = 0 THEN sw END) AS sw0,
        |    MAX(CASE WHEN arm = 0 THEN sw2 END) AS sw20,
        |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN arm = 1 THEN h END) AS h1,
        |    MAX(CASE WHEN arm = 1 THEN ts END) AS ts1,
        |    MAX(CASE WHEN arm = 1 THEN sw END) AS sw1,
        |    MAX(CASE WHEN arm = 1 THEN sw2 END) AS sw21
        |  FROM agg2 GROUP BY 1),
        |ok AS (SELECT * FROM wide WHERE h0 > 1 AND h1 > 1),
        |f AS (SELECT event_type, n0, n1,
        |    floor(CAST(ts0 AS DOUBLE) / CAST(h0 AS DOUBLE) / 1e6
        |      * 1e4 + 0.5) / 1e4 AS tmean0,
        |    floor(CAST(ts1 AS DOUBLE) / CAST(h1 AS DOUBLE) / 1e6
        |      * 1e4 + 0.5) / 1e4 AS tmean1,
        |    floor((CAST(ts0 AS DOUBLE) / CAST(h0 AS DOUBLE)
        |        - CAST(ts1 AS DOUBLE) / CAST(h1 AS DOUBLE))
        |      / sqrt(($dd0) + ($dd1)) * 1e4 + 0.5) / 1e4 AS t,
        |    floor((($dd0) + ($dd1)) * (($dd0) + ($dd1))
        |      / (($dd0) * ($dd0) / CAST(h0 - 1 AS DOUBLE)
        |         + ($dd1) * ($dd1) / CAST(h1 - 1 AS DOUBLE))
        |      * 1e4 + 0.5) / 1e4 AS df
        |  FROM ok)
        |SELECT event_type,
        |  CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  tmean0, tmean1, t, df,
        |  CASE WHEN t IS NULL THEN FALSE ELSE abs(t) > 1.96 END AS significant
        |FROM f ORDER BY event_type""".stripMargin
    },

    // Kendall's W: the Friedman effect size off the SAME pipeline —
    // W = Q/(b(k−1)) dividing the published 6-dp Q once, re-rounded.
    "kendall_w" ->
      """WITH daily AS (SELECT
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day, event_type,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |dense AS (SELECT d.day, t.event_type, COALESCE(x.v, 0) AS v
        |  FROM (SELECT DISTINCT day FROM daily) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
        |  LEFT JOIN daily x ON x.day = d.day AND x.event_type = t.event_type),
        |rk AS (SELECT day, event_type, v,
        |    RANK() OVER (PARTITION BY day ORDER BY v) AS rnk,
        |    CAST(COUNT(*) OVER (PARTITION BY day, v) AS BIGINT) AS t
        |  FROM dense),
        |r2t AS (SELECT day, event_type,
        |    2 * (rnk - 1) + t + 1 AS r2 FROM rk),
        |blocks AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS b,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
        |    SUM(CAST(r2 AS HUGEINT) * r2) AS a4
        |  FROM r2t),
        |pt AS (SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2sum
        |  FROM r2t GROUP BY 1),
        |dev AS (SELECT b, k, a4,
        |    SUM((CAST(r2sum AS HUGEINT) - CAST(b AS HUGEINT) * (k + 1))
        |      * (CAST(r2sum AS HUGEINT) - CAST(b AS HUGEINT) * (k + 1)))
        |      AS devsq
        |  FROM pt, blocks GROUP BY 1, 2, 3),
        |f AS (SELECT b, k,
        |    floor(CAST((k - 1) * devsq AS DOUBLE)
        |      / CAST(a4 - CAST(b AS HUGEINT) * k * (k + 1) * (k + 1)
        |             AS DOUBLE)
        |      * 1e6 + 0.5) / 1e6 AS q
        |  FROM dev),
        |wv AS (SELECT b, k,
        |    floor(q / CAST(b * (k - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS w
        |  FROM f)
        |SELECT b, k, w,
        |  CASE WHEN w IS NULL THEN 'undefined'
        |       WHEN w >= 0.7 THEN 'strong'
        |       WHEN w >= 0.3 THEN 'moderate'
        |       ELSE 'weak' END AS agreement
        |FROM wv""".stripMargin,

    // Friedman blocked-rank test: doubled within-day ranks, Conover
    // ties correction, everything integer until one double division.
    "friedman_test" ->
      """WITH daily AS (SELECT
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day, event_type,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |dense AS (SELECT d.day, t.event_type, COALESCE(x.v, 0) AS v
        |  FROM (SELECT DISTINCT day FROM daily) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
        |  LEFT JOIN daily x ON x.day = d.day AND x.event_type = t.event_type),
        |rk AS (SELECT day, event_type, v,
        |    RANK() OVER (PARTITION BY day ORDER BY v) AS rnk,
        |    CAST(COUNT(*) OVER (PARTITION BY day, v) AS BIGINT) AS t
        |  FROM dense),
        |r2t AS (SELECT day, event_type,
        |    2 * (rnk - 1) + t + 1 AS r2 FROM rk),
        |blocks AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS b,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
        |    SUM(CAST(r2 AS HUGEINT) * r2) AS a4
        |  FROM r2t),
        |pt AS (SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2sum
        |  FROM r2t GROUP BY 1),
        |dev AS (SELECT b, k, a4,
        |    SUM((CAST(r2sum AS HUGEINT) - CAST(b AS HUGEINT) * (k + 1))
        |      * (CAST(r2sum AS HUGEINT) - CAST(b AS HUGEINT) * (k + 1)))
        |      AS devsq
        |  FROM pt, blocks GROUP BY 1, 2, 3),
        |f AS (SELECT b, k,
        |    floor(CAST((k - 1) * devsq AS DOUBLE)
        |      / CAST(a4 - CAST(b AS HUGEINT) * k * (k + 1) * (k + 1)
        |             AS DOUBLE)
        |      * 1e6 + 0.5) / 1e6 AS q
        |  FROM dev)
        |,crit AS (SELECT b, k, q,
        |    CASE WHEN k = 2 THEN 3.841459 WHEN k = 3 THEN 5.991465
        |         WHEN k = 4 THEN 7.814728 WHEN k = 5 THEN 9.487729
        |         WHEN k = 6 THEN 11.070498 WHEN k = 7 THEN 12.591587
        |         WHEN k = 8 THEN 14.067140 WHEN k = 9 THEN 15.507313
        |         WHEN k = 10 THEN 16.918978 WHEN k = 11 THEN 18.307038
        |    END AS cv
        |  FROM f)
        |SELECT b, k, q,
        |  CASE WHEN q IS NULL THEN FALSE
        |       WHEN cv IS NULL THEN NULL
        |       ELSE q > cv END AS significant
        |FROM crit""".stripMargin,

    // Cochran-Mantel-Haenszel stratified 2x2: per-stratum rationals on
    // the 1e-9 HUGEINT grid (floor-division staged exactly like the
    // engine's DECIMAL chain), one fixed double chain each for chi2/OR.
    "mantel_haenszel" ->
      """WITH md AS (SELECT MAX(CAST(make_timestamp(epoch_us(ts)) AS DATE))
        |    AS report_date FROM events),
        |u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
        |    MAX(CASE WHEN event_type = 'purchase'
        |          AND CAST(make_timestamp(epoch_us(ts)) AS DATE) = report_date
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events, md GROUP BY 1),
        |s AS (SELECT
        |    CASE WHEN n_ev <= 62 THEN 0 WHEN n_ev <= 70 THEN 1 ELSE 2 END
        |      AS stratum,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm, conv
        |  FROM u),
        |cells AS (SELECT stratum,
        |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 - conv ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 - conv ELSE 0 END) AS BIGINT) AS d
        |  FROM s GROUP BY 1),
        |terms AS (SELECT a, b, c, d, t,
        |    (CAST(a + b AS HUGEINT) * (a + c) * 1000000000) // t AS e_nano
        |  FROM (SELECT *, a + b + c + d AS t FROM cells) WHERE t >= 2),
        |terms2 AS (SELECT a, e_nano,
        |    ((e_nano * (c + d)) // t * (b + d)) // (t - 1) AS v_nano,
        |    (CAST(a AS HUGEINT) * d * 1000000000) // t AS ad_nano,
        |    (CAST(b AS HUGEINT) * c * 1000000000) // t AS bc_nano
        |  FROM terms),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(a) AS BIGINT) AS sum_a,
        |    SUM(e_nano) AS es, SUM(v_nano) AS vs,
        |    SUM(ad_nano) AS ads, SUM(bc_nano) AS bcs
        |  FROM terms2),
        |f AS (SELECT n_strata, sum_a,
        |    CAST(es AS BIGINT) AS e_nano, CAST(vs AS BIGINT) AS v_nano,
        |    floor(CAST(ads AS DOUBLE) / NULLIF(CAST(bcs AS DOUBLE), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS or_mh,
        |    floor(CAST(greatest(abs(CAST(sum_a AS HUGEINT) * 1000000000 - es)
        |          - 500000000, 0) AS DOUBLE)
        |      * CAST(greatest(abs(CAST(sum_a AS HUGEINT) * 1000000000 - es)
        |          - 500000000, 0) AS DOUBLE)
        |      / NULLIF(CAST(vs AS DOUBLE) * 1e9, 0.0) * 1e6 + 0.5) / 1e6
        |      AS chi2_mh
        |  FROM tot)
        |SELECT n_strata, sum_a, e_nano, v_nano, or_mh, chi2_mh,
        |  CASE WHEN chi2_mh IS NULL THEN FALSE
        |       ELSE chi2_mh > 3.841459 END AS significant
        |FROM f""".stripMargin,

    // Holt-Winters additive weekly: the holt_backtest recursion with
    // seven seasonal columns carried through the recursive CTE; the
    // level-update fragment (lp) is textually repeated wherever the
    // engine's fold references l' — recursive CTEs cannot name a
    // computed column in their own step.
    "holt_winters_backtest" -> {
      val sel = "CASE t.idx % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1" +
        " WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4" +
        " WHEN 5 THEN r.s5 ELSE r.s6 END"
      val lp = s"((t.ym - ($sel) + r.l + r.b) >> 1)"
      def sj(j: Int) =
        s"CASE WHEN t.idx % 7 = $j THEN ((t.ym - $lp + r.s$j) >> 1)" +
          s" ELSE r.s$j END AS s$j"
      val fsel = "CASE d.idx % 7 WHEN 0 THEN f.s0 WHEN 1 THEN f.s1" +
        " WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4" +
        " WHEN 5 THEN f.s5 ELSE f.s6 END"
      s"""WITH RECURSIVE daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |ty AS (SELECT DISTINCT event_type FROM daily),
        |ix AS (SELECT unnest(generate_series(0,
        |      CAST(datediff('day', d0, d1) AS BIGINT))) AS idx,
        |    CAST(datediff('day', d0, d1) AS BIGINT) - 14 AS si, d0
        |  FROM bo),
        |spine AS (SELECT ty.event_type, CAST(ix.idx AS BIGINT) AS idx, ix.si,
        |    ix.d0 + CAST(ix.idx AS INT) AS day
        |  FROM ty, ix),
        |dense AS (SELECT s.event_type, s.idx, s.si,
        |    COALESCE(d.c, 0) * 1000 AS ym
        |  FROM spine s LEFT JOIN daily d
        |    ON d.event_type = s.event_type AND d.day = s.day),
        |sd AS (SELECT event_type, CAST(SUM(ym) // 7 AS BIGINT) AS l0
        |  FROM dense WHERE idx <= 6 GROUP BY 1),
        |sw AS (SELECT d.event_type, sd.l0,
        |    MAX(CASE WHEN d.idx = 0 THEN d.ym - sd.l0 END) AS s0,
        |    MAX(CASE WHEN d.idx = 1 THEN d.ym - sd.l0 END) AS s1,
        |    MAX(CASE WHEN d.idx = 2 THEN d.ym - sd.l0 END) AS s2,
        |    MAX(CASE WHEN d.idx = 3 THEN d.ym - sd.l0 END) AS s3,
        |    MAX(CASE WHEN d.idx = 4 THEN d.ym - sd.l0 END) AS s4,
        |    MAX(CASE WHEN d.idx = 5 THEN d.ym - sd.l0 END) AS s5,
        |    MAX(CASE WHEN d.idx = 6 THEN d.ym - sd.l0 END) AS s6
        |  FROM dense d JOIN sd ON sd.event_type = d.event_type
        |  WHERE d.idx <= 6 GROUP BY 1, 2),
        |tr AS (SELECT event_type, idx, ym,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx) AS i
        |  FROM dense WHERE idx > 6 AND idx <= si),
        |rec AS (
        |  SELECT event_type, CAST(0 AS BIGINT) AS i, l0 AS l,
        |    CAST(0 AS BIGINT) AS b, s0, s1, s2, s3, s4, s5, s6
        |  FROM sw
        |  UNION ALL
        |  SELECT t.event_type, t.i, $lp,
        |    (($lp - r.l + r.b) >> 1),
        |    ${sj(0)}, ${sj(1)}, ${sj(2)}, ${sj(3)}, ${sj(4)}, ${sj(5)},
        |    ${sj(6)}
        |  FROM rec r JOIN tr t ON t.event_type = r.event_type
        |    AND t.i = r.i + 1),
        |fit AS (SELECT event_type, l, b, s0, s1, s2, s3, s4, s5, s6,
        |    (SELECT MAX(si) FROM dense) AS si_f FROM (
        |  SELECT r.*, ROW_NUMBER() OVER (PARTITION BY r.event_type
        |      ORDER BY r.i DESC) AS rn
        |  FROM rec r) WHERE rn = 1),
        |ev AS (SELECT d.event_type, d.ym,
        |    abs(d.ym - (f.l + (d.idx - f.si_f) * f.b + ($fsel))) AS errw,
        |    abs(d.ym - n7.ym) AS err7
        |  FROM dense d
        |  JOIN dense n7 ON n7.event_type = d.event_type AND n7.idx = d.idx - 7
        |  JOIN fit f ON f.event_type = d.event_type
        |  WHERE d.idx > d.si)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST((SUM(errw) * 1000000) // SUM(ym) AS BIGINT) AS wape_hw_ppm,
        |  CAST((SUM(err7) * 1000000) // SUM(ym) AS BIGINT) AS wape_naive_ppm,
        |  SUM(errw) < SUM(err7) AS hw_wins
        |FROM ev GROUP BY event_type
        |HAVING SUM(ym) > 0 ORDER BY event_type""".stripMargin
    },

    // Croston intermittent-demand backtest: recursive (z, p) SES over
    // demand days only; zero-day test mass added arithmetically.
    "croston_backtest" ->
      """WITH RECURSIVE p AS (SELECT
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
        |      AS item,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |daily AS (SELECT item, day, CAST(COUNT(*) AS BIGINT) * 1000 AS ym
        |  FROM p GROUP BY 1, 2),
        |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |d AS (SELECT item, CAST(datediff('day', d0, day) AS BIGINT) AS idx,
        |    CAST(datediff('day', d0, d1) AS BIGINT) - 14 AS si, ym
        |  FROM daily, bo),
        |tr AS (SELECT item, idx, ym, si,
        |    ROW_NUMBER() OVER (PARTITION BY item ORDER BY idx) AS i
        |  FROM d WHERE idx <= si),
        |ft AS (SELECT item, MAX(si) AS si, CAST(COUNT(*) AS BIGINT)
        |      AS n_demand, CAST(SUM(ym) AS BIGINT) AS train_m
        |  FROM tr GROUP BY 1),
        |rec AS (
        |  SELECT item, i, ym AS z, (idx + 1) * 1000 AS pp, idx AS last
        |  FROM tr WHERE i = 1
        |  UNION ALL
        |  SELECT t.item, t.i, ((t.ym + r.z) >> 1),
        |    (((t.idx - r.last) * 1000 + r.pp) >> 1), t.idx
        |  FROM rec r JOIN tr t ON t.item = r.item AND t.i = r.i + 1),
        |fin AS (SELECT item, z, pp FROM (
        |  SELECT r.*, ROW_NUMBER() OVER (PARTITION BY item ORDER BY i DESC)
        |      AS rn FROM rec r) WHERE rn = 1),
        |rates AS (SELECT ft.item, ft.n_demand,
        |    CAST((f.z * 1000) // f.pp AS BIGINT) AS r,
        |    CAST(ft.train_m // (ft.si + 1) AS BIGINT) AS m
        |  FROM ft JOIN fin f ON f.item = ft.item),
        |te AS (SELECT d.item, d.ym, ra.r, ra.m, ra.n_demand
        |  FROM d JOIN rates ra ON ra.item = d.item WHERE d.idx > d.si),
        |ag AS (SELECT item, MAX(n_demand) AS n_demand, MAX(r) AS r,
        |    MAX(m) AS m, CAST(COUNT(*) AS BIGINT) AS nz,
        |    CAST(SUM(ym) AS BIGINT) AS actual_m,
        |    CAST(SUM(abs(ym - r)) AS BIGINT) AS ecnz,
        |    CAST(SUM(abs(ym - m)) AS BIGINT) AS emnz
        |  FROM te GROUP BY item)
        |SELECT item, n_demand, r AS rate_croston_mpd, m AS rate_mean_mpd,
        |  CAST(((ecnz + (14 - nz) * r) * 1000000) // actual_m AS BIGINT)
        |    AS wape_croston_ppm,
        |  CAST(((emnz + (14 - nz) * m) * 1000000) // actual_m AS BIGINT)
        |    AS wape_mean_ppm,
        |  (ecnz + (14 - nz) * r) < (emnz + (14 - nz) * m) AS croston_wins
        |FROM ag WHERE actual_m > 0 ORDER BY item""".stripMargin,

    // Pinball loss at q ∈ {.5, .9}: nearest-rank train residual
    // quantiles, integer loss×10, coverage ppm integer div.
    "pinball_loss" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |ty AS (SELECT DISTINCT event_type FROM daily),
        |ix AS (SELECT unnest(generate_series(0,
        |      CAST(datediff('day', d0, d1) AS BIGINT))) AS idx,
        |    CAST(datediff('day', d0, d1) AS BIGINT) - 14 AS si, d0
        |  FROM bo),
        |spine AS (SELECT ty.event_type, CAST(ix.idx AS BIGINT) AS idx, ix.si,
        |    ix.d0 + CAST(ix.idx AS INT) AS day
        |  FROM ty, ix),
        |dense AS (SELECT s.event_type, s.idx, s.si, COALESCE(d.c, 0) AS y
        |  FROM spine s LEFT JOIN daily d
        |    ON d.event_type = s.event_type AND d.day = s.day),
        |res AS (SELECT d.event_type, d.idx, d.si, d.y, n7.y AS y7,
        |    d.y - n7.y AS r
        |  FROM dense d
        |  JOIN dense n7 ON n7.event_type = d.event_type AND n7.idx = d.idx - 7),
        |tr AS (SELECT event_type, r,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, idx) AS rn
        |  FROM res WHERE idx <= si),
        |nt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train
        |  FROM tr GROUP BY 1),
        |q AS (SELECT event_type, CAST(q10 AS BIGINT) AS q10, n_train,
        |    (CAST(q10 AS BIGINT) * n_train + 9) // 10 AS k
        |  FROM nt, (SELECT unnest([5, 9]) AS q10)),
        |qh AS (SELECT q.event_type, q.q10, q.n_train, t.r AS rhat
        |  FROM q JOIN tr t ON t.event_type = q.event_type AND t.rn = q.k),
        |te AS (SELECT r.event_type, qh.q10, qh.n_train,
        |    r.y - (r.y7 + qh.rhat) AS diff
        |  FROM res r JOIN qh ON qh.event_type = r.event_type
        |  WHERE r.idx > r.si)
        |SELECT event_type, CAST(q10 AS DOUBLE) / 10.0 AS q,
        |  n_train, CAST(COUNT(*) AS BIGINT) AS n_test,
        |  floor(CAST(SUM(CASE WHEN diff >= 0 THEN q10 * diff
        |      ELSE (10 - q10) * (-diff) END) AS DOUBLE)
        |    / 10.0 / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS mean_pinball,
        |  CAST((SUM(CASE WHEN diff <= 0 THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS coverage_ppm
        |FROM te GROUP BY event_type, q10, n_train
        |ORDER BY event_type, q""".stripMargin,

    // Early-spend → LTV Pearson r: exact micro-cent per-user split
    // sums, HUGEINT moments, one fixed double chain, 4 dp.
    "ltv_early_signal" ->
      """WITH e AS (SELECT user_id,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq FROM events),
        |fd AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY 1),
        |per AS (SELECT e.user_id,
        |    SUM(CASE WHEN datediff('day', fd.first_day, e.day) < 7
        |      THEN vq ELSE 0 END) AS x,
        |    SUM(CASE WHEN datediff('day', fd.first_day, e.day) >= 7
        |      THEN vq ELSE 0 END) AS y
        |  FROM e JOIN fd USING (user_id) GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        |  FROM per)
        |SELECT n AS n_users,
        |  CAST((sx * 1000000) // (sx + sy) AS BIGINT) AS early_share_ppm,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
        |    * 1e4 + 0.5) / 1e4 AS r
        |FROM m""".stripMargin,

    // Median order-statistic CI per type: binomial-normal ranks (one
    // fixed double chain on exact n), rank→value through the bounded
    // cents-grid cumulative.
    "median_ci" ->
      """WITH g AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |    CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, c, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY c)
        |      AS BIGINT) AS r_hi
        |  FROM g),
        |cum2 AS (SELECT *, r_hi - cnt + 1 AS r_lo FROM cum),
        |nt AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
        |  FROM g GROUP BY 1),
        |rk AS (SELECT event_type, n, (n + 1) // 2 AS k_med,
        |    GREATEST(CAST(floor((CAST(n AS DOUBLE)
        |      - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT), 1)
        |      AS k_lo,
        |    LEAST(CAST(ceil((CAST(n AS DOUBLE)
        |      + 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0 + 1.0) AS BIGINT),
        |      n) AS k_hi
        |  FROM nt),
        |pr AS (SELECT event_type, n, 'med' AS which, k_med AS k FROM rk
        |  UNION ALL SELECT event_type, n, 'lo', k_lo FROM rk
        |  UNION ALL SELECT event_type, n, 'hi', k_hi FROM rk)
        |SELECT p.event_type, MAX(p.n) AS n,
        |  MAX(CASE WHEN which = 'med' THEN c END) AS median_cents,
        |  MAX(CASE WHEN which = 'lo' THEN c END) AS ci_lo_cents,
        |  MAX(CASE WHEN which = 'hi' THEN c END) AS ci_hi_cents
        |FROM pr p JOIN cum2 m ON m.event_type = p.event_type
        |  AND p.k BETWEEN m.r_lo AND m.r_hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Hodges–Lehmann pseudo-median: Walsh pair sums on the exact cent
    // grid over the bounded daily frame, lower nearest-rank median.
    "hodges_lehmann" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS i
        |  FROM daily),
        |w AS (SELECT a.event_type, a.v + b.v AS ps, a.i AS ia, b.i AS ib
        |  FROM ix a JOIN ix b ON a.event_type = b.event_type AND a.i <= b.i),
        |rk AS (SELECT event_type, ps,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ps, ia, ib)
        |      AS rn
        |  FROM w),
        |ct AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(MAX(ib) AS BIGINT) AS n_days FROM w GROUP BY 1)
        |SELECT r.event_type, ct.n_days, ct.m AS n_pairs,
        |  CAST(ps // 2 AS BIGINT) AS hl_cents,
        |  (abs(ps) % 2 = 1) AS half_cent
        |FROM rk r JOIN ct ON ct.event_type = r.event_type
        |  AND r.rn = (ct.m + 1) // 2
        |ORDER BY r.event_type""".stripMargin,

    // Weekday η² per type: micro-quantized grand/weekday means,
    // HUGEINT squared deviations, one double division.
    "seasonal_strength" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT event_type, v,
        |    CAST(datediff('day', DATE '1970-01-01', day) % 7 AS BIGINT) AS w
        |  FROM daily),
        |gm AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST((CAST(SUM(v) AS HUGEINT) * 1000000) // COUNT(*) AS BIGINT)
        |      AS gmq
        |  FROM dw GROUP BY 1),
        |wm AS (SELECT event_type, w,
        |    CAST((CAST(SUM(v) AS HUGEINT) * 1000000) // COUNT(*) AS BIGINT)
        |      AS wmq
        |  FROM dw GROUP BY 1, 2),
        |r AS (SELECT dw.event_type, gm.n,
        |    CAST(dw.v AS HUGEINT) * 1000000 - gmq AS dt,
        |    CAST(dw.v AS HUGEINT) * 1000000 - wmq AS dr
        |  FROM dw JOIN gm USING (event_type)
        |  JOIN wm ON wm.event_type = dw.event_type AND wm.w = dw.w)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
        |  floor((1.0 - CAST(SUM(dr * dr) AS DOUBLE)
        |    / NULLIF(CAST(SUM(dt * dt) AS DOUBLE), 0.0)) * 1e6 + 0.5) / 1e6
        |    AS eta2_weekday
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,

    // DAU/MAU stickiness: the rolling_reach sliding-distinct explode
    // at the 28-day window, exact ppm ratio.
    "dau_stickiness" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM act),
        |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        |        FROM act GROUP BY 1),
        |ct AS (SELECT user_id, day + CAST(off AS INT) AS day
        |       FROM act, (SELECT unnest(generate_series(0, 27)) AS off)),
        |mau AS (SELECT c.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS mau
        |        FROM ct c JOIN days d ON d.day = c.day GROUP BY 1)
        |SELECT dau.day, dau.dau, mau.mau,
        |  CAST((dau.dau * 1000000) // mau.mau AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN mau ON mau.day = dau.day ORDER BY dau.day""".stripMargin,

    // Daily-revenue VaR/CVaR per type: lower nearest-rank on the
    // bounded daily frame, integer-division tail mean.
    "revenue_var" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT event_type, v,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, day) AS rn
        |  FROM daily),
        |ct AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    GREATEST((COUNT(*) * 5) // 100, 1) AS k FROM daily GROUP BY 1),
        |vr AS (SELECT r.event_type, ct.n, ct.k, r.v AS var_cents
        |  FROM rk r JOIN ct ON ct.event_type = r.event_type AND r.rn = ct.k),
        |tl AS (SELECT r.event_type,
        |    SUM(CAST(r.v AS HUGEINT)) AS tail_sum,
        |    CAST(COUNT(*) AS BIGINT) AS n_tail
        |  FROM rk r JOIN vr ON vr.event_type = r.event_type
        |  WHERE r.rn <= vr.k GROUP BY 1)
        |SELECT vr.event_type, vr.n AS n_days, vr.var_cents,
        |  CAST(tl.tail_sum // tl.n_tail AS BIGINT) AS cvar_cents
        |FROM vr JOIN tl ON tl.event_type = vr.event_type
        |ORDER BY vr.event_type""".stripMargin,

    // Revenue momentum streaks: the gaps-and-islands pattern (island
    // = rn − rn-within-direction); flat days break both streak kinds.
    "streak_stats" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, day, v,
        |    lag(v) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM daily),
        |f AS (SELECT event_type, day,
        |    CASE WHEN v > prev THEN 1 WHEN v < prev THEN -1 ELSE 0 END AS dir,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM l WHERE prev IS NOT NULL),
        |g AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, dir
        |    ORDER BY day) AS rnd FROM f),
        |runs AS (SELECT event_type, dir, rn - rnd AS island,
        |    CAST(COUNT(*) AS BIGINT) AS len
        |  FROM g WHERE dir <> 0 GROUP BY 1, 2, 3)
        |SELECT event_type,
        |  CAST(MAX(CASE WHEN dir = 1 THEN len ELSE 0 END) AS BIGINT)
        |    AS longest_up,
        |  CAST(MAX(CASE WHEN dir = -1 THEN len ELSE 0 END) AS BIGINT)
        |    AS longest_down,
        |  CAST(COUNT(*) AS BIGINT) AS n_runs
        |FROM runs GROUP BY 1 ORDER BY event_type""".stripMargin,

    // Item-graph connectivity profile: the shared edge CTE + the
    // recursive min-label closure, two bounded folds.
    // Hub ablation: two min-label closures (the item_graph_components
    // recursive-UNION pattern twice), ROW_NUMBER hub pick, exact ppm.
    "hub_ablation" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM tr WHERE src IS NOT NULL AND src <> dst),
        |nodes AS (SELECT DISTINCT id FROM
        |          (SELECT a AS id FROM e UNION ALL SELECT b FROM e)),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |        (SELECT a AS u FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |hubs AS (SELECT u FROM (SELECT u,
        |    ROW_NUMBER() OVER (ORDER BY deg DESC, u) AS rn FROM deg)
        |  WHERE rn <= 3),
        |sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |r AS (SELECT id AS node, id AS lbl FROM nodes
        |  UNION SELECT sym.a AS node, r.lbl FROM sym JOIN r ON r.node = sym.b),
        |comp AS (SELECT node, MIN(lbl) AS component FROM r GROUP BY 1),
        |gb AS (SELECT CAST(MAX(sz) AS BIGINT) AS giant_before FROM
        |       (SELECT component, COUNT(*) AS sz FROM comp GROUP BY 1)),
        |e2 AS (SELECT a, b FROM e WHERE a NOT IN (SELECT u FROM hubs)
        |       AND b NOT IN (SELECT u FROM hubs)),
        |nodes2 AS (SELECT id FROM nodes
        |           WHERE id NOT IN (SELECT u FROM hubs)),
        |sym2 AS (SELECT a, b FROM e2 UNION ALL SELECT b AS a, a AS b FROM e2),
        |r2 AS (SELECT id AS node, id AS lbl FROM nodes2
        |  UNION SELECT sym2.a AS node, r2.lbl
        |        FROM sym2 JOIN r2 ON r2.node = sym2.b),
        |comp2 AS (SELECT node, MIN(lbl) AS component FROM r2 GROUP BY 1),
        |ga AS (SELECT CAST(MAX(sz) AS BIGINT) AS giant_after FROM
        |       (SELECT component, COUNT(*) AS sz FROM comp2 GROUP BY 1))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hubs) AS n_hubs_removed,
        |  gb.giant_before, ga.giant_after,
        |  CAST((ga.giant_after * 1000000) // gb.giant_before AS BIGINT)
        |    AS retained_ppm
        |FROM gb, ga""".stripMargin,

    "item_graph_components" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
        |  FROM events),
        |tr AS (
        |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
        |         item AS dst
        |  FROM base),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM tr WHERE src IS NOT NULL AND src <> dst),
        |nodes AS (SELECT DISTINCT id FROM
        |          (SELECT a AS id FROM e UNION ALL SELECT b FROM e)),
        |sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |r AS (SELECT id AS node, id AS lbl FROM nodes
        |  UNION SELECT sym.a AS node, r.lbl FROM sym JOIN r ON r.node = sym.b),
        |comp AS (SELECT node, MIN(lbl) AS component FROM r GROUP BY 1),
        |sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
        |          FROM comp GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sizes) AS n_components,
        |  (SELECT CAST(MAX(sz) AS BIGINT) FROM sizes) AS giant_size,
        |  CAST(((SELECT MAX(sz) FROM sizes) * 1000000)
        |    // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS giant_share_ppm""".stripMargin,

    // Sign test: day-paired purchase/view cent-grid differences,
    // ties dropped and counted, one double division.
    "sign_test" ->
      """WITH daily AS (SELECT
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS ra,
        |    CAST(SUM(CASE WHEN event_type = 'view'
        |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS rb
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN ra > rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(SUM(CASE WHEN ra < rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg,
        |    CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ties
        |  FROM daily),
        |f AS (SELECT n_pos, n_neg, n_ties,
        |    floor(CAST(n_pos - n_neg AS DOUBLE)
        |      / sqrt(CAST(n_pos + n_neg AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS z
        |  FROM a WHERE n_pos + n_neg > 0)
        |SELECT n_pos, n_neg, n_ties, z,
        |  CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > 1.959964 END
        |    AS significant
        |FROM f""".stripMargin,

    // Mood's median test: grand median off the cumulative value grid,
    // 2xk above/not-above table, chi2 df = k-1, all-equal type refuses.
    "mood_median" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 3 AS arm
        |  FROM events),
        |g AS (SELECT event_type, vc, arm, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |tv AS (SELECT event_type, vc, CAST(SUM(c) AS BIGINT) AS tc
        |  FROM g GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(SUM(tc) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(tc) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM tv),
        |med AS (SELECT event_type, CAST(MIN(vc) AS BIGINT) AS med,
        |    CAST(MAX(n) AS BIGINT) AS n
        |  FROM w WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |pa AS (SELECT g.event_type, g.arm,
        |    CAST(SUM(g.c) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN g.vc > med.med THEN g.c ELSE 0 END)
        |      AS BIGINT) AS aa,
        |    CAST(MAX(med.med) AS BIGINT) AS med,
        |    CAST(MAX(med.n) AS BIGINT) AS n
        |  FROM g JOIN med ON g.event_type = med.event_type
        |  GROUP BY 1, 2),
        |pa2 AS (SELECT *,
        |    CAST(SUM(aa) OVER (PARTITION BY event_type) AS BIGINT) AS atot
        |  FROM pa),
        |f AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MAX(med) AS BIGINT) AS median_cents,
        |    CAST(COUNT(*) AS BIGINT) AS k_arms,
        |    CAST(MAX(atot) AS BIGINT) AS atot,
        |    SUM(
        |      (CAST(aa AS DOUBLE)
        |        - CAST(atot AS DOUBLE) * na / CAST(n AS DOUBLE))
        |      * (CAST(aa AS DOUBLE)
        |        - CAST(atot AS DOUBLE) * na / CAST(n AS DOUBLE))
        |      / NULLIF(CAST(atot AS DOUBLE) * na / CAST(n AS DOUBLE), 0.0)
        |      + (CAST(na - aa AS DOUBLE)
        |        - CAST(n - atot AS DOUBLE) * na / CAST(n AS DOUBLE))
        |      * (CAST(na - aa AS DOUBLE)
        |        - CAST(n - atot AS DOUBLE) * na / CAST(n AS DOUBLE))
        |      / NULLIF(CAST(n - atot AS DOUBLE) * na / CAST(n AS DOUBLE),
        |          0.0)) AS chi2_raw
        |  FROM pa2 GROUP BY 1),
        |r AS (SELECT event_type, n, median_cents, k_arms,
        |    CASE WHEN atot = 0 OR atot = n THEN NULL
        |      ELSE floor(chi2_raw * 1e6 + 0.5) / 1e6 END AS chi2
        |  FROM f)
        |SELECT event_type, n, median_cents, k_arms, chi2,
        |  CASE WHEN chi2 IS NULL THEN NULL
        |    WHEN k_arms = 2 THEN chi2 > 3.841459
        |    WHEN k_arms = 3 THEN chi2 > 5.991465
        |    ELSE NULL END AS significant
        |FROM r ORDER BY event_type""".stripMargin,

    // Cox-Stuart: half-pairing by position on the daily micro-grid
    // frame, odd middle drops, sign fold, trend verdict.
    "cox_stuart" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS qrev
        |  FROM events GROUP BY 1, 2),
        |rn AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn
        |  FROM daily),
        |h AS (SELECT event_type, qrev,
        |    CASE WHEN rn <= nn // 2 THEN 1
        |      WHEN rn > (nn + 1) // 2 THEN 2 END AS half,
        |    CASE WHEN rn <= nn // 2 THEN rn
        |      ELSE rn - (nn + 1) // 2 END AS i
        |  FROM rn
        |  WHERE rn <= nn // 2 OR rn > (nn + 1) // 2),
        |p AS (SELECT event_type, i,
        |    MAX(CASE WHEN half = 1 THEN qrev END) AS x1,
        |    MAX(CASE WHEN half = 2 THEN qrev END) AS x2
        |  FROM h GROUP BY 1, 2),
        |s AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN x2 > x1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS s_plus,
        |    CAST(SUM(CASE WHEN x2 < x1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS s_minus,
        |    CAST(SUM(CASE WHEN x2 = x1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ties
        |  FROM p WHERE x1 IS NOT NULL AND x2 IS NOT NULL
        |  GROUP BY 1),
        |f AS (SELECT event_type, s_plus, s_minus, n_ties,
        |    floor(CAST(s_plus - s_minus AS DOUBLE)
        |      / sqrt(CAST(s_plus + s_minus AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |      AS z
        |  FROM s WHERE s_plus + s_minus > 0)
        |SELECT event_type, s_plus, s_minus, n_ties, z,
        |  CASE WHEN z > 1.959964 THEN 'increasing'
        |    WHEN z < -1.959964 THEN 'decreasing'
        |    ELSE 'none' END AS trend
        |FROM f ORDER BY event_type""".stripMargin,

    // Ljung-Box: acf_daily's dense-grid integer deviations, unrounded
    // r_k, Q = n(n+2) sum r_k^2/(n-k), df=7 literal; partial-lag
    // series refuse the verdict.
    "ljung_box" ->
      """WITH ev AS (SELECT event_type,
        |        CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day FROM events),
        |daily AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |grid AS (SELECT t.event_type, CAST(g.gs AS DATE) AS day
        |         FROM (SELECT DISTINCT event_type FROM daily) t,
        |              (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gs
        |               FROM b) g),
        |dense AS (SELECT grid.event_type, grid.day, COALESCE(daily.x, 0) AS x
        |          FROM grid LEFT JOIN daily
        |            ON grid.event_type = daily.event_type AND grid.day = daily.day),
        |dev AS (SELECT event_type, day,
        |          CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * x
        |            - CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS d
        |        FROM dense),
        |num AS (SELECT a.event_type, l.k AS lag, CAST(SUM(a.d * p.d) AS BIGINT) AS num
        |        FROM dev a
        |        JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) l(k) ON TRUE
        |        JOIN dev p ON p.event_type = a.event_type AND p.day = a.day + l.k
        |        GROUP BY 1, 2),
        |den AS (SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den,
        |          CAST(COUNT(*) AS BIGINT) AS n_days
        |        FROM dev GROUP BY 1),
        |q AS (SELECT n.event_type, d.n_days,
        |        CAST(COUNT(*) AS BIGINT) AS lags_used,
        |        SUM((CAST(n.num AS DOUBLE) / NULLIF(CAST(d.den AS DOUBLE), 0.0))
        |          * (CAST(n.num AS DOUBLE) / NULLIF(CAST(d.den AS DOUBLE), 0.0))
        |          / CAST(d.n_days - n.lag AS DOUBLE)) AS qterm
        |      FROM num n JOIN den d USING (event_type)
        |      GROUP BY 1, 2),
        |f AS (SELECT event_type, n_days, lags_used,
        |        floor(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE)
        |          * qterm * 1e6 + 0.5) / 1e6 AS q_stat
        |      FROM q)
        |SELECT event_type, n_days, lags_used, q_stat,
        |  CASE WHEN q_stat IS NULL OR lags_used <> 7 THEN NULL
        |    ELSE q_stat > 14.067140 END AS significant
        |FROM f ORDER BY event_type""".stripMargin,

    // TOST equivalence: the welch moment machinery, margin = 10% of
    // |control mean|, both one-sided z's above 1.644854.
    "tost_equivalence" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm
        |  FROM events),
        |pa AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(vq AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(vq AS DECIMAL(38,0)) * vq) AS ss
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type,
        |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN arm = 0 THEN s END) AS s0,
        |    MAX(CASE WHEN arm = 1 THEN s END) AS s1,
        |    MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
        |    MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        |  FROM pa GROUP BY 1),
        |c AS (SELECT event_type, n0, n1,
        |    CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    (CAST(ss0 AS DOUBLE)
        |     - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |    / CAST(n0 - 1 AS DOUBLE) AS v0,
        |    (CAST(ss1 AS DOUBLE)
        |     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    / CAST(n1 - 1 AS DOUBLE) AS v1
        |  FROM w WHERE n0 > 1 AND n1 > 1),
        |c2 AS (SELECT *,
        |    sqrt(v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE)) AS se,
        |    abs(m0) * 0.1 AS delta
        |  FROM c),
        |r AS (SELECT event_type, n0, n1,
        |    floor((m1 - m0) / 1e6 * 1e6 + 0.5) / 1e6 AS mean_diff,
        |    floor(delta / 1e6 * 1e6 + 0.5) / 1e6 AS margin,
        |    floor(((m1 - m0) + delta) / NULLIF(se, 0.0) * 1e6 + 0.5) / 1e6
        |      AS z_lower,
        |    floor((delta - (m1 - m0)) / NULLIF(se, 0.0) * 1e6 + 0.5) / 1e6
        |      AS z_upper
        |  FROM c2)
        |SELECT event_type, n0, n1, mean_diff, margin, z_lower, z_upper,
        |  CASE WHEN z_lower IS NULL OR z_upper IS NULL THEN FALSE
        |    ELSE z_lower > 1.644854 AND z_upper > 1.644854 END
        |    AS equivalent
        |FROM r ORDER BY event_type""".stripMargin,

    // Tukey median polish: two unrolled sweeps on the 5x7 integer
    // micro grid, lower-median convention, identity-preserving
    // effect-median folds; every step MATERIALIZED (multi-referenced).
    "median_polish" ->
      """WITH g0 AS MATERIALIZED (SELECT event_type,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(make_timestamp(epoch_us(ts)) AS DATE)) % 7 AS BIGINT)
        |      AS weekday,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS v,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS res,
        |    CAST(0 AS BIGINT) AS re, CAST(0 AS BIGINT) AS ce,
        |    CAST(0 AS BIGINT) AS ov
        |  FROM events GROUP BY 1, 2),
        |rm1 AS MATERIALIZED (SELECT event_type,
        |    (list_sort(list(res)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS rm
        |  FROM g0 GROUP BY 1),
        |ga1 AS MATERIALIZED (SELECT g.event_type, g.weekday, g.v,
        |    g.res - rm.rm AS res, g.re + rm.rm AS re, g.ce, g.ov
        |  FROM g0 g JOIN rm1 rm USING (event_type)),
        |mc1 AS MATERIALIZED (SELECT
        |    (list_sort(list(cev)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS mc
        |  FROM (SELECT weekday, MAX(ce) AS cev FROM ga1 GROUP BY 1)),
        |gb1 AS MATERIALIZED (SELECT event_type, weekday, v, res,
        |    re, ce - mc AS ce, ov + mc AS ov
        |  FROM ga1, mc1),
        |cm1 AS MATERIALIZED (SELECT weekday,
        |    (list_sort(list(res)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS cm
        |  FROM gb1 GROUP BY 1),
        |gc1 AS MATERIALIZED (SELECT g.event_type, g.weekday, g.v,
        |    g.res - cm.cm AS res, g.re, g.ce + cm.cm AS ce, g.ov
        |  FROM gb1 g JOIN cm1 cm USING (weekday)),
        |mr1 AS MATERIALIZED (SELECT
        |    (list_sort(list(rev)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS mr
        |  FROM (SELECT event_type, MAX(re) AS rev FROM gc1 GROUP BY 1)),
        |gd1 AS MATERIALIZED (SELECT event_type, weekday, v, res,
        |    re - mr AS re, ce, ov + mr AS ov
        |  FROM gc1, mr1),
        |rm2 AS MATERIALIZED (SELECT event_type,
        |    (list_sort(list(res)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS rm
        |  FROM gd1 GROUP BY 1),
        |ga2 AS MATERIALIZED (SELECT g.event_type, g.weekday, g.v,
        |    g.res - rm.rm AS res, g.re + rm.rm AS re, g.ce, g.ov
        |  FROM gd1 g JOIN rm2 rm USING (event_type)),
        |mc2 AS MATERIALIZED (SELECT
        |    (list_sort(list(cev)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS mc
        |  FROM (SELECT weekday, MAX(ce) AS cev FROM ga2 GROUP BY 1)),
        |gb2 AS MATERIALIZED (SELECT event_type, weekday, v, res,
        |    re, ce - mc AS ce, ov + mc AS ov
        |  FROM ga2, mc2),
        |cm2 AS MATERIALIZED (SELECT weekday,
        |    (list_sort(list(res)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS cm
        |  FROM gb2 GROUP BY 1),
        |gc2 AS MATERIALIZED (SELECT g.event_type, g.weekday, g.v,
        |    g.res - cm.cm AS res, g.re, g.ce + cm.cm AS ce, g.ov
        |  FROM gb2 g JOIN cm2 cm USING (weekday)),
        |mr2 AS MATERIALIZED (SELECT
        |    (list_sort(list(rev)))[CAST((COUNT(*) + 1) // 2 AS INT)] AS mr
        |  FROM (SELECT event_type, MAX(re) AS rev FROM gc2 GROUP BY 1)),
        |gd2 AS MATERIALIZED (SELECT event_type, weekday, v, res,
        |    re - mr AS re, ce, ov + mr AS ov
        |  FROM gc2, mr2)
        |SELECT event_type, weekday, v AS value_micro, ov AS overall_micro,
        |  re AS type_effect_micro, ce AS weekday_effect_micro,
        |  res AS residual_micro
        |FROM gd2 ORDER BY event_type, weekday""".stripMargin,

    // Breusch-Pagan (Koenker LM) on the cent-grid weekday-mean model:
    // five exact HUGEINT moments, one double R^2 chain, chi2 df=1.
    "breusch_pagan" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |wd AS (SELECT *,
        |    datediff('day', DATE '1970-01-01', day) % 7 AS w
        |  FROM daily),
        |wm AS (SELECT event_type, w,
        |    CAST(SUM(v) // COUNT(*) AS BIGINT) AS f
        |  FROM wd GROUP BY 1, 2),
        |res AS (SELECT wd.event_type, wm.f, wd.v - wm.f AS e
        |  FROM wd JOIN wm ON wd.event_type = wm.event_type
        |    AND wd.w = wm.w),
        |mo AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    SUM(CAST(f AS HUGEINT)) AS sf,
        |    SUM(CAST(f AS HUGEINT) * f) AS sff,
        |    SUM(CAST(e AS HUGEINT) * e) AS sg,
        |    SUM(CAST(e AS HUGEINT) * e * e * e) AS sgg,
        |    SUM(CAST(f AS HUGEINT) * e * e) AS sfg
        |  FROM res GROUP BY 1),
        |r AS (SELECT event_type, n_days,
        |    floor(CAST(n_days AS DOUBLE) *
        |        (CAST(n_days AS DOUBLE) * CAST(sfg AS DOUBLE)
        |          - CAST(sf AS DOUBLE) * CAST(sg AS DOUBLE))
        |      * (CAST(n_days AS DOUBLE) * CAST(sfg AS DOUBLE)
        |          - CAST(sf AS DOUBLE) * CAST(sg AS DOUBLE))
        |      / NULLIF(
        |          (CAST(n_days AS DOUBLE) * CAST(sff AS DOUBLE)
        |            - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))
        |        * (CAST(n_days AS DOUBLE) * CAST(sgg AS DOUBLE)
        |            - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)), 0.0)
        |      * 1e6 + 0.5) / 1e6 AS lm_stat
        |  FROM mo WHERE n_days > 2)
        |SELECT event_type, n_days, lm_stat,
        |  CASE WHEN lm_stat IS NULL THEN NULL
        |    ELSE lm_stat > 3.841459 END AS heteroscedastic
        |FROM r ORDER BY event_type""".stripMargin,

    // Simpson's-paradox audit: every sign is an integer cross-product
    // comparison on the micro grid (HUGEINT here mirrors Spark's
    // decimal(38,0) exactly — both are lossless at these magnitudes);
    // only overall_diff is a rounded double.
    "simpson_reversal" ->
      """WITH e AS (SELECT event_type,
        |    CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS INT) AS dow,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |cell AS (SELECT event_type, dow, arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(vq AS HUGEINT)) AS HUGEINT) AS s
        |  FROM e GROUP BY 1, 2, 3),
        |st AS (SELECT event_type, dow,
        |    COALESCE(MAX(CASE WHEN arm = 0 THEN n END), 0) AS n0,
        |    COALESCE(MAX(CASE WHEN arm = 1 THEN n END), 0) AS n1,
        |    CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN s END), 0) AS HUGEINT) AS s0,
        |    CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN s END), 0) AS HUGEINT) AS s1
        |  FROM cell GROUP BY 1, 2),
        |sg AS (SELECT *, (n0 > 0 AND n1 > 0) AS cmp,
        |    CASE WHEN s1 * n0 > s0 * n1 THEN 1
        |         WHEN s1 * n0 < s0 * n1 THEN -1 ELSE 0 END AS sgn
        |  FROM st),
        |t AS (SELECT event_type,
        |    CAST(SUM(n0) AS HUGEINT) AS n0, CAST(SUM(n1) AS HUGEINT) AS n1,
        |    CAST(SUM(s0) AS HUGEINT) AS s0, CAST(SUM(s1) AS HUGEINT) AS s1,
        |    CAST(SUM(CASE WHEN cmp THEN 1 ELSE 0 END) AS BIGINT) AS n_strata,
        |    CAST(SUM(CASE WHEN cmp AND sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(SUM(CASE WHEN cmp AND sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg
        |  FROM sg GROUP BY 1),
        |o AS (SELECT *,
        |    CAST(CASE WHEN s1 * n0 > s0 * n1 THEN 1
        |              WHEN s1 * n0 < s0 * n1 THEN -1 ELSE 0 END AS INT)
        |      AS overall_sign
        |  FROM t WHERE n0 > 0 AND n1 > 0)
        |SELECT event_type, n_strata, n_pos, n_neg,
        |  floor((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 1e6 * 1e6 + 0.5)
        |    / 1e6 AS overall_diff,
        |  overall_sign,
        |  (n_strata > 0 AND
        |    ((overall_sign = 1 AND n_neg = n_strata) OR
        |     (overall_sign = -1 AND n_pos = n_strata))) AS strict_reversal,
        |  CASE WHEN n_strata = 0 OR overall_sign = 0 THEN NULL
        |    ELSE floor(CAST(CASE WHEN overall_sign = 1 THEN n_neg ELSE n_pos
        |                    END AS DOUBLE)
        |           / CAST(n_strata AS DOUBLE) * 1e4 + 0.5) / 1e4
        |  END AS reversed_share
        |FROM o ORDER BY event_type""".stripMargin,

    // Delete-one-bucket jackknife: each replicate is quantized to a
    // micro-grid BIGINT before the moment fold, so st/stt are exact
    // integers in both engines; the SE chain is one double sequence.
    "jackknife_ratio_se" ->
      """WITH e AS (SELECT event_type, user_id,
        |    CAST(('0x' || substring(md5('jk:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 32 AS b,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |per AS (SELECT event_type, b,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u,
        |    CAST(SUM(CAST(vq AS HUGEINT)) AS HUGEINT) AS s
        |  FROM e GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(SUM(u) AS BIGINT) AS uu,
        |    CAST(SUM(s) AS HUGEINT) AS stot, CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM per GROUP BY 1),
        |reps AS (SELECT p.event_type,
        |    CAST(floor(CAST(t.stot - p.s AS DOUBLE)
        |      / NULLIF(CAST(t.uu - p.u AS DOUBLE), 0.0) + 0.5) AS BIGINT) AS t
        |  FROM per p JOIN tot t USING (event_type)),
        |fold AS (SELECT event_type,
        |    CAST(SUM(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
        |    CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt
        |  FROM reps GROUP BY 1),
        |r AS (SELECT t.event_type, t.uu AS n_users, t.nb AS n_buckets,
        |    floor(CAST(t.stot AS DOUBLE) / CAST(t.uu AS DOUBLE) / 1e6
        |      * 1e6 + 0.5) / 1e6 AS theta,
        |    CASE WHEN t.nb < 2 THEN NULL
        |      ELSE floor(sqrt(CAST((t.nb - 1) * (t.nb * f.stt - f.st * f.st)
        |             AS DOUBLE)) / CAST(t.nb AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
        |    END AS jk_se
        |  FROM tot t JOIN fold f USING (event_type))
        |SELECT event_type, n_users, n_buckets, theta, jk_se,
        |  floor((theta - 1.96 * jk_se) * 1e6 + 0.5) / 1e6 AS ci_lo,
        |  floor((theta + 1.96 * jk_se) * 1e6 + 0.5) / 1e6 AS ci_hi
        |FROM r ORDER BY event_type""".stripMargin,

    // CCF lead-lag: the acf_daily dense-grid machinery crossed over
    // ordered type pairs; argmax reads quantized r with the
    // (|r|, |lag| asc, lag asc) tie order — integer-exact both sides.
    "ccf_leadlag" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |grid AS (SELECT t.event_type, CAST(g.gs AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily) t,
        |       (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gs
        |        FROM b) g),
        |dense AS (SELECT grid.event_type, grid.day, COALESCE(daily.x, 0) AS x
        |  FROM grid LEFT JOIN daily
        |    ON grid.event_type = daily.event_type AND grid.day = daily.day),
        |m AS (SELECT a.event_type AS type_a, p.event_type AS type_b,
        |    l.k AS lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(a.x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(p.x AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(a.x AS HUGEINT) * p.x) AS HUGEINT) AS sxy,
        |    CAST(SUM(CAST(a.x AS HUGEINT) * a.x) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(p.x AS HUGEINT) * p.x) AS HUGEINT) AS syy
        |  FROM dense a
        |  JOIN (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) l(k) ON TRUE
        |  JOIN dense p ON p.day = a.day + l.k
        |    AND a.event_type < p.event_type
        |  GROUP BY 1, 2, 3),
        |r0 AS (SELECT *, CAST(n * sxy - sx * sy AS DOUBLE)
        |    / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |                  * CAST(n * syy - sy * sy AS DOUBLE)), 0.0) AS r
        |  FROM m),
        |rq AS (SELECT *, CAST(floor(r * 1e6 + 0.5) AS BIGINT) AS rqv FROM r0),
        |rb AS (SELECT *, row_number() OVER (PARTITION BY type_a, type_b
        |    ORDER BY COALESCE(abs(rqv), -1) DESC, abs(lag) ASC, lag ASC)
        |    AS rn FROM rq)
        |SELECT type_a, type_b, CAST(lag AS INT) AS lag, n AS n_overlap,
        |  floor(r * 1e6 + 0.5) / 1e6 AS ccf,
        |  (rn = 1 AND rqv IS NOT NULL) AS is_best
        |FROM rb ORDER BY type_a, type_b, lag""".stripMargin,

    // A/A null battery: the welch z chain per disjoint md5 cell pair,
    // |z| quantized to the 1e-6 grid BEFORE the flag compare and the
    // max — the boundary is integer-exact in both engines.
    "aa_calibration" ->
      """WITH e AS (SELECT event_type,
        |    CAST(('0x' || substring(md5('aa:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 32 AS cell,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |pc AS (SELECT event_type, cell, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(vq AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(vq AS DECIMAL(38,0)) * vq) AS ss
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, cell // 2 AS pair,
        |    MAX(CASE WHEN cell % 2 = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN cell % 2 = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN cell % 2 = 0 THEN s END) AS s0,
        |    MAX(CASE WHEN cell % 2 = 1 THEN s END) AS s1,
        |    MAX(CASE WHEN cell % 2 = 0 THEN ss END) AS ss0,
        |    MAX(CASE WHEN cell % 2 = 1 THEN ss END) AS ss1
        |  FROM pc GROUP BY 1, 2),
        |z AS (SELECT event_type,
        |    CAST(floor(ABS(
        |      (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      / NULLIF(sqrt(
        |         (CAST(ss0 AS DOUBLE)
        |          - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |         / CAST(n0 - 1 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |       + (CAST(ss1 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |         / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 0.0))
        |      * 1e6 + 0.5) AS BIGINT) AS zq
        |  FROM w WHERE n0 > 1 AND n1 > 1),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_tests,
        |    CAST(SUM(CASE WHEN zq > 1960000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_flagged,
        |    MAX(zq) AS mzq
        |  FROM z WHERE zq IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_tests, n_flagged,
        |  floor(CAST(n_flagged AS DOUBLE) / CAST(n_tests AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS flag_share,
        |  CAST(mzq AS DOUBLE) / 1e6 AS max_abs_z
        |FROM g ORDER BY event_type""".stripMargin,

    // Bot heuristics: all-integer µs-grid rationals (HUGEINT mirrors
    // decimal(38,0)); the only NULL path is the zero-total-gap
    // degenerate, which the flag's first disjunct absorbs.
    "bot_score" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |g0 AS (SELECT user_id,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS gap FROM e),
        |g AS (SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
        |    CAST(SUM(CAST(gap AS HUGEINT)) AS HUGEINT) AS sg,
        |    CAST(SUM(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sgg
        |  FROM g0 GROUP BY 1),
        |t AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
        |    CAST(MAX(c) AS BIGINT) AS top_c
        |  FROM (SELECT user_id, event_type, COUNT(*) AS c FROM e
        |        GROUP BY 1, 2) GROUP BY 1),
        |j AS (SELECT t.user_id, t.n_events, g.n_gaps,
        |    CASE WHEN g.sg = 0 THEN NULL
        |      ELSE CAST(((g.n_gaps * g.sgg - g.sg * g.sg) * 1000000)
        |             // (g.sg * g.sg) AS BIGINT) END AS cv2_ppm,
        |    CAST(t.top_c * 1000000 // t.n_events AS BIGINT)
        |      AS top_share_ppm,
        |    g.sg
        |  FROM t JOIN g USING (user_id) WHERE t.n_events >= 20)
        |SELECT user_id, n_events, n_gaps, cv2_ppm, top_share_ppm,
        |  (sg = 0 OR cv2_ppm < 100000
        |    OR (top_share_ppm = 1000000 AND n_events >= 50)) AS bot_flag
        |FROM j ORDER BY user_id""".stripMargin,

    // Calendar completeness per type: observed vs own-span days,
    // longest missing run off the ordered-day lag.
    "gap_report" ->
      """WITH d AS (SELECT DISTINCT event_type, ts::DATE AS day FROM events),
        |l AS (SELECT event_type, day,
        |    lag(day) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM d),
        |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS observed_days,
        |    CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
        |    CAST(COALESCE(MAX(day - prev - 1), 0) AS BIGINT) AS longest_gap
        |  FROM l GROUP BY 1)
        |SELECT event_type, span_days, observed_days,
        |  span_days - observed_days AS missing_days,
        |  CAST(observed_days * 1000000 // span_days AS BIGINT)
        |    AS completeness_ppm,
        |  longest_gap
        |FROM a ORDER BY event_type""".stripMargin,

    // Trigger dilution: ITT over the POPULATION vs the triggered
    // slice; the dilution ratio refuses (NULL) on a zero or
    // empty-arm triggered ATE.
    "trigger_dilution" ->
      """WITH e AS (SELECT event_type, user_id,
        |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 AS arm,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |pop AS (SELECT DISTINCT user_id, arm FROM e),
        |pw AS (SELECT MAX(CASE WHEN arm = 0 THEN np END) AS np0,
        |    MAX(CASE WHEN arm = 1 THEN np END) AS np1
        |  FROM (SELECT arm, CAST(COUNT(*) AS BIGINT) AS np FROM pop
        |        GROUP BY 1)),
        |tr AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
        |tw AS (SELECT MAX(CASE WHEN arm = 0 THEN nt END) AS nt0,
        |    MAX(CASE WHEN arm = 1 THEN nt END) AS nt1
        |  FROM (SELECT p.arm, CAST(COUNT(*) AS BIGINT) AS nt
        |        FROM pop p JOIN tr USING (user_id) GROUP BY 1)),
        |s AS (SELECT event_type,
        |    CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN sv END), 0) AS HUGEINT)
        |      AS s0,
        |    CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN sv END), 0) AS HUGEINT)
        |      AS s1
        |  FROM (SELECT event_type, arm, SUM(CAST(vq AS HUGEINT)) AS sv
        |        FROM e GROUP BY 1, 2) GROUP BY 1),
        |st AS (SELECT event_type,
        |    CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN sv END), 0) AS HUGEINT)
        |      AS st0,
        |    CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN sv END), 0) AS HUGEINT)
        |      AS st1
        |  FROM (SELECT e.event_type, e.arm, SUM(CAST(e.vq AS HUGEINT)) AS sv
        |        FROM e JOIN tr USING (user_id) GROUP BY 1, 2) GROUP BY 1),
        |j AS (SELECT s.event_type, s.s0, s.s1, st.st0, st.st1,
        |    pw.np0, pw.np1, tw.nt0, tw.nt1
        |  FROM s LEFT JOIN st USING (event_type), pw, tw
        |  WHERE pw.np0 > 0 AND pw.np1 > 0),
        |c AS (SELECT *,
        |    (CAST(s1 AS DOUBLE) / CAST(np1 AS DOUBLE)
        |     - CAST(s0 AS DOUBLE) / CAST(np0 AS DOUBLE)) / 1e6 AS ar,
        |    CASE WHEN nt0 IS NULL OR nt1 IS NULL OR nt0 = 0 OR nt1 = 0
        |           OR st0 IS NULL OR st1 IS NULL THEN NULL
        |      ELSE (CAST(st1 AS DOUBLE) / CAST(nt1 AS DOUBLE)
        |            - CAST(st0 AS DOUBLE) / CAST(nt0 AS DOUBLE)) / 1e6
        |    END AS at
        |  FROM j)
        |SELECT event_type, np0 + np1 AS n_users,
        |  COALESCE(nt0, 0) + COALESCE(nt1, 0) AS n_triggered,
        |  CAST((COALESCE(nt0, 0) + COALESCE(nt1, 0)) * 1000000
        |    // (np0 + np1) AS BIGINT) AS trigger_rate_ppm,
        |  floor(ar * 1e6 + 0.5) / 1e6 AS ate_all,
        |  floor(at * 1e6 + 0.5) / 1e6 AS ate_triggered,
        |  floor(ar / NULLIF(at, 0.0) * 1e6 + 0.5) / 1e6 AS dilution_ratio
        |FROM c ORDER BY event_type""".stripMargin,
  )
}
