package graft.oracles

/** DuckDB oracle SQL for the warehouse family — split out of SparkEntry
  * (round 9) purely for registry file size; keys and SQL are the
  * unchanged driver contract (SURVEY §5). */
private[graft] object WarehouseOracles {
  val sql: Map[String, String] = Map(

    // Median/MAD are rounded to 4 dp (floor form) BEFORE the flag
    // comparison; 1.4826 is cast to DOUBLE so both engines multiply
    // the same binary64 constant (a bare DuckDB literal is DECIMAL).
    "mad_outliers" ->
      """WITH med AS (SELECT event_type,
        |    floor(quantile_cont(value, 0.5) * 1e4 + 0.5) / 1e4 AS med
        |  FROM events GROUP BY 1),
        |d AS (SELECT e.event_id, e.event_type, e.value, m.med
        |      FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type,
        |    floor(quantile_cont(abs(value - med), 0.5) * 1e4 + 0.5) / 1e4 AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value,
        |  floor((d.value - d.med) / (CAST(1.4826 AS DOUBLE) * a.mad) * 1e4 + 0.5) / 1e4 AS robust_z
        |FROM d JOIN mad a USING (event_type)
        |WHERE a.mad > 0
        |  AND abs(d.value - d.med) > 3 * CAST(1.4826 AS DOUBLE) * a.mad
        |ORDER BY d.event_id""".stripMargin,

    "value_deciles" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |    ntile(10) OVER (PARTITION BY o_orderpriority
        |                    ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        |SELECT o_orderpriority, decile, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Clip bounds rounded to 4 dp first (cross-engine identical), mean
    // through an integer cent-quantized sum (order-independent).
    "winsorize" ->
      """WITH b AS (SELECT o_orderpriority,
        |    floor(quantile_cont(o_totalprice, 0.05) * 1e4 + 0.5) / 1e4 AS lo,
        |    floor(quantile_cont(o_totalprice, 0.95) * 1e4 + 0.5) / 1e4 AS hi
        |  FROM orders GROUP BY 1),
        |j AS (SELECT o.o_orderpriority, o.o_totalprice, b.lo, b.hi,
        |    least(greatest(o.o_totalprice, b.lo), b.hi) AS clipped
        |  FROM orders o JOIN b USING (o_orderpriority))
        |SELECT o_orderpriority, lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |  CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
        |  floor(CAST(SUM(CAST(floor(clipped * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) / 100 * 1e4 + 0.5) / 1e4 AS avg_clipped
        |FROM j GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "profile_columns" ->
      // Every branch casts n_null: a bare SUM(int) is HUGEINT in
      // DuckDB, and UNION type-unification would widen the whole
      // column past BIGINT (0 vs 0.0 breaks the hash compare).
      """SELECT 'o_orderkey' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders
        |UNION ALL SELECT 'o_custkey', COUNT(*),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT o_custkey) FROM orders
        |UNION ALL SELECT 'o_orderstatus', COUNT(*),
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT o_orderstatus) FROM orders
        |UNION ALL SELECT 'o_totalprice', COUNT(*),
        |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT o_totalprice) FROM orders
        |UNION ALL SELECT 'o_orderdate', COUNT(*),
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT o_orderdate) FROM orders
        |UNION ALL SELECT 'o_orderpriority', COUNT(*),
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT o_orderpriority) FROM orders
        |ORDER BY column_name""".stripMargin,

    "fk_coverage" ->
      """WITH k AS (SELECT DISTINCT c_custkey AS key FROM customer),
        |j AS (SELECT e.event_type,
        |        CASE WHEN k.key IS NULL THEN 0 ELSE 1 END AS matched
        |      FROM events e LEFT JOIN k ON e.user_id = k.key)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(matched) AS BIGINT) AS n_matched,
        |  CAST(COUNT(*) - SUM(matched) AS BIGINT) AS n_orphans,
        |  floor(CAST(SUM(matched) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS coverage
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The Spark side orders versions on the exact nanosecond long;
    // DuckDB's parquet view truncates TIMESTAMP_NS to µs, so this
    // oracle orders on (µs, event_id). The two agree wherever event
    // ids are time-monotone within a microsecond (true of the driver
    // data — verified by this hash at sf0.01 AND sf0.1); output is µs.
    "latest_per_key" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value
        |           FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, us, event_id, event_type, value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // qrev mirrors Report.earningsMicros (pure floor — the library's
    // one money-quantization contract, shared with the earnings family)
    "revenue_by_nation" ->
      """WITH li AS (SELECT l_orderkey,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT) AS qrev
        |  FROM lineitem),
        |o AS (SELECT o_orderkey, o_custkey FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |        AND o_orderdate < TIMESTAMP '1996-01-01')
        |SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  floor(CAST(SUM(qrev) AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue
        |FROM li JOIN o ON li.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin,

    // Both snapshots rank on the raw TIMESTAMP_NS (exact-ns order,
    // mirroring the Spark side's ts_ns struct max); the cutoff
    // comparison is safe at either grain because µs truncation floors
    // and can't lift an event across the boundary.
    "snapshot_diff" ->
      """WITH s2r AS (SELECT user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |s2 AS (SELECT user_id, event_type, value FROM s2r WHERE rn = 1),
        |s1r AS (SELECT user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        |s1 AS (SELECT user_id, event_type, value FROM s1r WHERE rn = 1)
        |SELECT s2.user_id,
        |  CASE WHEN s1.user_id IS NULL THEN 'insert' ELSE 'update' END AS op,
        |  s1.event_type AS old_type, s1.value AS old_value,
        |  s2.event_type AS new_type, s2.value AS new_value
        |FROM s2 LEFT JOIN s1 ON s2.user_id = s1.user_id
        |WHERE s1.user_id IS NULL
        |   OR s1.event_type <> s2.event_type OR s1.value <> s2.value
        |ORDER BY s2.user_id""".stripMargin,

    // Grouped Pearson per part type on HUGEINT moments (Spark:
    // decimal(38,0)); < 30-item types dropped, zero variance -> NULL.
    "discount_elasticity" ->
      """WITH li AS (SELECT l_partkey,
        |    CAST(floor(l_discount * 1e6) AS BIGINT) AS d,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem),
        |j AS (SELECT p.p_type, li.d, li.q
        |      FROM li JOIN part p ON li.l_partkey = p.p_partkey),
        |m AS (SELECT p_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(CAST(d AS HUGEINT)) AS sd, SUM(CAST(q AS HUGEINT)) AS sq,
        |    SUM(CAST(d AS HUGEINT) * d) AS sdd,
        |    SUM(CAST(q AS HUGEINT) * q) AS sqq,
        |    SUM(CAST(d AS HUGEINT) * q) AS sdq
        |  FROM j GROUP BY p_type HAVING COUNT(*) >= 30)
        |SELECT p_type, CAST(n AS BIGINT) AS n_items,
        |  floor(CAST(n * sdq - sd * sq AS DOUBLE)
        |    / (sqrt(CAST(n * sdd - sd * sd AS DOUBLE))
        |       * sqrt(CAST(n * sqq - sq * sq AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS r_discount_qty
        |FROM m ORDER BY p_type""".stripMargin,

    // Return rate per brand: broadcast dim join + one brand aggregate,
    // bp by integer division, returned revenue on the micro grid.
    "return_rate_by_brand" ->
      """WITH li AS (SELECT l_partkey,
        |    l_returnflag = 'R' AS ret,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6) AS BIGINT) AS qrev
        |  FROM lineitem)
        |SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        |  (CAST(SUM(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT) * 10000)
        |    // COUNT(*) AS return_bp,
        |  floor(CAST(SUM(CASE WHEN ret THEN qrev ELSE 0 END) AS DOUBLE)
        |    / 100 + 0.5) / 1e4 AS returned_revenue
        |FROM li JOIN part p ON li.l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    // Supplier-concentration HHI per nation: integer Σq²/(Σq)² on
    // HUGEINT (Spark decimal(38,0)), ppm by integer division.
    "supplier_hhi" ->
      """WITH ps AS (SELECT l_suppkey AS s_suppkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6)
        |      AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT n.n_name AS nation, ps.s_suppkey, ps.q
        |      FROM ps JOIN supplier s ON ps.s_suppkey = s.s_suppkey
        |      JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |w AS (SELECT *, CAST(SUM(q) OVER (PARTITION BY nation) AS BIGINT) AS tq,
        |        ROW_NUMBER() OVER (PARTITION BY nation
        |          ORDER BY q DESC, s_suppkey) AS rn
        |      FROM j)
        |SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |  CAST((SUM(CAST(q AS HUGEINT) * q) * 1000000)
        |    // (CAST(MAX(tq) AS HUGEINT) * MAX(tq)) AS BIGINT) AS hhi_ppm,
        |  floor(CAST(MAX(CASE WHEN rn = 1 THEN q END) AS DOUBLE)
        |    / CAST(MAX(tq) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS top_share
        |FROM w GROUP BY nation ORDER BY nation""".stripMargin,

    // Deletion-cost audit: one day aggregate, ppm by integer division.
    "deletion_audit" ->
      """SELECT ts::DATE AS day, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rows_to_delete,
        |  CAST(COUNT(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id END)
        |    AS BIGINT) AS users_to_delete,
        |  (CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // COUNT(*) AS delete_ppm
        |FROM events GROUP BY 1
        |HAVING SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) > 0
        |ORDER BY day""".stripMargin,

    // Same grain contract as latest_per_key: DuckDB ranks on (µs,
    // event_id) where Spark ranks exact-ns — they agree because ids
    // are time-monotone within a microsecond (hash-verified).
    // Q21 shape: EXISTS/NOT-EXISTS as conditional aggregation over
    // the (order, supplier) frame; ties break on suppkey.
    "blocking_suppliers" ->
      """WITH ord AS (SELECT o_orderkey,
        |    CAST(o_orderdate AS DATE) AS oday
        |  FROM orders WHERE o_orderstatus = 'F'),
        |per AS (SELECT l.l_orderkey, l.l_suppkey,
        |    MAX(CASE WHEN datediff('day', o.oday,
        |          CAST(l.l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END)
        |      AS late
        |  FROM lineitem l JOIN ord o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |fl AS (SELECT l_suppkey, late,
        |    COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |    SUM(late) OVER (PARTITION BY l_orderkey) AS n_late_supp
        |  FROM per)
        |SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
        |  CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM fl
        |WHERE late = 1 AND n_supp >= 2 AND n_late_supp = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,

    // FIFO lot matching: cumulative-unit interval overlap per part —
    // two windows + one equijoin, all-integer units.
    "fifo_match" ->
      """WITH li AS (SELECT l_partkey AS pk, l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS qty, l_shipdate, l_returnflag
        |  FROM lineitem),
        |sup AS (SELECT pk, l_orderkey AS sup_order,
        |    l_linenumber AS sup_line, l_shipdate AS sup_ship,
        |    SUM(qty) OVER w - qty AS s0, SUM(qty) OVER w AS s1
        |  FROM li
        |  WINDOW w AS (PARTITION BY pk
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber)),
        |ret AS (SELECT pk, l_orderkey AS ret_order,
        |    l_linenumber AS ret_line, l_shipdate AS ret_ship,
        |    SUM(qty) OVER w - qty AS r0, SUM(qty) OVER w AS r1
        |  FROM li WHERE l_returnflag = 'R'
        |  WINDOW w AS (PARTITION BY pk
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |SELECT s.pk AS l_partkey, r.ret_order, r.ret_line,
        |  s.sup_order, s.sup_line,
        |  CAST(least(s.s1, r.r1) - greatest(s.s0, r.r0) AS BIGINT)
        |    AS qty_matched,
        |  CAST(datediff('day', CAST(s.sup_ship AS DATE),
        |    CAST(r.ret_ship AS DATE)) AS BIGINT) AS lag_days
        |FROM sup s JOIN ret r
        |  ON s.pk = r.pk AND s.s0 < r.r1 AND r.r0 < s.s1
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    // Compaction plan: hour-ordered running-sum binning of the hourly
    // file manifest per (type, day) partition; pure integer.
    "compaction_plan" ->
      """WITH files AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(hour(make_timestamp(epoch_us(ts))) AS BIGINT) AS hr,
        |    CAST(COUNT(*) AS BIGINT) * 64 AS bytes
        |  FROM events GROUP BY 1, 2, 3),
        |binned AS (SELECT event_type, day, hr, bytes,
        |    CAST((SUM(bytes) OVER (PARTITION BY event_type, day ORDER BY hr)
        |     - bytes) // 4096 AS BIGINT) AS bin_id
        |  FROM files)
        |SELECT event_type, day, bin_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(bytes) AS BIGINT) AS bytes_in,
        |  CAST(MIN(hr) AS BIGINT) AS first_hour,
        |  CAST(MAX(hr) AS BIGINT) AS last_hour
        |FROM binned GROUP BY 1, 2, 3
        |ORDER BY event_type, day, bin_id""".stripMargin,

    // TPC-H Q15 shape: per-quarter supplier revenue on the 10^-2-cent
    // grid, window max keeps ties, share as exact ppm.
    "top_supplier_share" ->
      """WITH rev AS (SELECT
        |    CAST(year(CAST(l_shipdate AS DATE)) AS VARCHAR) || '-Q'
        |      || CAST(quarter(CAST(l_shipdate AS DATE)) AS VARCHAR)
        |      AS quarter,
        |    l_suppkey,
        |    SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |        * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |        AS HUGEINT)) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT quarter, l_suppkey, rev,
        |    MAX(rev) OVER (PARTITION BY quarter) AS max_rev,
        |    SUM(rev) OVER (PARTITION BY quarter) AS total_rev
        |  FROM rev)
        |SELECT w.quarter, CAST(w.l_suppkey AS BIGINT) AS s_suppkey,
        |  s.s_name,
        |  CAST(rev AS BIGINT) AS revenue_c100,
        |  CAST((rev * 1000000) // total_rev AS BIGINT)
        |    AS quarter_share_ppm
        |FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey
        |WHERE rev = max_rev
        |ORDER BY w.quarter, s_suppkey""".stripMargin,

    // TPC-H Q18 shape: total-quantity HAVING cut before any join,
    // deterministic top-100 on (qty DESC, orderkey).
    "large_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  CAST(o.o_orderdate AS DATE) AS o_orderdate,
        |  CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS totalprice_cents,
        |  b.total_qty
        |FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY b.total_qty DESC, o.o_orderkey LIMIT 100""".stripMargin,

    // TPC-H Q6 shape: band predicates pushed to the scan, forgone
    // revenue in 10^-2-cent units, share in basis points.
    "discount_whatif" ->
      """WITH l AS (SELECT
        |    CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep_c,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d_pct
        |  FROM lineitem
        |  WHERE l_discount >= 0.045 AND l_discount <= 0.075
        |    AND l_quantity < 24),
        |a AS (SELECT ship_year, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    SUM(CAST(ep_c * d_pct AS HUGEINT)) AS forgone,
        |    SUM(CAST(ep_c AS HUGEINT)) AS gross
        |  FROM l GROUP BY 1)
        |SELECT ship_year, n_lines,
        |  CAST(forgone AS BIGINT) AS forgone_rev_c100,
        |  CAST(gross AS BIGINT) AS gross_rev_cents,
        |  CAST((forgone * 100) // gross AS BIGINT) AS forgone_share_bp
        |FROM a ORDER BY ship_year""".stripMargin,

    "merge_upsert" ->
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us, event_id,
        |    event_type, value, ts < TIMESTAMP '2024-01-15' AS before
        |  FROM events),
        |br AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY us DESC, event_id DESC) AS rn FROM e WHERE before),
        |b AS (SELECT * FROM br WHERE rn = 1),
        |cr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY us DESC, event_id DESC) AS rn FROM e WHERE NOT before),
        |c AS (SELECT * FROM cr WHERE rn = 1)
        |SELECT COALESCE(c.user_id, b.user_id) AS user_id,
        |  CASE WHEN b.user_id IS NULL THEN 'insert'
        |       WHEN c.user_id IS NULL THEN 'keep'
        |       ELSE 'update' END AS op,
        |  COALESCE(c.us, b.us) AS us,
        |  COALESCE(c.event_id, b.event_id) AS event_id,
        |  COALESCE(c.event_type, b.event_type) AS event_type,
        |  COALESCE(c.value, b.value) AS value
        |FROM c FULL JOIN b ON c.user_id = b.user_id
        |ORDER BY 1""".stripMargin,

    // Runs/versions order on the TIMESTAMP_NS column directly (exact
    // ns, like snapshot_diff); the µs bounds come from epoch_ns // 1000
    // mirroring the Spark side's `ts_ns div 1000`.
    "scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT user_id, ts, event_id, event_type FROM o
        |      WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
        |  event_type,
        |  epoch_ns(ts) // 1000 AS valid_from_us,
        |  epoch_ns(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000 AS valid_to_us
        |FROM c ORDER BY user_id, version""".stripMargin,

    // Interpolated median over ≤7 exact-integer micro values: every
    // step of (a+b)·0.5 is exact in binary64, so quantile_cont and
    // Spark's percentile agree bit-for-bit (see Robust.rollingMedianOf).
    "rolling_median" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS qrev
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type, day, qrev,
        |         day - DATE '1970-01-01' AS dayi FROM daily)
        |SELECT event_type, day,
        |  floor(CAST(qrev AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue,
        |  floor(quantile_cont(CAST(qrev AS DOUBLE), 0.5) OVER w / 1e6 * 1e4 + 0.5) / 1e4 AS median_7d
        |FROM d2
        |WINDOW w AS (PARTITION BY event_type ORDER BY dayi
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    // Shared-edge equal-width bins (value_histogram's binning, per
    // type, over BOTH periods); each |p−q| is floor-quantized to a
    // 1e-9 integer grid so the Σ is order-independent on both engines.
    "distribution_drift" ->
      """WITH ev AS (SELECT event_type, value,
        |    ts < TIMESTAMP '2024-01-16' AS in_p FROM events),
        |b AS (SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
        |      FROM ev GROUP BY event_type),
        |binned AS (
        |  SELECT ev.event_type,
        |    CASE WHEN mx > mn
        |      THEN CAST(LEAST(floor((value - mn) / ((mx - mn) / 20)), 19) AS BIGINT)
        |      ELSE 0 END AS bucket,
        |    CAST(SUM(CASE WHEN in_p THEN 1 ELSE 0 END) AS BIGINT) AS np_bin,
        |    CAST(SUM(CASE WHEN NOT in_p THEN 1 ELSE 0 END) AS BIGINT) AS nq_bin
        |  FROM ev JOIN b ON ev.event_type = b.event_type
        |  GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(SUM(np_bin) AS BIGINT) AS np,
        |          CAST(SUM(nq_bin) AS BIGINT) AS nq
        |        FROM binned GROUP BY event_type
        |        HAVING SUM(np_bin) > 0 AND SUM(nq_bin) > 0)
        |SELECT t.event_type, t.np, t.nq,
        |  floor(CAST(SUM(CAST(floor(abs(
        |      CAST(np_bin AS DOUBLE) / CAST(np AS DOUBLE)
        |      - CAST(nq_bin AS DOUBLE) / CAST(nq AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
        |    AS DOUBLE) / 2e9 * 1e4 + 0.5) / 1e4 AS tvd
        |FROM binned JOIN tot t ON binned.event_type = t.event_type
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    // Deterministic Poisson(1) bootstrap: md5 is the cross-engine hash
    // (stratified_sample precedent); each digest yields four 32-bit
    // uniforms (the Spark side splits identically); the CDF step
    // thresholds and the 6-dp mean rounding mirror the Spark
    // expressions exactly. 81 reps → both quantile positions are
    // exact integers (2 and 78): order statistics, no interpolation.
    "bootstrap_ci" ->
      """WITH base AS (SELECT event_type, event_id,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv FROM events),
        |hs AS (SELECT event_type, qv, g.chunk,
        |    md5(event_id::VARCHAR || ':' || g.chunk::VARCHAR) AS h
        |  FROM base, generate_series(0, 20) AS g(chunk)),
        |r AS (SELECT event_type, qv, chunk * 4 + pp.p + 1 AS rep,
        |    CAST(('0x' || substring(h, 1 + 8 * pp.p, 8)) AS BIGINT) AS hv
        |  FROM hs, generate_series(0, 3) AS pp(p)
        |  WHERE chunk * 4 + pp.p + 1 <= 81),
        |wts AS (SELECT event_type, rep, qv,
        |    CASE WHEN u < 0.36787944 THEN 0 WHEN u < 0.73575888 THEN 1
        |         WHEN u < 0.9196986 THEN 2 WHEN u < 0.98101184 THEN 3
        |         WHEN u < 0.99634015 THEN 4 ELSE 5 END AS w
        |  FROM (SELECT *, CAST(hv AS DOUBLE) / 4294967296.0 AS u FROM r)),
        |m AS (SELECT event_type, rep,
        |    CAST(SUM(w * qv) AS BIGINT) AS swq, CAST(SUM(w) AS BIGINT) AS sw
        |  FROM wts GROUP BY 1, 2 HAVING SUM(w) > 0),
        |m6 AS (SELECT event_type,
        |    floor(CAST(swq AS DOUBLE) / CAST(sw AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS mean6
        |  FROM m)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_reps,
        |  floor(quantile_cont(mean6, 0.5) * 1e4 + 0.5) / 1e4 AS mean_boot,
        |  floor(quantile_cont(mean6, 0.025) * 1e4 + 0.5) / 1e4 AS ci_lo,
        |  floor(quantile_cont(mean6, 0.975) * 1e4 + 0.5) / 1e4 AS ci_hi
        |FROM m6 GROUP BY 1 ORDER BY 1""".stripMargin,

    // Median of pairwise daily-total slopes, micros-per-day integer
    // deltas, one IEEE division per pair, quantile_cont median ≍
    // Spark's exact percentile (earnings_percentiles' contract).
    "theilsen_trend" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CAST(b.v - a.v AS DOUBLE) / CAST(datediff('day', a.day, b.day) AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  floor(quantile_cont(slope, 0.5) / 1e6 * 1e4 + 0.5) / 1e4 AS slope_per_day,
        |  CAST(CASE WHEN floor(quantile_cont(slope, 0.5) / 1e6 * 1e4 + 0.5) / 1e4 > 0 THEN 1
        |            WHEN floor(quantile_cont(slope, 0.5) / 1e6 * 1e4 + 0.5) / 1e4 < 0 THEN -1
        |            ELSE 0 END AS INT) AS direction
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Mann–Kendall: integer S and tie-corrected 18·Var polynomials
    // over theilsen's daily frame; one /18 + sqrt + division chain.
    "mann_kendall" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |sa AS (SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
        |      ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |ta AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t_days
        |  FROM daily GROUP BY 1),
        |ti AS (SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr
        |  FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS t
        |        FROM daily GROUP BY 1, 2) GROUP BY 1),
        |c AS (SELECT sa.event_type, ta.t_days, sa.s,
        |    ta.t_days * (ta.t_days - 1) * (2 * ta.t_days + 5) - ti.tcorr
        |      AS v18,
        |    CASE WHEN sa.s > 0 THEN sa.s - 1 WHEN sa.s < 0 THEN sa.s + 1
        |      ELSE 0 END AS sadj
        |  FROM sa JOIN ta ON ta.event_type = sa.event_type
        |  JOIN ti ON ti.event_type = sa.event_type)
        |SELECT event_type, t_days, s,
        |  floor(CAST(sadj AS DOUBLE)
        |    / sqrt(CAST(v18 AS DOUBLE) / 18.0) * 1e4 + 0.5) / 1e4 AS z,
        |  abs(CAST(sadj AS DOUBLE)
        |    / sqrt(CAST(v18 AS DOUBLE) / 18.0)) > 1.96 AS trending
        |FROM c ORDER BY event_type""".stripMargin,

    // Jonckheere-Terpstra ordered trend across the discount ladder:
    // doubled-U off one bounded histogram, tie-corrected variance
    // polynomials on HUGEINT, z through the engine's fixed chain.
    "jonckheere_trend" ->
      """WITH hist AS (SELECT
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS g,
        |    CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |dense AS (SELECT gg.g, qq.q, COALESCE(h.c, 0) AS c
        |  FROM (SELECT DISTINCT g FROM hist) gg
        |  CROSS JOIN (SELECT DISTINCT q FROM hist) qq
        |  LEFT JOIN hist h ON h.g = gg.g AND h.q = qq.q),
        |cum AS (SELECT g, q, c,
        |    SUM(c) OVER (PARTITION BY g ORDER BY q) - c AS below
        |  FROM dense),
        |j AS (SELECT COALESCE(SUM(CAST(hi.c AS HUGEINT)
        |      * (2 * lo.below + lo.c)), 0) AS j2
        |  FROM cum hi JOIN cum lo ON hi.q = lo.q AND lo.g < hi.g),
        |gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(n) AS BIGINT) AS nn,
        |    SUM(CAST(n AS HUGEINT) * n) AS sn2,
        |    SUM(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)) AS p2,
        |    SUM(CAST(n AS HUGEINT) * (n - 1) * (n - 2)) AS a3,
        |    SUM(CAST(n AS HUGEINT) * (n - 1)) AS a2
        |  FROM (SELECT g, SUM(c) AS n FROM hist GROUP BY 1)),
        |tm AS (SELECT
        |    SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS p3,
        |    SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS b3,
        |    SUM(CAST(t AS HUGEINT) * (t - 1)) AS b2
        |  FROM (SELECT q, SUM(c) AS t FROM hist GROUP BY 1)),
        |f AS (SELECT nn, n_groups, j2,
        |    (CAST(nn AS HUGEINT) * nn - sn2) // 2 AS e2,
        |    p2, p3, a3, a2, b3, b2 FROM j, gm, tm),
        |zc AS (SELECT nn, n_groups,
        |    CAST(j2 AS DOUBLE) AS j2, CAST(e2 AS DOUBLE) AS e2,
        |    floor(CAST(j2 - e2 AS DOUBLE)
        |      / (2.0 * sqrt(
        |          CAST(CAST(nn AS HUGEINT) * (nn - 1) * (2 * nn + 5)
        |               - p2 - p3 AS DOUBLE) / 72.0
        |          + CAST(a3 AS DOUBLE) * CAST(b3 AS DOUBLE)
        |            / NULLIF(CAST(36 * CAST(nn AS HUGEINT) * (nn - 1)
        |                * (nn - 2) AS DOUBLE), 0.0)
        |          + CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)
        |            / NULLIF(CAST(8 * CAST(nn AS HUGEINT) * (nn - 1)
        |                AS DOUBLE), 0.0)))
        |      * 1e4 + 0.5) / 1e4 AS z
        |  FROM f)
        |SELECT nn AS n, n_groups, j2, e2, z,
        |  CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > 1.96 END AS trending
        |FROM zc""".stripMargin,

    // Seasonal Mann–Kendall: the mann_kendall algebra per weekday
    // stratum (arithmetic epoch-mod-7), S and 18·Var summed exactly.
    "seasonal_mk" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |dd AS (SELECT event_type, day, v,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS dow
        |  FROM daily),
        |sa AS (SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
        |      ELSE 0 END) AS BIGINT) AS s
        |  FROM dd a JOIN dd b ON b.event_type = a.event_type
        |    AND b.dow = a.dow AND a.day < b.day
        |  GROUP BY 1),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(tg) AS BIGINT) AS t_days,
        |    CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS vpos
        |  FROM (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS tg
        |        FROM dd GROUP BY 1, 2) GROUP BY 1),
        |ti AS (SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr
        |  FROM (SELECT event_type, dow, v, CAST(COUNT(*) AS BIGINT) AS t
        |        FROM dd GROUP BY 1, 2, 3) GROUP BY 1),
        |c AS (SELECT sa.event_type, st.t_days, st.n_strata, sa.s,
        |    st.vpos - ti.tcorr AS v18,
        |    CASE WHEN sa.s > 0 THEN sa.s - 1 WHEN sa.s < 0 THEN sa.s + 1
        |      ELSE 0 END AS sadj
        |  FROM sa JOIN st ON st.event_type = sa.event_type
        |  JOIN ti ON ti.event_type = sa.event_type)
        |SELECT event_type, t_days, n_strata, s,
        |  floor(CAST(sadj AS DOUBLE)
        |    / sqrt(CAST(v18 AS DOUBLE) / 18.0) * 1e4 + 0.5) / 1e4 AS z,
        |  abs(CAST(sadj AS DOUBLE)
        |    / sqrt(CAST(v18 AS DOUBLE) / 18.0)) > 1.96 AS trending
        |FROM c ORDER BY event_type""".stripMargin,

    // Dictionary-level fuzzy pairs: block on the last token, length
    // band then classic Levenshtein (exact integer on both engines),
    // lexicographic pair order.
    "fuzzy_match" ->
      """WITH d AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
        |           FROM part GROUP BY 1),
        |t AS (SELECT name, n_parts, string_split(name, ' ')[-1] AS block FROM d)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist,
        |  a.n_parts AS n_a, b.n_parts AS n_b
        |FROM t a JOIN t b ON a.block = b.block AND a.name < b.name
        |WHERE abs(length(a.name) - length(b.name)) <= 2
        |  AND levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    // First row of the (value, id) total order where 2*cum >= total —
    // pure int64, no interpolation contract at all.
    "weighted_median" ->
      """WITH q AS (SELECT event_type, event_id,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv
        |  FROM events),
        |w AS (SELECT *,
        |    CAST(SUM(qv) OVER (PARTITION BY event_type) AS BIGINT) AS total,
        |    CAST(SUM(qv) OVER (PARTITION BY event_type ORDER BY qv, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM q),
        |f AS (SELECT event_type, qv, total,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY qv, event_id) AS rn
        |  FROM w WHERE 2 * cum >= total)
        |SELECT event_type,
        |  floor(CAST(qv AS DOUBLE) / 100.0 + 0.5) / 1e4 AS weighted_median,
        |  floor(CAST(total AS DOUBLE) / 100.0 + 0.5) / 1e4 AS total_value
        |FROM f WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // Median/IQR rounded 4dp BEFORE the per-row division
    // (madOutliers' contract); IQR-degenerate groups emit NULL.
    "robust_scaler" ->
      """WITH w AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    floor(quantile_cont(o_totalprice, 0.5)
        |      OVER (PARTITION BY o_orderpriority) * 1e4 + 0.5) / 1e4 AS med,
        |    floor((quantile_cont(o_totalprice, 0.75) OVER (PARTITION BY o_orderpriority)
        |      - quantile_cont(o_totalprice, 0.25) OVER (PARTITION BY o_orderpriority))
        |      * 1e4 + 0.5) / 1e4 AS iqr
        |  FROM orders)
        |SELECT o_orderkey, o_orderpriority, o_totalprice, med, iqr,
        |  CASE WHEN iqr > 0
        |    THEN floor((o_totalprice - med) / iqr * 1e4 + 0.5) / 1e4 END AS scaled
        |FROM w ORDER BY o_orderkey""".stripMargin,

    // 32-bit uniform from the group-key md5 vs exact ⌊2³²·CDF⌋ integer
    // thresholds of the α=1/2 two-sided geometric, truncated at ±4.
    "dp_counts" ->
      """WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1),
        |h AS (SELECT event_type, n,
        |        CAST(('0x' || substring(md5('dp:' || event_type), 1, 8)) AS BIGINT) AS hv
        |      FROM c),
        |z AS (SELECT event_type, n,
        |        CASE WHEN hv < 1431655765 THEN 0
        |             WHEN hv < 2147483648 THEN 1
        |             WHEN hv < 2863311530 THEN -1
        |             WHEN hv < 3221225472 THEN 2
        |             WHEN hv < 3579139413 THEN -2
        |             WHEN hv < 3758096384 THEN 3
        |             WHEN hv < 3937053354 THEN -3
        |             WHEN hv < 4116010325 THEN 4
        |             ELSE -4 END AS noise
        |      FROM h)
        |SELECT event_type, n, CAST(noise AS BIGINT) AS noise,
        |  n + noise AS noisy_n
        |FROM z ORDER BY event_type""".stripMargin,

    // QI = segment × nation × balance kilobucket; groups under k = 5
    // are the re-identification risks.
    "kanon_risk" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS group_size
        |FROM customer
        |GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
        |ORDER BY c_mktsegment, c_nationkey, bal_bucket""".stripMargin,

    // l-diversity over the one-level-generalized QI; argmax via the
    // lang_hhi ROW_NUMBER idiom (ties to the smallest bucket).
    "l_diversity" ->
      """WITH c AS (SELECT c_mktsegment, CAST(c_nationkey AS INT) AS c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM customer GROUP BY 1, 2, 3),
        |g AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(SUM(c) AS BIGINT) AS group_size,
        |    CAST(COUNT(*) AS BIGINT) AS l_distinct
        |  FROM c GROUP BY 1, 2),
        |top AS (SELECT c_mktsegment, c_nationkey,
        |    bal_bucket AS top_sensitive, c AS top_c FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment, c_nationkey
        |      ORDER BY c DESC, bal_bucket) AS rn FROM c) WHERE rn = 1)
        |SELECT g.c_mktsegment, g.c_nationkey, group_size, l_distinct,
        |  top_sensitive,
        |  (top_c * 1000000) // group_size AS top_share_ppm,
        |  l_distinct < 3 AS risky
        |FROM g JOIN top USING (c_mktsegment, c_nationkey)
        |ORDER BY g.c_mktsegment, g.c_nationkey""".stripMargin,

    // fuzzy_match's blocked pair list -> recursive min-label closure
    // (dedup_components' oracle pattern on string ids).
    "entity_clusters" ->
      """WITH RECURSIVE d AS (SELECT p_name AS name,
        |    CAST(COUNT(*) AS BIGINT) AS n_parts FROM part GROUP BY 1),
        |t AS (SELECT name, n_parts, string_split(name, ' ')[-1] AS block FROM d),
        |p AS (SELECT a.name AS na, b.name AS nb
        |      FROM t a JOIN t b ON a.block = b.block AND a.name < b.name
        |      WHERE abs(length(a.name) - length(b.name)) <= 2
        |        AND levenshtein(a.name, b.name) <= 2),
        |e AS (SELECT na AS a, nb AS b FROM p UNION ALL SELECT nb, na FROM p),
        |r AS (SELECT name AS node, name AS lbl FROM d
        |      UNION
        |      SELECT e.a AS node, r.lbl FROM e JOIN r ON r.node = e.b),
        |c AS (SELECT node AS name, MIN(lbl) AS cluster FROM r GROUP BY node)
        |SELECT c.name, c.cluster,
        |  CAST(COUNT(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS cluster_size,
        |  d.n_parts
        |FROM c JOIN d ON c.name = d.name ORDER BY c.name""".stripMargin,

    // Zone-map audit: value-cut zones on order key (arrival) vs ship
    // date (clustered); envelopes in day offsets from the corpus min.
    "zonemap_audit" ->
      """WITH rows_ AS (SELECT l_orderkey AS ok, CAST(l_shipdate AS DATE) AS day
        |               FROM lineitem),
        |b AS (SELECT min(ok) AS ok0, max(ok) AS ok1, min(day) AS d0, max(day) AS d1
        |      FROM rows_),
        |z AS (SELECT day, d0, d1,
        |        ((ok - ok0) * 32) // (ok1 - ok0 + 1) AS z_arrival,
        |        (CAST(datediff('day', d0, day) AS BIGINT) * 32)
        |          // (CAST(datediff('day', d0, d1) AS BIGINT) + 1) AS z_date
        |      FROM rows_, b),
        |env AS (
        |  SELECT 'arrival' AS layout, z_arrival AS zone,
        |    CAST(MIN(datediff('day', d0, day)) AS BIGINT) AS lo,
        |    CAST(MAX(datediff('day', d0, day)) AS BIGINT) AS hi,
        |    CAST(ANY_VALUE(datediff('day', d0, d1)) AS BIGINT) AS span
        |  FROM z GROUP BY z_arrival
        |  UNION ALL
        |  SELECT 'date', z_date,
        |    CAST(MIN(datediff('day', d0, day)) AS BIGINT),
        |    CAST(MAX(datediff('day', d0, day)) AS BIGINT),
        |    CAST(ANY_VALUE(datediff('day', d0, d1)) AS BIGINT)
        |  FROM z GROUP BY z_date)
        |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_zones,
        |  CAST(SUM(CASE WHEN lo <= (span // 2) + 14 AND hi >= (span // 2) - 15
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |  floor(CAST(COUNT(*) - SUM(CASE WHEN lo <= (span // 2) + 14
        |      AND hi >= (span // 2) - 15 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS pruned_frac,
        |  floor(CAST(SUM(hi - lo + 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS mean_zone_days
        |FROM env GROUP BY layout ORDER BY layout""".stripMargin,

    // IVM merge ≡ full recompute — the oracle IS the full recompute.
    "incremental_rollup" ->
      """WITH b AS (SELECT CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv,
        |    CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS late
        |  FROM events)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  floor(CAST(SUM(qv) AS DOUBLE) / 100.0 + 0.5) / 1e4 AS revenue,
        |  CAST(SUM(late) AS BIGINT) AS n_late
        |FROM b GROUP BY day ORDER BY day""".stripMargin,

    // Integer columns mean over raw int64 sums; value through micro
    // quantization with the scale divided back out (Spark divides by
    // 1.0 for the integer columns — an IEEE identity, so omitting it
    // here is bit-equal). event_type's mean is NULL by type.
    "schema_drift" ->
      """WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        |b AS (SELECT date_diff('day', d0.d0, CAST(ts AS DATE)) >= 15 AS after,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS qv, user_id,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    event_type
        |  FROM events, d0),
        |et AS (SELECT 'event_type' AS "column", after,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct,
        |    CAST(NULL AS DOUBLE) AS mean
        |  FROM b GROUP BY after),
        |it AS (SELECT 'item' AS "column", after,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN item IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT item) AS BIGINT) AS n_distinct,
        |    floor(CAST(SUM(item) AS DOUBLE)
        |      / CAST(COUNT(*) - SUM(CASE WHEN item IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      * 1e4 + 0.5) / 1e4 AS mean
        |  FROM b GROUP BY after),
        |uid AS (SELECT 'user_id' AS "column", after,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct,
        |    floor(CAST(SUM(user_id) AS DOUBLE)
        |      / CAST(COUNT(*) - SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      * 1e4 + 0.5) / 1e4 AS mean
        |  FROM b GROUP BY after),
        |v AS (SELECT 'value' AS "column", after,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN qv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT qv) AS BIGINT) AS n_distinct,
        |    floor(CAST(SUM(qv) AS DOUBLE) / 1e6
        |      / CAST(COUNT(*) - SUM(CASE WHEN qv IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      * 1e4 + 0.5) / 1e4 AS mean
        |  FROM b GROUP BY after),
        |u AS (SELECT * FROM et UNION ALL SELECT * FROM it
        |      UNION ALL SELECT * FROM uid UNION ALL SELECT * FROM v),
        |sa AS (SELECT "column", n_rows AS n_a, n_null AS null_a,
        |    n_distinct AS distinct_a, mean AS mean_a FROM u WHERE NOT after),
        |sb AS (SELECT "column", n_rows AS n_b, n_null AS null_b,
        |    n_distinct AS distinct_b, mean AS mean_b FROM u WHERE after)
        |SELECT sa."column" AS "column", n_a, n_b,
        |  floor(CAST(null_a AS DOUBLE) / CAST(n_a AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS null_rate_a,
        |  floor(CAST(null_b AS DOUBLE) / CAST(n_b AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS null_rate_b,
        |  distinct_a, distinct_b,
        |  floor(CAST(distinct_b AS DOUBLE) / CAST(distinct_a AS DOUBLE) * 1e4 + 0.5)
        |    / 1e4 AS distinct_ratio,
        |  mean_a, mean_b
        |FROM sa JOIN sb USING ("column") ORDER BY "column"""".stripMargin,

    // Benford: all-integer (micro grid -> leading decimal char ->
    // ppm by integer div); the expectation table is pinned constants.
    "benford_audit" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 1e6)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |    FROM orders),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders
        |      FROM d GROUP BY 1),
        |t AS (SELECT *, CAST(SUM(n_orders) OVER () AS BIGINT) AS n_total
        |      FROM c),
        |b(digit, benford_ppm) AS (VALUES (1, CAST(301030 AS BIGINT)),
        |  (2, 176091), (3, 124939), (4, 96910), (5, 79181), (6, 66947),
        |  (7, 57992), (8, 51153), (9, 45757))
        |SELECT t.digit, n_orders,
        |  (n_orders * 1000000) // n_total AS obs_ppm, benford_ppm,
        |  abs((n_orders * 1000000) // n_total - benford_ppm) AS abs_dev_ppm
        |FROM t JOIN b ON b.digit = t.digit ORDER BY t.digit""".stripMargin,

    // Exact self-join pair mass vs the uniform-keys estimate; pure
    // int64 with integer division.
    "join_size_estimate" ->
      """WITH c AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM lineitem GROUP BY 1),
        |g AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |        CAST(COUNT(*) AS BIGINT) AS n_keys,
        |        CAST(SUM(c * c) AS BIGINT) AS exact_pairs,
        |        CAST(MAX(c) AS BIGINT) AS max_key_rows
        |      FROM c)
        |SELECT n_rows, n_keys, exact_pairs,
        |  (n_rows * n_rows) // n_keys AS est_uniform_pairs,
        |  (exact_pairs * 10000) // ((n_rows * n_rows) // n_keys)
        |    AS err_ratio_bp,
        |  max_key_rows
        |FROM g""".stripMargin,

    // Contract audit: five conditional sums in one scan, 5-row stack.
    "contract_audit" ->
      """WITH g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN event_type IS NOT NULL AND event_type IN
        |        ('click','error','purchase','signup','view')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN value IS NOT NULL AND value >= 0
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |    CAST(SUM(CASE WHEN ts IS NOT NULL
        |        AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2027-01-01'
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v3,
        |    CAST(SUM(CASE WHEN user_id IS NOT NULL AND user_id > 0
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v4,
        |    CAST(SUM(CASE WHEN props IS NOT NULL AND length(props) >= 2
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v5
        |  FROM events),
        |u AS (SELECT 'event_type_enum' AS rule, n_rows, v1 AS n_violations FROM g
        |  UNION ALL SELECT 'value_non_negative', n_rows, v2 FROM g
        |  UNION ALL SELECT 'ts_in_window', n_rows, v3 FROM g
        |  UNION ALL SELECT 'user_id_positive', n_rows, v4 FROM g
        |  UNION ALL SELECT 'props_present', n_rows, v5 FROM g)
        |SELECT rule, n_rows, n_violations,
        |  (n_violations * 1000000) // n_rows AS violation_ppm
        |FROM u ORDER BY rule""".stripMargin,

    // KS: integer CDF cross-product argmax |ca*nb - cb*na| FIRST, one
    // division after; 1.358 cast to DOUBLE (the mad_outliers rule).
    "ks_test" ->
      """WITH e AS (SELECT event_type,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |        (ts < TIMESTAMP '2024-01-16') AS in_a
        |      FROM events),
        |g AS (SELECT event_type, vq,
        |        CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca_bin,
        |        CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb_bin
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(SUM(ca_bin) OVER (PARTITION BY event_type ORDER BY vq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |        CAST(SUM(cb_bin) OVER (PARTITION BY event_type ORDER BY vq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
        |        CAST(SUM(ca_bin) OVER (PARTITION BY event_type) AS BIGINT) AS na,
        |        CAST(SUM(cb_bin) OVER (PARTITION BY event_type) AS BIGINT) AS nb
        |      FROM g),
        |m AS (SELECT event_type, na, nb,
        |        CAST(MAX(abs(ca * nb - cb * na)) AS BIGINT) AS dmax
        |      FROM w WHERE na > 0 AND nb > 0 GROUP BY 1, 2, 3)
        |SELECT event_type, na, nb,
        |  floor(CAST(dmax AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS ks_d,
        |  floor(CAST(1.358 AS DOUBLE) * sqrt(CAST(na + nb AS DOUBLE)
        |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS crit_05,
        |  CAST(dmax AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
        |    > CAST(1.358 AS DOUBLE) * sqrt(CAST(na + nb AS DOUBLE)
        |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS drifted
        |FROM m ORDER BY event_type""".stripMargin,

    // 1-D Wasserstein: the ks_test CTEs + a lead() gap; HUGEINT
    // |ca·nb − cb·na|·gap mass, one division at the edge.
    "wasserstein_drift" ->
      """WITH e AS (SELECT event_type,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |        (ts < TIMESTAMP '2024-01-16') AS in_a
        |      FROM events),
        |g AS (SELECT event_type, vq,
        |        CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca_bin,
        |        CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb_bin
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(SUM(ca_bin) OVER (PARTITION BY event_type ORDER BY vq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |        CAST(SUM(cb_bin) OVER (PARTITION BY event_type ORDER BY vq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
        |        lead(vq) OVER (PARTITION BY event_type ORDER BY vq) - vq AS gap,
        |        CAST(SUM(ca_bin) OVER (PARTITION BY event_type) AS BIGINT) AS na,
        |        CAST(SUM(cb_bin) OVER (PARTITION BY event_type) AS BIGINT) AS nb
        |      FROM g),
        |m AS (SELECT event_type, na, nb,
        |        SUM(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
        |          * COALESCE(gap, 0)) AS m
        |      FROM w WHERE na > 0 AND nb > 0 GROUP BY 1, 2, 3)
        |SELECT event_type, na, nb,
        |  floor(CAST(m AS DOUBLE)
        |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) / 1e6
        |    * 1e6 + 0.5) / 1e6 AS w1
        |FROM m ORDER BY event_type""".stripMargin,

    // Wald-Wolfowitz runs: lower median off the daily frame, ties
    // drop, lag-pass run count, one double chain for E/Var/z.
    "runs_test" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
        |    CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT *,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |med AS (SELECT event_type, MIN(v) AS m
        |  FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |sg AS (SELECT d.event_type, d.day,
        |    CASE WHEN d.v > med.m THEN 1 ELSE -1 END AS sg
        |  FROM daily d JOIN med ON med.event_type = d.event_type
        |  WHERE d.v <> med.m),
        |ch AS (SELECT event_type, sg,
        |    CASE WHEN lag(sg) OVER (PARTITION BY event_type ORDER BY day)
        |        IS DISTINCT FROM sg THEN 1 ELSE 0 END AS chg
        |  FROM sg),
        |a AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        |    CAST(SUM(chg) AS BIGINT) AS runs
        |  FROM ch GROUP BY 1)
        |SELECT event_type, n_pos, n_neg, runs,
        |  floor((CAST(runs AS DOUBLE) - (1.0
        |      + CAST(2 * n_pos * n_neg AS DOUBLE)
        |        / CAST(n_pos + n_neg AS DOUBLE)))
        |    / sqrt(CAST(2 * n_pos * n_neg AS DOUBLE)
        |      * CAST(2 * n_pos * n_neg - n_pos - n_neg AS DOUBLE)
        |      / (CAST(n_pos + n_neg AS DOUBLE)
        |         * CAST(n_pos + n_neg AS DOUBLE)
        |         * CAST(n_pos + n_neg - 1 AS DOUBLE)))
        |    * 1e4 + 0.5) / 1e4 AS z,
        |  abs((CAST(runs AS DOUBLE) - (1.0
        |      + CAST(2 * n_pos * n_neg AS DOUBLE)
        |        / CAST(n_pos + n_neg AS DOUBLE)))
        |    / sqrt(CAST(2 * n_pos * n_neg AS DOUBLE)
        |      * CAST(2 * n_pos * n_neg - n_pos - n_neg AS DOUBLE)
        |      / (CAST(n_pos + n_neg AS DOUBLE)
        |         * CAST(n_pos + n_neg AS DOUBLE)
        |         * CAST(n_pos + n_neg - 1 AS DOUBLE)))) > 1.96 AS nonrandom
        |FROM a ORDER BY event_type""".stripMargin,

    // Mann-Whitney: doubled-U pair counting by value (2U1 = Σ c1 *
    // (2*below0 + c0)) and the tie term Σ(t³−t) on HUGEINT (Spark:
    // decimal(38,0)); z and auc are fixed-order double expressions.
    "mannwhitney_test" ->
      """WITH e AS (SELECT event_type,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |        CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |          AS BIGINT) % 2 AS arm
        |      FROM events),
        |g AS (SELECT event_type, vq,
        |        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(SUM(c0) OVER (PARTITION BY event_type ORDER BY vq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c0
        |          AS BIGINT) AS below0,
        |        CAST(SUM(c0) OVER (PARTITION BY event_type) AS BIGINT) AS n0,
        |        CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1
        |      FROM g),
        |m AS (SELECT event_type, n0, n1,
        |        SUM(CAST(c1 AS HUGEINT) * (2 * below0 + c0)) AS u2,
        |        SUM(CAST(c0 + c1 AS HUGEINT) * (c0 + c1) * (c0 + c1)
        |          - (c0 + c1)) AS tcub
        |      FROM w WHERE n0 > 0 AND n1 > 0 GROUP BY 1, 2, 3),
        |r AS (SELECT event_type, n0, n1,
        |    floor(CAST(u2 AS DOUBLE)
        |      / (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) * 1e6 + 0.5)
        |      / 1e6 AS auc,
        |    floor(
        |      (CAST(u2 AS DOUBLE) - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) / 2.0
        |      / sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0
        |        * (CAST(n0 + n1 + 1 AS DOUBLE)
        |           - CAST(tcub AS DOUBLE)
        |             / (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 - 1 AS DOUBLE))))
        |      * 1e6 + 0.5) / 1e6 AS z
        |  FROM m)
        |SELECT event_type, n0, n1, auc, z,
        |  CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > 1.96 END AS significant
        |FROM r ORDER BY event_type""".stripMargin,

    // Order fill rate: line frame to order grain first, month agg,
    // exact ppm fill share.
    "order_fill_rate" ->
      """WITH per AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_f
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
        |    CASE WHEN p.n_f = p.n_lines THEN 'filled'
        |         WHEN p.n_f = 0 THEN 'open' ELSE 'partial' END AS status
        |  FROM orders o JOIN per p ON o.o_orderkey = p.l_orderkey)
        |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN status = 'filled' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_filled,
        |  CAST(SUM(CASE WHEN status = 'partial' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_partial,
        |  CAST(SUM(CASE WHEN status = 'open' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_open,
        |  CAST((SUM(CASE WHEN status = 'filled' THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS fill_ppm
        |FROM j GROUP BY month ORDER BY month""".stripMargin,

    // ABC classification: cumulative cent revenue over parts desc,
    // HUGEINT 80/95 cuts, 3-row class aggregate with exact ppm shares.
    "abc_classification" ->
      """WITH pp AS (SELECT l_partkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(rev) AS HUGEINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS np FROM pp),
        |r AS (SELECT *, CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum FROM pp),
        |c AS (SELECT CASE
        |      WHEN CAST(cum AS HUGEINT) * 100 <= t.total * 80 THEN 'A'
        |      WHEN CAST(cum AS HUGEINT) * 100 <= t.total * 95 THEN 'B'
        |      ELSE 'C' END AS abc_class, rev
        |    FROM r, t)
        |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST((COUNT(*) * 1000000) // MAX(t2.np) AS BIGINT)
        |    AS part_share_ppm,
        |  CAST((SUM(CAST(rev AS HUGEINT)) * 1000000) // MAX(t2.total)
        |    AS BIGINT) AS revenue_share_ppm
        |FROM c, t t2 GROUP BY 1 ORDER BY abc_class""".stripMargin,

    // Price/volume/mix: midpoint split, cent-grid HUGEINT products,
    // TPC-H Q3 shape: segment-pruned unshipped revenue top-10;
    // LIMIT ties broken on the exact integer qsum, never the 4-dp
    // rounded revenue.
    "unshipped_orders" ->
      """WITH cust AS (SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-06-01'
        |    AND o_custkey IN (SELECT c_custkey FROM cust)),
        |li AS (SELECT l_orderkey,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0)
        |      AS BIGINT) AS qrev
        |  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'),
        |g AS (SELECT li.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |    CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(qrev) AS BIGINT) AS qsum
        |  FROM li JOIN o ON li.l_orderkey = o.o_orderkey GROUP BY 1, 2, 3)
        |SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_orderpriority, n_lines,
        |  floor(CAST(qsum AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue
        |FROM g ORDER BY qsum DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    // TPC-H Q8 shape: both ratio legs from ONE conditional aggregate,
    // exact ppm share on HUGEINT — DuckDB's // on DECIMAL operands
    // ROUNDS the decimal division before truncating (measured: one
    // ppm high on this very query); integer-typed // is exact floor.
    "nation_market_share" ->
      """WITH okp AS (SELECT p_partkey FROM part WHERE p_type = 'MEDIUM'),
        |okn AS (SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'),
        |okc AS (SELECT c_custkey FROM customer
        |  WHERE c_nationkey IN (SELECT n_nationkey FROM okn)),
        |sn AS (SELECT s_suppkey, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey),
        |o AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year
        |  FROM orders WHERE o_custkey IN (SELECT c_custkey FROM okc)),
        |li AS (SELECT l_orderkey, l_suppkey,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0)
        |      AS BIGINT) AS qrev
        |  FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM okp)),
        |j AS (SELECT o.o_year, sn.n_name, li.qrev
        |  FROM li JOIN o ON li.l_orderkey = o.o_orderkey
        |  JOIN sn ON li.l_suppkey = sn.s_suppkey),
        |g AS (SELECT o_year, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(qrev) AS BIGINT) AS trev,
        |    CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN qrev ELSE 0 END)
        |      AS BIGINT) AS nrev
        |  FROM j GROUP BY 1)
        |SELECT o_year, n_lines,
        |  floor(CAST(trev AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue_total,
        |  floor(CAST(nrev AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue_nation,
        |  CAST((CAST(nrev AS HUGEINT) * 1000000)
        |    // CAST(trev AS HUGEINT) AS BIGINT) AS share_ppm
        |FROM g WHERE trev > 0 ORDER BY o_year""".stripMargin,

    // TPC-H Q19 shape: OR-of-ANDs brand/size/quantity baskets,
    // per-basket revenue on the money contract.
    "brand_basket_revenue" ->
      """SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  floor(CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 1000000.0) AS BIGINT)) AS DOUBLE) / 100 + 0.5) / 1e4
        |    AS revenue
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
        |    AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
        |    AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
        |    AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 30)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Duplicate-payment suspects: custkey equijoin, a < b
    // orientation, exact integer 1% tolerance on the cent grid
    // (|Δ|·100 ≤ least leg), smaller leg priced once.
    "duplicate_payments" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(o_orderdate AS DATE) AS day
        |  FROM orders),
        |p AS (SELECT abs(datediff('day', a.day, b.day)) AS gap_days,
        |    abs(a.cents - b.cents) AS dc,
        |    LEAST(a.cents, b.cents) AS risk_cents
        |  FROM o a JOIN o b ON a.o_custkey = b.o_custkey
        |    AND a.o_orderkey < b.o_orderkey
        |  WHERE abs(datediff('day', a.day, b.day)) <= 7
        |    AND abs(a.cents - b.cents) * 100 <= LEAST(a.cents, b.cents))
        |SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  floor(CAST(SUM(risk_cents) * 10000 AS DOUBLE) / 100 + 0.5) / 1e4
        |    AS dup_amount_usd
        |FROM p GROUP BY 1 ORDER BY gap_days""".stripMargin,

    // TPC-H Q4 shape: EXISTS-late-line as a distinct-orderkey semi,
    // exact-ppm late share per priority.
    "late_orders_by_priority" ->
      """WITH ord AS (SELECT o_orderkey, o_orderpriority,
        |    CAST(o_orderdate AS DATE) AS oday FROM orders),
        |lo AS (SELECT DISTINCT o.o_orderkey
        |  FROM lineitem l JOIN ord o ON l.l_orderkey = o.o_orderkey
        |  WHERE datediff('day', o.oday, CAST(l.l_shipdate AS DATE)) > 90),
        |fl AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late
        |  FROM ord WHERE o_orderkey IN (SELECT o_orderkey FROM lo)
        |  GROUP BY 1),
        |al AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM ord GROUP BY 1)
        |SELECT al.o_orderpriority, al.n_orders,
        |  COALESCE(fl.n_late, 0) AS n_late,
        |  CAST((COALESCE(fl.n_late, 0) * 1000000) // al.n_orders AS BIGINT)
        |    AS late_ppm
        |FROM al LEFT JOIN fl ON fl.o_orderpriority = al.o_orderpriority
        |ORDER BY al.o_orderpriority""".stripMargin,

    // TPC-H Q7 shape: both directions between the two nations, money
    // contract revenue per (supp_nation, cust_nation, year).
    "trade_flows" ->
      """WITH nk AS (SELECT n_nationkey, n_name FROM nation
        |  WHERE n_name IN ('NATION_1', 'NATION_2')),
        |sup AS (SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier JOIN nk ON s_nationkey = n_nationkey),
        |cust AS (SELECT c_custkey, n_name AS cust_nation
        |  FROM customer JOIN nk ON c_nationkey = n_nationkey),
        |ord AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
        |    cust_nation
        |  FROM orders JOIN cust ON o_custkey = c_custkey),
        |li AS (SELECT l_orderkey, l_suppkey,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0)
        |      AS BIGINT) AS qrev
        |  FROM lineitem)
        |SELECT supp_nation, cust_nation, o_year,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  floor(CAST(SUM(qrev) AS DOUBLE) / 100 + 0.5) / 1e4 AS revenue
        |FROM li JOIN sup ON li.l_suppkey = sup.s_suppkey
        |JOIN ord ON li.l_orderkey = ord.o_orderkey
        |WHERE supp_nation <> cust_nation
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // TPC-H Q10 shape: returned-revenue top-20, LIMIT ties on the
    // exact integer revenue then custkey.
    "returned_revenue_topk" ->
      """WITH ord AS (SELECT o_orderkey, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-04-01'),
        |pc AS (SELECT o.o_custkey AS c_custkey,
        |    CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS qsum
        |  FROM lineitem l JOIN ord o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'R' GROUP BY 1)
        |SELECT pc.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
        |  pc.n_lines,
        |  floor(CAST(pc.qsum AS DOUBLE) / 100 + 0.5) / 1e4
        |    AS returned_revenue
        |FROM pc JOIN customer c ON c.c_custkey = pc.c_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |ORDER BY pc.qsum DESC, pc.c_custkey LIMIT 20""".stripMargin,

    // Unit-price dispersion: per-part exact range ppm on the
    // quantized unit cent, brand rollup with the >10% cut and HUGEINT
    // integer divisions.
    "price_dispersion" ->
      """WITH pp AS (SELECT l_partkey,
        |    CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    MIN(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5)
        |      AS BIGINT)) AS min_uc,
        |    MAX(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5)
        |      AS BIGINT)) AS max_uc
        |  FROM lineitem WHERE l_quantity > 0 GROUP BY 1),
        |pr AS (SELECT l_partkey,
        |    CAST(((max_uc - min_uc) * 1000000) // NULLIF(max_uc, 0)
        |      AS BIGINT) AS range_ppm,
        |    CASE WHEN (max_uc - min_uc) * 10 > max_uc THEN 1 ELSE 0 END
        |      AS dispersed
        |  FROM pp)
        |SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(pr.dispersed) AS BIGINT) AS n_dispersed,
        |  CAST((SUM(pr.dispersed) * 1000000) // COUNT(*) AS BIGINT)
        |    AS dispersed_share_ppm,
        |  CAST(MAX(pr.range_ppm) AS BIGINT) AS max_range_ppm
        |FROM pr JOIN part p ON p.p_partkey = pr.l_partkey
        |GROUP BY 1 ORDER BY p.p_brand""".stripMargin,

    // Single-sourcing: argmax supplier via ROW_NUMBER (qty DESC,
    // suppkey), cross-multiplied 90% cut on raw quantities.
    "single_sourcing" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qs
        |  FROM lineitem GROUP BY 1, 2),
        |pp AS (SELECT l_partkey, CAST(SUM(qs) AS BIGINT) AS qt,
        |    CAST(COUNT(*) AS BIGINT) AS n_suppliers
        |  FROM ps GROUP BY 1),
        |tp AS (SELECT l_partkey, qs AS top_q FROM (
        |    SELECT l_partkey, qs,
        |      ROW_NUMBER() OVER (PARTITION BY l_partkey
        |        ORDER BY qs DESC, l_suppkey) AS rn
        |    FROM ps) WHERE rn = 1),
        |pf AS (SELECT pp.l_partkey, pp.qt, tp.top_q
        |  FROM pp JOIN tp ON tp.l_partkey = pp.l_partkey)
        |SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(CASE WHEN pf.top_q * 10 >= pf.qt * 9 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_single_sourced,
        |  CAST((SUM(CASE WHEN pf.top_q * 10 >= pf.qt * 9 THEN 1 ELSE 0 END)
        |      * 1000000) // COUNT(*) AS BIGINT) AS single_share_ppm,
        |  CAST(MAX((pf.top_q * 1000000) // pf.qt) AS BIGINT)
        |    AS max_top_share_ppm
        |FROM pf JOIN part p ON p.p_partkey = pf.l_partkey
        |GROUP BY 1 ORDER BY p.p_brand""".stripMargin,

    // XYZ variability classes: exact cross-multiplied CV cuts on
    // DECIMAL (4(WQ−S²) ≤ S² etc.), zero weeks through the global W
    // constant, 4-dp CV published only.
    "xyz_classification" ->
      """WITH bo AS (SELECT MIN(l_shipdate) AS d0, MAX(l_shipdate) AS d1
        |  FROM lineitem),
        |w AS (SELECT l_partkey,
        |    CAST(datediff('day', d0, l_shipdate) AS BIGINT) // 7 AS wk,
        |    CAST(datediff('day', d0, d1) AS BIGINT) // 7 + 1 AS nw,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem, bo),
        |g AS (SELECT l_partkey, wk, MAX(nw) AS nw,
        |    CAST(SUM(q) AS BIGINT) AS qw FROM w GROUP BY 1, 2),
        |pp AS (SELECT l_partkey, MAX(nw) AS nw,
        |    CAST(SUM(qw) AS DECIMAL(38,0)) AS s,
        |    SUM(CAST(qw AS DECIMAL(38,0)) * qw) AS qq
        |  FROM g GROUP BY 1),
        |c AS (SELECT l_partkey,
        |    CASE WHEN s = 0 THEN 'Z'
        |      WHEN 4 * (CAST(nw AS DECIMAL(38,0)) * qq - s * s) <= s * s
        |        THEN 'X'
        |      WHEN CAST(nw AS DECIMAL(38,0)) * qq - s * s <= s * s THEN 'Y'
        |      ELSE 'Z' END AS xyz_class,
        |    floor(sqrt(CAST(CAST(nw AS DECIMAL(38,0)) * qq - s * s
        |        AS DOUBLE))
        |      / NULLIF(CAST(s AS DOUBLE), 0.0) * 1e4 + 0.5) / 1e4 AS cv
        |  FROM pp),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM c)
        |SELECT xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST((COUNT(*) * 1000000) // MAX(t.np) AS BIGINT)
        |    AS part_share_ppm,
        |  MIN(cv) AS cv_min, MAX(cv) AS cv_max
        |FROM c, t GROUP BY 1 ORDER BY xyz_class""".stripMargin,

    // one integral division per rational term, joint = exact residual.
    "price_volume_mix" ->
      """WITH b AS (SELECT min(l_shipdate) AS mn, max(l_shipdate) AS mx
        |  FROM lineitem),
        |f AS (SELECT p.p_type,
        |    CASE WHEN l.l_shipdate <= CAST(CAST(b.mn AS DATE)
        |        + CAST(datediff('day', b.mn, b.mx) // 2 AS INTEGER)
        |        AS TIMESTAMP)
        |      THEN 0 ELSE 1 END AS period,
        |    CAST(l.l_quantity AS BIGINT) AS q,
        |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS r
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey, b),
        |c AS (SELECT p_type,
        |    CAST(SUM(CASE WHEN period = 0 THEN q ELSE 0 END) AS BIGINT) AS q0,
        |    CAST(SUM(CASE WHEN period = 1 THEN q ELSE 0 END) AS BIGINT) AS q1,
        |    SUM(CASE WHEN period = 0 THEN CAST(r AS HUGEINT) ELSE 0 END) AS r0,
        |    SUM(CASE WHEN period = 1 THEN CAST(r AS HUGEINT) ELSE 0 END) AS r1
        |  FROM f GROUP BY p_type),
        |e AS (SELECT p_type, q0, q1,
        |    CAST(r1 - r0 AS BIGINT) AS delta_cents,
        |    CAST((r1 * q0) // CAST(q1 AS HUGEINT) AS BIGINT)
        |      - CAST(r0 AS BIGINT) AS price_effect_cents,
        |    CAST((r0 * q1) // CAST(q0 AS HUGEINT) AS BIGINT)
        |      - CAST(r0 AS BIGINT) AS volume_effect_cents
        |  FROM c WHERE q0 > 0 AND q1 > 0)
        |SELECT *, delta_cents - price_effect_cents - volume_effect_cents
        |    AS joint_cents
        |FROM e ORDER BY p_type""".stripMargin,

    // Coordinated sampling: the same md5 predicate on both key-
    // coherent tables, an IN-list for the key-derived one, exact
    // ppm shares, orphan audits.
    "consistent_sample" ->
      """WITH ck AS (SELECT * FROM customer
        |  WHERE CAST(('0x' || substring(md5('smp:' || CAST(c_custkey AS VARCHAR)),
        |    1, 8)) AS BIGINT) % 100 < 5),
        |ok AS (SELECT * FROM orders
        |  WHERE CAST(('0x' || substring(md5('smp:' || CAST(o_custkey AS VARCHAR)),
        |    1, 8)) AS BIGINT) % 100 < 5),
        |lk AS (SELECT * FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM ok)),
        |r AS (
        |  SELECT 'customer' AS "table",
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS total_rows,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ck) AS kept_rows,
        |    CAST(0 AS BIGINT) AS fk_orphans
        |  UNION ALL SELECT 'orders',
        |    (SELECT COUNT(*) FROM orders), (SELECT COUNT(*) FROM ok),
        |    (SELECT COUNT(*) FROM ok
        |     WHERE o_custkey NOT IN (SELECT c_custkey FROM ck))
        |  UNION ALL SELECT 'lineitem',
        |    (SELECT COUNT(*) FROM lineitem), (SELECT COUNT(*) FROM lk),
        |    (SELECT COUNT(*) FROM lk
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM ok)))
        |SELECT "table", total_rows, kept_rows,
        |  CAST((kept_rows * 1000000) // NULLIF(total_rows, 0) AS BIGINT)
        |    AS kept_ppm,
        |  fk_orphans
        |FROM r ORDER BY "table"""".stripMargin,

    // Cliff's delta: mannwhitney's doubled-U grid, one division,
    // Romano'06 magnitude cutoffs on the rounded delta.
    "cliffs_delta" ->
      """WITH e AS (SELECT event_type,
        |        CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq,
        |        CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |          AS BIGINT) % 2 AS arm
        |      FROM events),
        |g AS (SELECT event_type, vq,
        |        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(SUM(c0) OVER (PARTITION BY event_type ORDER BY vq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c0
        |          AS BIGINT) AS below0,
        |        CAST(SUM(c0) OVER (PARTITION BY event_type) AS BIGINT) AS n0,
        |        CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1
        |      FROM g),
        |m AS (SELECT event_type, n0, n1,
        |        SUM(CAST(c1 AS HUGEINT) * (2 * below0 + c0)) AS u2
        |      FROM w WHERE n0 > 0 AND n1 > 0 GROUP BY 1, 2, 3),
        |r AS (SELECT event_type, n0, n1,
        |    floor(CAST(u2 - CAST(n0 AS HUGEINT) * n1 AS DOUBLE)
        |      / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |      AS delta
        |  FROM m)
        |SELECT event_type, n0, n1, delta,
        |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |       WHEN abs(delta) < 0.33 THEN 'small'
        |       WHEN abs(delta) < 0.474 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM r ORDER BY event_type""".stripMargin,

    // Pearson moments on integer grids via HUGEINT sums (Spark side:
    // decimal(38,0)); the only floats are the final sqrt/divide.
    // Midranks on the distinct-value frames (2·mid = 2·below+cnt+1),
    // centered by n+1 so Σc = 0 exactly; HUGEINT moments mirror the
    // Spark side's decimal(38,0).
    "spearman_matrix" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS p,
        |    CAST(floor(l_discount * 1e6) AS BIGINT) AS d
        |  FROM lineitem),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM li),
        |rq AS (SELECT q, 2 * (SUM(cnt) OVER (ORDER BY q) - cnt) + cnt
        |    - (SELECT n FROM nn) AS cq
        |  FROM (SELECT q, COUNT(*) AS cnt FROM li GROUP BY 1)),
        |rp AS (SELECT p, 2 * (SUM(cnt) OVER (ORDER BY p) - cnt) + cnt
        |    - (SELECT n FROM nn) AS cp
        |  FROM (SELECT p, COUNT(*) AS cnt FROM li GROUP BY 1)),
        |rd AS (SELECT d, 2 * (SUM(cnt) OVER (ORDER BY d) - cnt) + cnt
        |    - (SELECT n FROM nn) AS cd
        |  FROM (SELECT d, COUNT(*) AS cnt FROM li GROUP BY 1)),
        |j AS (SELECT cq, cp, cd FROM li
        |  JOIN rq USING (q) JOIN rp USING (p) JOIN rd USING (d)),
        |m AS (SELECT
        |    SUM(CAST(cq AS HUGEINT) * cq) AS sqq,
        |    SUM(CAST(cp AS HUGEINT) * cp) AS spp,
        |    SUM(CAST(cd AS HUGEINT) * cd) AS sdd,
        |    SUM(CAST(cq AS HUGEINT) * cp) AS sqp,
        |    SUM(CAST(cq AS HUGEINT) * cd) AS sqd,
        |    SUM(CAST(cp AS HUGEINT) * cd) AS spd
        |  FROM j),
        |r AS (SELECT (SELECT n FROM nn) AS n,
        |  floor(CAST(sqp AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE))
        |    * sqrt(CAST(spp AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS r_qp,
        |  floor(CAST(sqd AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE))
        |    * sqrt(CAST(sdd AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS r_qd,
        |  floor(CAST(spd AS DOUBLE) / (sqrt(CAST(spp AS DOUBLE))
        |    * sqrt(CAST(sdd AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS r_pd
        |  FROM m)
        |SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col, n, r_qp AS rho FROM r
        |UNION ALL
        |SELECT 'l_quantity', 'l_discount', n, r_qd FROM r
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_discount', n, r_pd FROM r
        |ORDER BY x_col, y_col""".stripMargin,

    "corr_matrix" ->
      """WITH g AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS p,
        |    CAST(floor(l_discount * 1e6) AS BIGINT) AS d
        |  FROM lineitem),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(CAST(q AS HUGEINT)) AS sq, SUM(CAST(p AS HUGEINT)) AS sp,
        |    SUM(CAST(d AS HUGEINT)) AS sd,
        |    SUM(CAST(q AS HUGEINT) * q) AS sqq,
        |    SUM(CAST(p AS HUGEINT) * p) AS spp,
        |    SUM(CAST(d AS HUGEINT) * d) AS sdd,
        |    SUM(CAST(q AS HUGEINT) * p) AS sqp,
        |    SUM(CAST(q AS HUGEINT) * d) AS sqd,
        |    SUM(CAST(p AS HUGEINT) * d) AS spd
        |  FROM g),
        |r AS (SELECT CAST(n AS BIGINT) AS n,
        |  floor(CAST(n * sqp - sq * sp AS DOUBLE)
        |    / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
        |       * sqrt(CAST(n * spp - sp * sp AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS r_qp,
        |  floor(CAST(n * sqd - sq * sd AS DOUBLE)
        |    / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
        |       * sqrt(CAST(n * sdd - sd * sd AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS r_qd,
        |  floor(CAST(n * spd - sp * sd AS DOUBLE)
        |    / (sqrt(CAST(n * spp - sp * sp AS DOUBLE))
        |       * sqrt(CAST(n * sdd - sd * sd AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    AS r_pd
        |  FROM m)
        |SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col, n, r_qp AS r FROM r
        |UNION ALL
        |SELECT 'l_quantity', 'l_discount', n, r_qd FROM r
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_discount', n, r_pd FROM r
        |ORDER BY x_col, y_col""".stripMargin,

    // Kendall τ-b: joint-distribution concordance algebra on the
    // bounded (q, d, t) triple grid; HUGEINT mass products, doubled
    // tie forms, two √ factors like corr_matrix. The OUTPUT mass
    // columns cast to BIGINT on BOTH sides: the internal algebra
    // stays HUGEINT/decimal(38,0) but a decimal-typed OUTPUT column
    // is the one value class the driver's fetch treats
    // inconsistently (r12/r13's only hash-red row, bit-identical on
    // local replay). C ~ n²/2 fits int64 to ~4.3·10⁹ input rows —
    // documented bound at the engine edge cast (Robust.scala).
    "kendall_matrix" ->
      """WITH base AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_discount * 1e6) AS BIGINT) AS d,
        |    CAST(floor(l_tax * 1e6) AS BIGINT) AS t
        |  FROM lineitem),
        |cube3 AS (SELECT q, d, t, CAST(COUNT(*) AS BIGINT) AS c3
        |  FROM base GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT 'l_quantity' AS xc, 'l_discount' AS yc, q AS x, d AS y,
        |      CAST(SUM(c3) AS BIGINT) AS c FROM cube3 GROUP BY 3, 4
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_tax', q, t, CAST(SUM(c3) AS BIGINT)
        |  FROM cube3 GROUP BY 3, 4
        |  UNION ALL
        |  SELECT 'l_discount', 'l_tax', d, t, CAST(SUM(c3) AS BIGINT)
        |  FROM cube3 GROUP BY 3, 4),
        |cd AS (SELECT a.xc, a.yc,
        |    SUM(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c
        |      ELSE 0 END) AS concordant,
        |    SUM(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c
        |      ELSE 0 END) AS discordant
        |  FROM grid a JOIN grid b
        |    ON a.xc = b.xc AND a.yc = b.yc AND a.x < b.x
        |  GROUP BY 1, 2),
        |xm AS (SELECT xc, yc, SUM(CAST(tx AS HUGEINT) * (tx - 1)) AS n1x2,
        |    CAST(SUM(tx) AS HUGEINT) AS n
        |  FROM (SELECT xc, yc, x, CAST(SUM(c) AS BIGINT) AS tx
        |        FROM grid GROUP BY 1, 2, 3) GROUP BY 1, 2),
        |ym AS (SELECT xc, yc, SUM(CAST(ty AS HUGEINT) * (ty - 1)) AS n2x2
        |  FROM (SELECT xc, yc, y, CAST(SUM(c) AS BIGINT) AS ty
        |        FROM grid GROUP BY 1, 2, 3) GROUP BY 1, 2)
        |SELECT cd.xc AS x_col, cd.yc AS y_col, CAST(xm.n AS BIGINT) AS n,
        |  CAST(cd.concordant AS BIGINT) AS concordant,
        |  CAST(cd.discordant AS BIGINT) AS discordant,
        |  floor(
        |    2.0 * CAST(cd.concordant - cd.discordant AS DOUBLE) /
        |    (sqrt(CAST(xm.n * (xm.n - 1) - xm.n1x2 AS DOUBLE))
        |      * sqrt(CAST(xm.n * (xm.n - 1) - ym.n2x2 AS DOUBLE)))
        |    * 1e6 + 0.5) / 1e6 AS tau_b
        |FROM cd JOIN xm ON cd.xc = xm.xc AND cd.yc = xm.yc
        |JOIN ym ON cd.xc = ym.xc AND cd.yc = ym.yc
        |ORDER BY x_col, y_col""".stripMargin,

    // t-closeness: dense group × bucket grid (absent buckets still
    // contribute), HUGEINT cross-product terms, one double division.
    "t_closeness" ->
      """WITH cells AS (SELECT c_mktsegment,
        |    CAST(c_nationkey AS INT) AS c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS cgs
        |  FROM customer GROUP BY 1, 2, 3),
        |g AS (SELECT c_mktsegment, c_nationkey, CAST(SUM(cgs) AS BIGINT) AS ng
        |  FROM cells GROUP BY 1, 2),
        |s AS (SELECT bal_bucket, CAST(SUM(cgs) AS BIGINT) AS cs
        |  FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(cs) AS BIGINT) AS n_total FROM s),
        |d AS (SELECT g.c_mktsegment, g.c_nationkey, g.ng, t.n_total, s.cs,
        |    COALESCE(c.cgs, 0) AS c_here
        |  FROM g CROSS JOIN s CROSS JOIN t
        |  LEFT JOIN cells c ON c.c_mktsegment = g.c_mktsegment
        |    AND c.c_nationkey = g.c_nationkey AND c.bal_bucket = s.bal_bucket),
        |f AS (SELECT c_mktsegment, c_nationkey, ng AS group_size, n_total,
        |    SUM(abs(CAST(c_here AS HUGEINT) * n_total
        |      - CAST(cs AS HUGEINT) * ng)) AS tsum
        |  FROM d GROUP BY 1, 2, 3, 4)
        |SELECT c_mktsegment, c_nationkey, group_size,
        |  floor(CAST(tsum AS DOUBLE) / (2.0 * CAST(group_size AS DOUBLE)
        |    * CAST(n_total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tvd,
        |  CAST(tsum AS DOUBLE) / (2.0 * CAST(group_size AS DOUBLE)
        |    * CAST(n_total AS DOUBLE)) > 0.2 AS risky
        |FROM f ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // Price indices vs the base month: exact cent own-weight sums,
    // 1e-4-cent-quantized cross terms, HUGEINT month sums, one
    // division per index, IEEE sqrt for Fisher.
    "fisher_price_index" ->
      """WITH per AS (SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ec,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 0),
        |bm AS (SELECT MIN(month) AS bm FROM per),
        |b AS (SELECT l_partkey, ec AS ec0, q AS q0 FROM per, bm WHERE month = bm),
        |cur AS (SELECT per.l_partkey, per.month, per.ec, per.q
        |  FROM per, bm WHERE month <> bm),
        |j AS (SELECT cur.month, cur.ec, cur.q, b.ec0, b.q0
        |  FROM cur JOIN b USING (l_partkey)),
        |a AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |    SUM(CAST(floor(CAST(ec AS DOUBLE) / CAST(q AS DOUBLE)
        |      * CAST(q0 AS DOUBLE) * 1e4 + 0.5) AS HUGEINT)) AS lnum,
        |    SUM(CAST(ec0 AS HUGEINT)) AS lden,
        |    SUM(CAST(ec AS HUGEINT)) AS pnum,
        |    SUM(CAST(floor(CAST(ec0 AS DOUBLE) / CAST(q0 AS DOUBLE)
        |      * CAST(q AS DOUBLE) * 1e4 + 0.5) AS HUGEINT)) AS pden
        |  FROM j GROUP BY 1)
        |SELECT month, n_parts,
        |  floor((CAST(lnum AS DOUBLE) / 1e4) / CAST(lden AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS laspeyres,
        |  floor(CAST(pnum AS DOUBLE) / (CAST(pden AS DOUBLE) / 1e4)
        |    * 1e6 + 0.5) / 1e6 AS paasche,
        |  floor(sqrt((CAST(lnum AS DOUBLE) / 1e4) / CAST(lden AS DOUBLE)
        |    * (CAST(pnum AS DOUBLE) / (CAST(pden AS DOUBLE) / 1e4)))
        |    * 1e6 + 0.5) / 1e6 AS fisher
        |FROM a ORDER BY month""".stripMargin,

    // Order-total reconciliation: exact 1e-4-cent integer pricing
    // identity per line, HUGEINT order sums, integer ppm divisions —
    // no doubles anywhere.
    "order_reconcile" ->
      """WITH per AS (SELECT l_orderkey AS o_orderkey,
        |    SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |      * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)) AS HUGEINT))
        |      AS recomp_q
        |  FROM lineitem GROUP BY 1),
        |a AS (SELECT o.o_orderstatus,
        |        CAST(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
        |          AS HUGEINT) * 10000 AS stated_q,
        |        per.recomp_q
        |      FROM orders o JOIN per USING (o_orderkey)),
        |d AS (SELECT o_orderstatus,
        |        CASE WHEN stated_q > 0
        |          THEN (abs(recomp_q - stated_q) * 1000000) // stated_q
        |          ELSE NULL END AS div_ppm
        |      FROM a)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN div_ppm > 10000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_over_1pct,
        |  CAST(SUM(div_ppm) // COUNT(div_ppm) AS BIGINT) AS mean_div_ppm,
        |  CAST(MAX(div_ppm) AS BIGINT) AS max_div_ppm
        |FROM d GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    // Q17 shape: small = 5·q·n < Σq exact cross-multiplication, cents
    // revenue, integer ppm share.
    "small_order_revenue" ->
      """WITH l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ec
        |  FROM lineitem),
        |pp AS (SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS sumq,
        |    CAST(COUNT(*) AS BIGINT) AS nq FROM l GROUP BY 1),
        |j AS (SELECT p.p_brand, l.ec, (l.q * 5 * pp.nq < pp.sumq) AS small
        |  FROM l JOIN pp USING (l_partkey)
        |  JOIN part p ON p.p_partkey = l.l_partkey)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN small THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        |  CAST(SUM(CASE WHEN small THEN ec ELSE 0 END) AS BIGINT)
        |    AS small_revenue_cents,
        |  CAST((SUM(CASE WHEN small THEN CAST(ec AS HUGEINT) ELSE 0 END)
        |    * 1000000) // SUM(CAST(ec AS HUGEINT)) AS BIGINT)
        |    AS small_share_ppm
        |FROM j GROUP BY 1 ORDER BY p_brand""".stripMargin,

    // Q22 shape: above-positive-average balance by exact cross-mult,
    // NOT EXISTS against the 30-day recent-order set ≡ the operator's
    // left-anti join.
    "idle_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
        |  FROM customer),
        |ps AS (SELECT SUM(CAST(bal AS HUGEINT)) AS pos_sum,
        |    CAST(COUNT(*) AS BIGINT) AS pos_n FROM c WHERE bal > 0),
        |bo AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
        |recent AS (SELECT DISTINCT o_custkey FROM orders, bo
        |  WHERE CAST(o_orderdate AS DATE) >= md - 30),
        |rich AS (SELECT c.* FROM c, ps
        |  WHERE CAST(bal AS HUGEINT) * pos_n > pos_sum),
        |idle AS (SELECT r.* FROM rich r WHERE NOT EXISTS
        |  (SELECT 1 FROM recent o WHERE o.o_custkey = r.c_custkey))
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_idle,
        |  CAST(SUM(bal) AS BIGINT) AS idle_balance_cents
        |FROM idle GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    // TPC-H Q1 on exact integer grids: cent sums, 1e-2/1e-4-cent
    // discount/charge units, integer-division averages.
    "pricing_summary" ->
      """WITH bo AS (SELECT max(CAST(l_shipdate AS DATE)) AS md FROM lineitem),
        |l AS (SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep_c,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d_pct,
        |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t_pct
        |  FROM lineitem, bo WHERE CAST(l_shipdate AS DATE) <= md - 90)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(q) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ep_c AS HUGEINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(ep_c * (100 - d_pct) AS HUGEINT)) AS BIGINT)
        |    AS sum_disc_c100,
        |  CAST(SUM(CAST(ep_c * (100 - d_pct) * (100 + t_pct) AS HUGEINT))
        |    AS BIGINT) AS sum_charge_c10000,
        |  CAST((SUM(q) * 1000) // COUNT(*) AS BIGINT) AS avg_qty_milli,
        |  CAST(SUM(CAST(ep_c AS HUGEINT)) // COUNT(*) AS BIGINT)
        |    AS avg_price_cents,
        |  CAST((SUM(d_pct) * 100) // COUNT(*) AS BIGINT) AS avg_disc_bp,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Q14 shape: promo net-revenue share on the exact 1e-2-cent grid.
    "promotion_effect" ->
      """WITH l AS (SELECT l_partkey AS p_partkey,
        |    strftime(l_shipdate, '%Y-%m') AS month,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |      AS net_q
        |  FROM lineitem),
        |j AS (SELECT l.month, l.net_q, p.p_type = 'PROMO' AS is_promo
        |  FROM l JOIN part p USING (p_partkey))
        |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN is_promo THEN CAST(net_q AS HUGEINT)
        |    ELSE 0 END) AS BIGINT) AS promo_rev_c100,
        |  CAST(SUM(CAST(net_q AS HUGEINT)) AS BIGINT) AS total_rev_c100,
        |  CAST((SUM(CASE WHEN is_promo THEN CAST(net_q AS HUGEINT)
        |      ELSE 0 END) * 1000000)
        |    // SUM(CAST(net_q AS HUGEINT)) AS BIGINT) AS promo_share_ppm
        |FROM j GROUP BY 1 ORDER BY month""".stripMargin,

    // Q13 shape: zero-inclusive count-of-counts via the LEFT join.
    "orders_per_customer_dist" ->
      """WITH pc AS (SELECT o_custkey AS c_custkey,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1)
        |SELECT COALESCE(pc.n_orders, 0) AS n_orders,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer c LEFT JOIN pc USING (c_custkey)
        |GROUP BY 1 ORDER BY n_orders""".stripMargin,

    // Q2 shape: realized unit cost per (part, supplier), window MIN
    // over EUROPE suppliers of STANDARD parts keeps ties, top-100 by
    // acctbal DESC on a total tie-break.
    "min_cost_supplier" ->
      """WITH uc AS (SELECT l_partkey, l_suppkey,
        |    SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      // SUM(CAST(l_quantity AS BIGINT)) AS unit_cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |es AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |j AS (SELECT es.s_acctbal, es.s_name, es.n_name, p.p_partkey,
        |    CAST(p.p_size AS BIGINT) AS p_size, uc.unit_cost_cents,
        |    MIN(uc.unit_cost_cents)
        |      OVER (PARTITION BY p.p_partkey) AS min_cost
        |  FROM uc
        |  JOIN es ON uc.l_suppkey = es.s_suppkey
        |  JOIN part p ON uc.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'STANDARD')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_size,
        |  CAST(unit_cost_cents AS BIGINT) AS unit_cost_cents
        |FROM j WHERE unit_cost_cents = min_cost
        |ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100""".stripMargin,

    // Q9 shape: realized-vs-list margin per supplier nation x ship
    // year, both legs on the 1e-2-cent grid, share in basis points.
    "nation_profit" ->
      """WITH l AS (SELECT l_partkey, l_suppkey,
        |    CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
        |    CAST(l_quantity AS BIGINT) AS units,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |      AS net_c100
        |  FROM lineitem),
        |j AS (SELECT n.n_name, l.ship_year,
        |    CAST(l.net_c100 AS HUGEINT) AS net_c100,
        |    CAST(l.units AS HUGEINT)
        |      * CAST(floor(p.p_retailprice * 100 + 0.5) AS HUGEINT)
        |      * 100 AS list_c100
        |  FROM l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |SELECT n_name, ship_year,
        |  CAST(SUM(net_c100) AS BIGINT) AS revenue_c100,
        |  CAST(SUM(list_c100) AS BIGINT) AS list_c100,
        |  CAST(SUM(net_c100) - SUM(list_c100) AS BIGINT) AS margin_c100,
        |  CAST(((SUM(net_c100) - SUM(list_c100)) * 10000)
        |    // SUM(net_c100) AS BIGINT) AS margin_bp
        |FROM j GROUP BY 1, 2 ORDER BY n_name, ship_year""".stripMargin,

    // Q11 shape: per-part shipped value of NATION_7's suppliers,
    // keep parts above 0.05% of the nation total (value*2000 > total).
    "important_parts" ->
      """WITH v AS (SELECT l.l_partkey,
        |    SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |      AS HUGEINT)) AS value
        |  FROM lineitem l
        |  WHERE l.l_suppkey IN (SELECT s_suppkey FROM supplier s
        |    JOIN nation n ON s.s_nationkey = n.n_nationkey
        |    WHERE n.n_name = 'NATION_7')
        |  GROUP BY 1),
        |t AS (SELECT SUM(value) AS total FROM v)
        |SELECT v.l_partkey AS p_partkey,
        |  CAST(v.value AS BIGINT) AS value_c100,
        |  CAST((v.value * 1000000) // t.total AS BIGINT) AS share_ppm
        |FROM v, t WHERE v.value * 2000 > t.total
        |ORDER BY value_c100 DESC, p_partkey""".stripMargin,

    // Q12 shape: FAST (<=30d order-to-ship) vs SLOW lines, urgent/high
    // priorities vs the rest, per ship year.
    "priority_ship_mix" ->
      """SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
        |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) <= 30
        |    THEN 'FAST' ELSE 'SLOW' END AS speed_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2 ORDER BY ship_year, speed_class""".stripMargin,

    // Q16 shape: distinct suppliers per (brand, type, size), one brand
    // excluded, deficit-book suppliers anti-joined out, 8 sizes.
    "part_supplier_variety" ->
      """SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
        |  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#13'
        |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l.l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q20 shape: ASIA suppliers who shipped >half of a small-prefix
    // part's total 1997 volume.
    "excess_shippers" ->
      """WITH q AS (SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem
        |  WHERE year(CAST(l_shipdate AS DATE)) = 1997
        |    AND l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY 1, 2),
        |w AS (SELECT l_suppkey, q,
        |    SUM(q) OVER (PARTITION BY l_partkey) AS total_q FROM q)
        |SELECT s.s_name, s.s_acctbal
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND s.s_suppkey IN (SELECT DISTINCT l_suppkey FROM w
        |    WHERE q * 2 > total_q)
        |ORDER BY s_name""".stripMargin,

    // Reorder point / safety stock per brand: centi-quantity daily
    // demand zero-filled over the global ship-date span, exact
    // HUGEINT moments (mirrors Spark's decimal(38,0)), one fixed
    // double chain with z = 1.645 and L = 7.
    "reorder_point" ->
      """WITH daily AS (SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
        |    CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS d
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |grid AS (SELECT t.p_brand, CAST(g.gs AS DATE) AS day
        |  FROM (SELECT DISTINCT p_brand FROM daily) t,
        |       (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gs
        |        FROM b) g),
        |dense AS (SELECT grid.p_brand, COALESCE(daily.d, 0) AS d
        |  FROM grid LEFT JOIN daily
        |    ON grid.p_brand = daily.p_brand AND grid.day = daily.day),
        |agg AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(CAST(d AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS ss
        |  FROM dense GROUP BY 1),
        |c AS (SELECT p_brand, n_days,
        |    CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_c,
        |    sqrt((CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      / CAST(n_days - 1 AS DOUBLE)) AS sd_c
        |  FROM agg WHERE n_days > 1)
        |SELECT p_brand, n_days,
        |  floor(mean_c / 100.0 * 1e6 + 0.5) / 1e6 AS mean_daily,
        |  floor(sd_c / 100.0 * 1e6 + 0.5) / 1e6 AS sd_daily,
        |  floor(1.645 * sd_c * sqrt(7.0) / 100.0 * 1e6 + 0.5) / 1e6
        |    AS safety_stock,
        |  floor((mean_c * 7.0 + 1.645 * sd_c * sqrt(7.0)) / 100.0 * 1e6 + 0.5)
        |    / 1e6 AS reorder_point
        |FROM c ORDER BY p_brand""".stripMargin,
  )
}
