package graft.oracles

/** SQL fragments shared by several oracle families (CTEs, unrolled
  * iteration blocks, the quality-score expression) — moved verbatim
  * from SparkEntry in the round-9 registry split. */
private[graft] object OracleFragments {

  /** Shared CTE prefix for the two shingle-set oracles
    * (jaccard_pairs, dedup_components): normalization + tokenization
    * + distinct token-3-gram shingle sets, kept in ONE place so a
    * tokenization fix can't silently desynchronize them.
    * lower(nfc_normalize(..)) mirrors NormalizeText (NFC then simple
    * casefold); regexp_replace (not space-only trim) mirrors the byte
    * scanner on leading/trailing non-space whitespace. */
  /** Standalone oracle for the brute-force cosine top-k; also nested
    * as the exact side of [[oracleSql]]'s `ann_recall` — one string so
    * the recall oracle can never drift from the knn oracle. */
  val KnnTopkSql: String =
    """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
      |           FROM embeddings WHERE vec_id < 8),
      |n AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS n_emb FROM embeddings),
      |s AS (SELECT q_id, n_id, ROUND(list_cosine_similarity(q_emb, n_emb), 6) AS score
      |      FROM q, n WHERE q_id <> n_id),
      |r AS (SELECT q_id, n_id, score,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS INT) AS rank
      |      FROM s)
      |SELECT q_id, n_id, score, rank FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** [[AnnIvfSql]] with the probe count as a parameter — the sweep
    * oracle walks it; the registered ann_ivf pins nprobe = 2. */
  def annIvfSqlAt(nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |c AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 16),
      |sc AS (SELECT e.vec_id, e.emb, c.c_id,
      |         ROUND(list_cosine_similarity(e.emb, c.c_emb), 6) AS cs
      |       FROM e, c),
      |cellr AS (SELECT vec_id, emb, c_id,
      |            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
      |          FROM sc),
      |cell AS (SELECT vec_id AS n_id, emb AS n_emb, c_id FROM cellr WHERE rn = 1),
      |qc AS (SELECT vec_id AS q_id, emb AS q_emb, c_id
      |       FROM cellr WHERE rn <= $nprobe AND vec_id < 8),
      |s AS (SELECT q_id, n_id, ROUND(list_cosine_similarity(q_emb, n_emb), 6) AS score
      |      FROM qc JOIN cell USING (c_id) WHERE q_id <> n_id),
      |r AS (SELECT q_id, n_id, score,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS INT) AS rank
      |      FROM s)
      |SELECT q_id, n_id, score, rank FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Standalone oracle for the IVF ANN; nested as the approximate side
    * of `ann_recall` (same single-string rationale as [[KnnTopkSql]]). */
  val AnnIvfSql: String = annIvfSqlAt(2)

  /** nprobe sweep: four legs of the recall compare, each nesting the
    * SAME knn/ivf oracle strings — micro-averaged exact-ppm recall. */
  val NprobeSweepSql: String = {
    def leg(np: Int): String =
      s"""SELECT $np AS nprobe, CAST(COUNT(*) AS BIGINT) AS k_total,
        |  CAST(SUM(COALESCE(ap.hit, 0)) AS BIGINT) AS hits,
        |  CAST((SUM(COALESCE(ap.hit, 0)) * 1000000) // NULLIF(COUNT(*), 0)
        |    AS BIGINT) AS recall_ppm
        |FROM (SELECT q_id, n_id FROM ($KnnTopkSql)) ex
        |LEFT JOIN (SELECT q_id, n_id, CAST(1 AS BIGINT) AS hit
        |           FROM (${annIvfSqlAt(np)})) ap
        |  USING (q_id, n_id)""".stripMargin
    (1 to 4).map(leg).mkString("", "\nUNION ALL\n", "\nORDER BY nprobe")
  }

  /** IVF cell-balance audit: the AnnIvfSql assignment CTEs verbatim,
    * HUGEINT imbalance factor, interpolated median on the cell frame. */
  val IvfBalanceSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |c AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 16),
      |sc AS (SELECT e.vec_id, c.c_id,
      |         ROUND(list_cosine_similarity(e.emb, c.c_emb), 6) AS cs
      |       FROM e, c),
      |cellr AS (SELECT vec_id, c_id,
      |            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
      |          FROM sc),
      |g AS (SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM cellr WHERE rn = 1 GROUP BY c_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_used,
      |  CAST(SUM(n) AS BIGINT) AS n_vectors,
      |  CAST((SUM(CAST(n AS HUGEINT) * n) * 16 * 1000000)
      |    // (CAST(SUM(n) AS HUGEINT) * SUM(n)) AS BIGINT) AS imbalance_ppm,
      |  CAST(MAX(n) AS BIGINT) AS max_cell,
      |  CAST(quantile_cont(n, 0.5) AS DOUBLE) AS p50_cell
      |FROM g""".stripMargin

  /** Standalone oracle for the n-gram language detector; also nested
    * as the prediction side of `lang_confusion` (and, with `source`
    * carried through, of `cohen_kappa`) — one builder, no drift
    * (same pattern as [[KnnTopkSql]]). `extraCols` is a leading-comma
    * column list threaded through every CTE (e.g. ", source"). */
  def langIdSqlWith(extraCols: String): String =
    s"""WITH t AS (
      |  SELECT doc_id, lang$extraCols, regexp_split_to_array(lower(text), '\\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang$extraCols,
      |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','you','that'))) AS s_en,
      |    len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','ser','se','no'))) AS s_es,
      |    len(list_filter(toks, x -> x IN ('der','die','und','in','den','von','zu','das','mit','sich'))) AS s_de,
      |    len(list_filter(toks, x -> x IN ('le','la','de','et','les','des','est','un','une','que'))) AS s_fr,
      |    len(list_filter(toks, x -> x IN ('的','一','是','不','了','人','我','在','有','他'))) AS s_zh
      |  FROM t),
      |m AS (SELECT *, greatest(s_en, s_es, s_de, s_fr, s_zh) AS best FROM s)
      |SELECT doc_id, lang$extraCols,
      |  CASE WHEN best = 0 THEN 'und'
      |       WHEN s_zh = best THEN 'zh'
      |       WHEN s_fr = best THEN 'fr'
      |       WHEN s_es = best THEN 'es'
      |       WHEN s_en = best THEN 'en'
      |       ELSE 'de' END AS pred_lang
      |FROM m ORDER BY doc_id""".stripMargin

  val LangIdSql: String = langIdSqlWith("")

  /** `src` parametrizes the document set: "documents" for the whole
    * corpus, a prior CTE name for staged pipelines (dedup_cascade
    * shingles only exact-dedup survivors). */
  def shingleSetsCteOn(src: String): String =
    s"""toks AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(
      |      regexp_replace(lower(nfc_normalize(text)), '^\\s+|\\s+$$', '', 'g'), '\\s+') AS t
      |  FROM $src),
      |sh AS (SELECT doc_id,
      |         list_distinct(CASE WHEN len(t) >= 3
      |           THEN list_transform(generate_series(1, len(t) - 2),
      |                  i -> array_to_string(t[i:i+2], ' '))
      |           ELSE t END) AS s
      |       FROM toks)""".stripMargin

  val ShingleSetsCte: String = shingleSetsCteOn("documents")

  /** The quality-score expression shared by the quality_score,
    * corpus_clean, and lang_quality_gate oracles — one copy, like
    * [[ShingleSetsCte]]. Rounding is floor(x·1e4 + 0.5)/1e4 (matching
    * TextF.round4HalfUp): pure IEEE ops agree across engines even when
    * the score lands exactly on a half-way double, where built-in
    * round()s diverge (three sf0.1 docs hit this). */
  val QualitySqlExpr: String =
    """floor((
      |      LEAST(CAST(length(text) AS DOUBLE) / 200.0, 1.0) +
      |      (1.0 - ABS(
      |        CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                             t -> t IN ('the','a'))) AS DOUBLE) /
      |        NULLIF(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 0.0)
      |        - 0.15)) +
      |      (1.0 - LEAST(
      |        CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) /
      |        NULLIF(CAST(length(text) AS DOUBLE), 0.0) * 10, 1.0))
      |    ) / 3.0 * 1e4 + 0.5) / 1e4""".stripMargin

  /** Unrolled integer-exact PageRank oracle (10 iterations, damping
    * 0.85, 1e12 mass scale — [[graft.operators.Graph.Scale]]). Each
    * step is the SAME truncating-integer-division arithmetic the Spark
    * loop runs, so ranks are bit-exact. Unrolled chained CTEs rather
    * than WITH RECURSIVE: DuckDB permits only limited references to
    * the recursive table in the recursive term, and an aggregation
    * over it inside a derived table silently mis-evaluates (verified:
    * the recursive form diverged from a driver-side simulation; the
    * unrolled form matches it exactly). */
  val PagerankSql: String = {
    val step = (k: Int) => s"""it$k AS (
      |  SELECT n2.item,
      |    CAST(15000000000000 // (100 * (SELECT nn FROM n))
      |      + (85 * COALESCE(fl.inflow, 0)) // 100 AS BIGINT) AS rq
      |  FROM nodes n2 LEFT JOIN (
      |    SELECT e.dst, CAST(SUM((CAST(p.rq AS HUGEINT) * e.w) // o.ow) AS BIGINT) AS inflow
      |    FROM it${k - 1} p JOIN e ON e.src = p.item JOIN outw o ON o.src = p.item
      |    GROUP BY 1) fl ON fl.dst = n2.item)""".stripMargin
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
      |nodes AS (SELECT DISTINCT src AS item FROM e UNION SELECT DISTINCT dst FROM e),
      |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM e GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nodes),
      |it0 AS (SELECT item, CAST(1000000000000 // (SELECT nn FROM n) AS BIGINT) AS rq
      |        FROM nodes),
      |""".stripMargin +
      (1 to 10).map(step).mkString(",\n") + """
      |SELECT item, rq,
      |  floor(CAST(rq AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS pr
      |FROM it10 ORDER BY item""".stripMargin
  }

  /** Unrolled 2-iteration HITS (same unroll-not-recurse rationale as
    * [[PagerankSql]]): integer h·w / a·w aggregates, truncating-div
    * renormalization `x // greatest(1, Σx // 1e9)` — the overflow-safe
    * rearrangement [[graft.operators.Graph.hitsOf]] documents; `//`
    * and Spark's `div` agree on the non-negative domain. */
  val HitsSql: String = {
    def half(outT: String, inT: String, joinK: String, groupK: String,
             c: String, raw: String): String =
      s"""${outT}r AS (
        |  SELECT e.$groupK, CAST(SUM(p.$c * e.w) AS BIGINT) AS x
        |  FROM $inT p JOIN e ON e.$joinK = p.item GROUP BY 1),
        |${outT}n AS (
        |  SELECT n2.item, COALESCE(x, 0) AS $raw
        |  FROM nodes n2 LEFT JOIN ${outT}r ON ${outT}r.$groupK = n2.item),
        |$outT AS (
        |  SELECT item, CAST($raw // greatest(1,
        |    (SELECT SUM($raw) FROM ${outT}n) // 1000000000) AS BIGINT) AS $raw
        |  FROM ${outT}n)""".stripMargin
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
      |nodes AS (SELECT DISTINCT src AS item FROM e UNION SELECT DISTINCT dst FROM e),
      |h0 AS (SELECT item, CAST(1000000000 AS BIGINT) AS hq FROM nodes),
      |""".stripMargin +
      Seq(
        half("a1", "h0", "src", "dst", "hq", "aq"),
        half("h1", "a1", "dst", "src", "aq", "hq"),
        half("a2", "h1", "src", "dst", "hq", "aq"),
        half("h2", "a2", "dst", "src", "aq", "hq")).mkString(",\n") + """
      |SELECT h2.item, h2.hq, a2.aq,
      |  floor(CAST(h2.hq AS DOUBLE) / 1e9 * 1e4 + 0.5) / 1e4 AS hub,
      |  floor(CAST(a2.aq AS DOUBLE) / 1e9 * 1e4 + 0.5) / 1e4 AS authority
      |FROM h2 JOIN a2 USING (item) ORDER BY h2.item""".stripMargin
  }

  /** Unrolled 2-iteration synchronous LPA ([[HitsSql]]'s rationale):
    * undirected weighted item graph, integer vote sums, argmax ties
    * to the smallest label. */
  /** The LPA CTE chain (weighted undirected graph + 2 vote rounds),
    * shared by the lpa_communities oracle and the modularity oracle
    * that scores its partition — one text so they can never disagree
    * on the graph or the labels. */
  val LpaCtes: String = {
    def step(k: Int): String =
      s"""v$k AS (
        |  SELECT adj.u, l.label, CAST(SUM(adj.w) AS BIGINT) AS vw
        |  FROM adj JOIN l${k - 1} l ON l.item = adj.v GROUP BY 1, 2),
        |l$k AS (
        |  SELECT u AS item, label FROM (
        |    SELECT u, label,
        |      ROW_NUMBER() OVER (PARTITION BY u ORDER BY vw DESC, label) AS rn
        |    FROM v$k) WHERE rn = 1)""".stripMargin
    """WITH base AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
      |  FROM events),
      |tr AS (
      |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
      |         item AS dst
      |  FROM base),
      |und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM tr WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
      |adj AS (SELECT a AS u, b AS v, w FROM und
      |        UNION ALL SELECT b, a, w FROM und),
      |l0 AS (SELECT item, item AS label
      |       FROM (SELECT DISTINCT u AS item FROM adj)),
      |""".stripMargin +
      Seq(step(1), step(2)).mkString(",\n")
  }

  val LpaSql: String = LpaCtes + """
    |SELECT item, label FROM l2 ORDER BY item""".stripMargin

  /** Unrolled 12-iteration max-normalized eigenvector power
    * iteration on A + I over the weighted undirected graph (the
    * [[LpaCtes]] base/tr/und/adj derivation verbatim;
    * unroll-not-recurse per [[PagerankSql]]'s rationale). HUGEINT
    * products, truncating `//` normalization — `//` and Spark's
    * `div` agree on the non-negative domain; MAX(s) > 0 by the
    * argmax-holds-10⁶ induction the engine scaladoc states. */
  val EigenvectorSql: String = {
    // single-reference discipline: each it{k-1} is referenced ONCE
    // (the +I shift rides a unit self-loop in adjx instead of a
    // second join) and the max is a window over s$k, not a
    // subquery — a CTE-inlining engine would otherwise recompute
    // the whole chain per extra reference, exponentially.
    def step(k: Int): String =
      s"""s$k AS (SELECT adjx.u, SUM(CAST(adjx.w AS HUGEINT) * r.rq) AS s
        |  FROM adjx JOIN it${k - 1} r ON r.item = adjx.v GROUP BY 1),
        |it$k AS (SELECT u AS item,
        |  CAST((s * 1000000) // MAX(s) OVER () AS HUGEINT) AS rq
        |  FROM s$k)""".stripMargin
    """WITH base AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
      |  FROM events),
      |tr AS (
      |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
      |         item AS dst
      |  FROM base),
      |und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM tr WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
      |adj AS (SELECT a AS u, b AS v, w FROM und
      |        UNION ALL SELECT b, a, w FROM und),
      |adjx AS (SELECT u, v, w FROM adj
      |         UNION ALL SELECT DISTINCT u, u AS v, CAST(1 AS BIGINT) AS w
      |                   FROM adj),
      |it0 AS (SELECT DISTINCT u AS item, CAST(1000000 AS HUGEINT) AS rq
      |        FROM adj),
      |""".stripMargin +
      (1 to 12).map(step).mkString(",\n") + """
      |SELECT item, CAST(rq AS BIGINT) AS score_ppm,
      |  CAST(rq AS DOUBLE) / 1e6 AS score
      |FROM it12 ORDER BY item""".stripMargin
  }

  /** Newman Q of the LPA partition: integer-polynomial form
    * (4m·W_in − Σd_c²)/4m², one division, 6-dp directed half-up. */
  val ModularitySql: String = LpaCtes + """,
    |m AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM und),
    |win AS (SELECT CAST(COALESCE(SUM(u.w), 0) AS BIGINT) AS w_in
    |  FROM und u JOIN l2 x ON x.item = u.a JOIN l2 y ON y.item = u.b
    |  WHERE x.label = y.label),
    |deg AS (SELECT adj.u, CAST(SUM(adj.w) AS BIGINT) AS d
    |        FROM adj GROUP BY 1),
    |dc AS (SELECT l.label, CAST(SUM(d.d) AS BIGINT) AS dcw
    |       FROM deg d JOIN l2 l ON l.item = d.u GROUP BY 1),
    |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
    |        CAST(SUM(dcw * dcw) AS BIGINT) AS sdc2 FROM dc),
    |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
    |SELECT n_nodes, n_communities, m.m AS m_weight,
    |  floor(CAST(4 * m.m * win.w_in - s.sdc2 AS DOUBLE)
    |    / CAST(4 * m.m * m.m AS DOUBLE) * 1e6 + 0.5) / 1e6 AS modularity
    |FROM nn, s, m, win""".stripMargin

  /** Unrolled 3-hop BFS from the max-degree hub over the DISTINCT
    * undirected graph (KcoreSql's e/adj derivation verbatim). */
  val KhopReachSql: String = {
    def hop(k: Int): String =
      s"""f$k AS (SELECT DISTINCT adj.v AS item
        |  FROM adj JOIN f${k - 1} f ON adj.u = f.item
        |  WHERE adj.v NOT IN (SELECT item FROM r${k - 1})),
        |r$k AS (SELECT item FROM r${k - 1} UNION SELECT item FROM f$k)""".stripMargin
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
      |f0 AS (SELECT u AS item FROM (
      |    SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1)
      |  ORDER BY deg DESC, u LIMIT 1),
      |r0 AS (SELECT item FROM f0),
      |""".stripMargin +
      (1 to 3).map(hop).mkString(",\n") + """
      |SELECT CAST(0 AS INT) AS hop,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f0) AS frontier_size,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM r0) AS reached_total
      |UNION ALL SELECT 1, (SELECT COUNT(*) FROM f1), (SELECT COUNT(*) FROM r1)
      |UNION ALL SELECT 2, (SELECT COUNT(*) FROM f2), (SELECT COUNT(*) FROM r2)
      |UNION ALL SELECT 3, (SELECT COUNT(*) FROM f3), (SELECT COUNT(*) FROM r3)
      |ORDER BY hop""".stripMargin
  }

  /** Unrolled greedy MMR oracle (pool 20, k = 5, λ = 7/10 as integer
    * weights — [[graft.operators.Similarity.mmrRerankOf]]'s exact
    * arithmetic). Same unroll-not-recurse rationale as
    * [[PagerankSql]]. */
  val MmrRerankSql: String = {
    val step = (k: Int) => s"""pick$k AS (
      |  SELECT q_id, $k AS rank, n_id, rel6, score FROM (
      |    SELECT c.q_id, c.n_id, c.rel6, c.rel6 * 7 - m.ms * 3 AS score,
      |      ROW_NUMBER() OVER (PARTITION BY c.q_id
      |        ORDER BY c.rel6 * 7 - m.ms * 3 DESC, c.n_id) AS rn
      |    FROM cand c
      |    JOIN (SELECT ps.q_id, ps.a_id, CAST(MAX(ps.sim6) AS BIGINT) AS ms
      |          FROM ps JOIN sel${k - 1} s ON s.q_id = ps.q_id AND s.n_id = ps.b_id
      |          GROUP BY 1, 2) m ON m.q_id = c.q_id AND m.a_id = c.n_id
      |    LEFT JOIN sel${k - 1} s2 ON s2.q_id = c.q_id AND s2.n_id = c.n_id
      |    WHERE s2.n_id IS NULL)
      |  WHERE rn = 1),
      |sel$k AS (SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM pick$k)""".stripMargin
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 8),
      |sc AS (SELECT q_id, e.vec_id AS n_id, e.emb,
      |    CAST(floor(list_cosine_similarity(q_emb, e.emb) * 1e6 + 0.5) AS BIGINT) AS rel6
      |  FROM q JOIN e ON e.vec_id <> q.q_id),
      |cand AS (SELECT q_id, n_id, emb, rel6 FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel6 DESC, n_id) AS rn
      |    FROM sc) WHERE rn <= 20),
      |ps AS (SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
      |    CAST(floor(list_cosine_similarity(a.emb, b.emb) * 1e6 + 0.5) AS BIGINT) AS sim6
      |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
      |sel1 AS (SELECT q_id, 1 AS rank, n_id, rel6, rel6 * 7 AS score FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel6 DESC, n_id) AS rn
      |    FROM cand) WHERE rn = 1),
      |""".stripMargin +
      (2 to 5).map(step).mkString(",\n") + """
      |SELECT q_id, rank, n_id, CAST(rel6 AS DOUBLE) / 1e6 AS rel,
      |  CAST(score AS DOUBLE) / 1e7 AS mmr
      |FROM sel5 ORDER BY q_id, rank""".stripMargin
  }

  /** nDCG oracle sharing [[graft.operators.Similarity.NdcgW6]]'s
    * precomputed integer discounts verbatim — no query-time log₂ in
    * either engine. */
  val NdcgEvalSql: String = {
    val w = graft.operators.Similarity.NdcgW6
    val wList = w.mkString("[", ", ", "]")
    val cumList = w.scanLeft(0L)(_ + _).tail.mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
      |           FROM embeddings),
      |q AS (SELECT vec_id AS q_id, emb AS q_emb, label AS q_label
      |      FROM e WHERE vec_id < 64),
      |s AS (SELECT q_id, q_label, e.vec_id AS n_id, e.label AS n_label,
      |        ROUND(list_cosine_similarity(q_emb, e.emb), 6) AS cos
      |      FROM q JOIN e ON e.vec_id <> q.q_id),
      |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |        ORDER BY cos DESC, n_id) AS INT) AS rnk FROM s),
      |d AS (SELECT q_id, q_label,
      |        CAST(SUM(CASE WHEN n_label = q_label THEN ($wList)[rnk]
      |                 ELSE 0 END) AS BIGINT) AS dcg6
      |      FROM r WHERE rnk <= 10 GROUP BY 1, 2),
      |nr AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM s
      |       WHERE n_label = q_label GROUP BY 1),
      |p AS (SELECT d.q_id, d.q_label,
      |        CAST(floor(CAST(dcg6 AS DOUBLE)
      |          / CAST(($cumList)[CAST(least(n_rel, 10) AS INT)] AS DOUBLE)
      |          * 1e6 + 0.5) AS BIGINT) AS ndcg6
      |      FROM d JOIN nr ON nr.q_id = d.q_id)
      |SELECT CAST(q_label AS INT) AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  floor(CAST(SUM(ndcg6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5) / 1e6 AS ndcg
      |FROM p GROUP BY q_label ORDER BY label""".stripMargin
  }

  /** Personalized-PageRank oracle: [[PagerankSql]]'s unrolled steps
    * with the teleport term seed-conditional (items < 10) and the
    * initial mass on the seeds only. */
  val PprSql: String = {
    val step = (k: Int) => s"""it$k AS (
      |  SELECT n2.item,
      |    CAST(CASE WHEN n2.item < 10
      |        THEN 15000000000000 // (100 * (SELECT ns FROM n))
      |        ELSE 0 END
      |      + (85 * COALESCE(fl.inflow, 0)) // 100 AS BIGINT) AS rq
      |  FROM nodes n2 LEFT JOIN (
      |    SELECT e.dst, CAST(SUM((CAST(p.rq AS HUGEINT) * e.w) // o.ow) AS BIGINT) AS inflow
      |    FROM it${k - 1} p JOIN e ON e.src = p.item JOIN outw o ON o.src = p.item
      |    GROUP BY 1) fl ON fl.dst = n2.item)""".stripMargin
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
      |nodes AS (SELECT DISTINCT src AS item FROM e UNION SELECT DISTINCT dst FROM e),
      |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM e GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM nodes WHERE item < 10),
      |it0 AS (SELECT item, CAST(CASE WHEN item < 10
      |          THEN 1000000000000 // (SELECT ns FROM n) ELSE 0 END AS BIGINT) AS rq
      |        FROM nodes),
      |""".stripMargin +
      (1 to 10).map(step).mkString(",\n") + """
      |SELECT item, rq,
      |  floor(CAST(rq AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS pr
      |FROM it10 ORDER BY item""".stripMargin
  }

  /** Unrolled 8-round synchronous k-core peel at k = 3 (same
    * unroll-not-recurse rationale as [[PagerankSql]]): each round
    * recomputes distinct-neighbor degrees within the surviving set
    * and keeps nodes with ≥ 3. Peeling is monotone, so rounds past
    * the fixpoint are identity — GraphSpec asserts convergence within
    * 8 on the test corpus. */
  val KcoreSql: String = {
    def step(k: Int): String =
      s"""d$k AS (
        |  SELECT adj.u, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM adj JOIN s${k - 1} x ON x.item = adj.u
        |           JOIN s${k - 1} y ON y.item = adj.v
        |  GROUP BY 1 HAVING COUNT(*) >= 3),
        |s$k AS (SELECT u AS item FROM d$k)""".stripMargin
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
      |s0 AS (SELECT DISTINCT u AS item FROM adj),
      |""".stripMargin +
      (1 to 8).map(step).mkString(",\n") + """
      |SELECT u AS item, deg AS core_degree FROM d8 ORDER BY item""".stripMargin
  }

  /** Shared 4-source depth-4 σ-carrying BFS over the undirected item
    * graph (Brandes' forward pass) — the common prefix of
    * [[BetweennessSampledSql]] and [[HarmonicCentralitySql]]. Level
    * CTEs l1..l4 carry (s, item, sigma); r0..r4 the visited sets. */
  private val SigmaBfsCtes: String = {
    def lvl(k: Int): String =
      s"""l$k AS (SELECT l.s, adj.v AS item, CAST(SUM(l.sigma) AS BIGINT) AS sigma
        |  FROM adj JOIN l${k - 1} l ON adj.u = l.item
        |  WHERE NOT EXISTS (SELECT 1 FROM r${k - 1} r
        |                    WHERE r.s = l.s AND r.item = adj.v)
        |  GROUP BY 1, 2),
        |r$k AS (SELECT * FROM r${k - 1} UNION ALL SELECT s, item FROM l$k)""".stripMargin
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
      |seeds AS (SELECT u AS s FROM (
      |    SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1)
      |  ORDER BY deg DESC, u LIMIT 4),
      |l0 AS (SELECT s, s AS item, CAST(1 AS BIGINT) AS sigma FROM seeds),
      |r0 AS (SELECT s, item FROM l0),
      |""".stripMargin + (1 to 4).map(lvl).mkString(",\n")
  }

  /** Sampled harmonic centrality: per-term 1/d by nano-grid integer
    * division over the shared σ-BFS levels. */
  val HarmonicCentralitySql: String =
    SigmaBfsCtes + """
      |, lv AS (SELECT s, item, 1 AS dist FROM l1
      |  UNION ALL SELECT s, item, 2 FROM l2
      |  UNION ALL SELECT s, item, 3 FROM l3
      |  UNION ALL SELECT s, item, 4 FROM l4)
      |SELECT item, CAST(COUNT(*) AS BIGINT) AS n_sources_reaching,
      |  floor(CAST(SUM(1000000000 // CAST(dist AS BIGINT)) AS DOUBLE)
      |    / 1e5 + 0.5) / 1e4 AS harmonic
      |FROM lv GROUP BY item ORDER BY harmonic DESC, item""".stripMargin

  /** Depth-bounded sampled Brandes: backward dependency accumulation
    * d3←d4, d2←d3, d1←d2 with HUGEINT-product nano-grid terms —
    * mirrors the Spark per-level loop exactly (same quantization,
    * same parent-child joins). */
  val BetweennessSampledSql: String = {
    def back(k: Int): String =
      s"""d$k AS (SELECT p.s, p.item,
        |    COALESCE(CAST(SUM((CAST(p.sigma AS HUGEINT) * (1000000000 + cw.dq))
        |      // CAST(cw.sigma AS HUGEINT)) AS BIGINT), 0) AS dq
        |  FROM l$k p
        |  LEFT JOIN adj ON adj.u = p.item
        |  LEFT JOIN (SELECT c.s, c.item, c.sigma, d.dq
        |             FROM l${k + 1} c JOIN d${k + 1} d
        |               ON d.s = c.s AND d.item = c.item) cw
        |    ON cw.s = p.s AND cw.item = adj.v
        |  GROUP BY 1, 2)""".stripMargin
    SigmaBfsCtes +
      ",\nd4 AS (SELECT s, item, CAST(0 AS BIGINT) AS dq FROM l4),\n" +
      Seq(3, 2, 1).map(back).mkString(",\n") + """
      |, allq AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2
      |  UNION ALL SELECT * FROM d3 UNION ALL SELECT * FROM d4)
      |SELECT item, CAST(COUNT(*) AS BIGINT) AS n_sources_reaching,
      |  floor(CAST(SUM(dq) AS DOUBLE) / 1e5 + 0.5) / 1e4 AS betweenness
      |FROM allq GROUP BY item ORDER BY betweenness DESC, item""".stripMargin
  }

  /** Markov removal-effect attribution: journey truncation at the
    * first purchase (tuple-ordered), knockout variants via a bounded
    * CROSS JOIN, 12 unrolled absorption steps with HUGEINT
    * Σ n·pq // n_from mass updates, ppm effects/shares — mirrors the
    * Spark loop exactly. */
  val MarkovAttributionSql: String = {
    def it(k: Int): String =
      s"""p$k AS (
        |  SELECT tv.removed, tv."from" AS state,
        |    CAST(SUM(CAST(tv.n AS HUGEINT) * p.pq)
        |      // MAX(CAST(tv.n_from AS HUGEINT)) AS BIGINT) AS pq
        |  FROM tv JOIN p${k - 1} p
        |    ON p.removed = tv.removed AND p.state = tv."to"
        |  GROUP BY 1, 2
        |  UNION ALL SELECT removed, state, pq FROM absorbing)""".stripMargin
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      |  FROM events),
      |fp AS (SELECT user_id, us AS cus, event_id AS ceid,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
      |  FROM e WHERE event_type = 'purchase'),
      |cut AS (SELECT user_id, cus, ceid FROM fp WHERE rn = 1),
      |kept AS (SELECT e.* FROM e LEFT JOIN cut c ON e.user_id = c.user_id
      |  WHERE c.user_id IS NULL OR (e.us, e.event_id) <= (c.cus, c.ceid)),
      |st AS (SELECT user_id, event_type, us, event_id,
      |    lag(event_type) OVER w AS prev, lead(event_type) OVER w AS nxt
      |  FROM kept WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |tr0 AS (SELECT COALESCE(prev, 'START') AS "from", event_type AS "to" FROM st
      |  UNION ALL SELECT event_type, 'NULL' FROM st
      |    WHERE nxt IS NULL AND event_type <> 'purchase'),
      |trans AS (SELECT "from", "to", CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tr0 GROUP BY 1, 2),
      |variants AS (SELECT DISTINCT "from" AS removed FROM trans
      |    WHERE "from" <> 'START'
      |  UNION ALL SELECT '__none'),
      |tv1 AS (SELECT v.removed, t."from",
      |    CASE WHEN t."to" = v.removed THEN 'NULL' ELSE t."to" END AS "to",
      |    CAST(SUM(t.n) AS BIGINT) AS n
      |  FROM trans t CROSS JOIN variants v WHERE t."from" <> v.removed
      |  GROUP BY 1, 2, 3),
      |tv AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY removed, "from")
      |    AS BIGINT) AS n_from FROM tv1),
      |absorbing AS (SELECT removed, 'purchase' AS state,
      |    CAST(1000000000 AS BIGINT) AS pq FROM variants
      |  UNION ALL SELECT removed, 'NULL', CAST(0 AS BIGINT) FROM variants),
      |p0 AS (SELECT DISTINCT removed, "from" AS state, CAST(0 AS BIGINT) AS pq
      |    FROM tv
      |  UNION ALL SELECT removed, state, pq FROM absorbing),
      |""".stripMargin + (1 to 12).map(it).mkString(",\n") + """
      |, ps AS (SELECT removed, pq FROM p12 WHERE state = 'START'),
      |b AS (SELECT pq AS base_q FROM ps WHERE removed = '__none'),
      |o AS (SELECT ps.removed AS channel,
      |    base_q // 1000 AS conv_ppm_base,
      |    ps.pq // 1000 AS conv_ppm_removed,
      |    CAST(((base_q - ps.pq) * 1000000) // NULLIF(base_q, 0) AS BIGINT)
      |      AS removal_effect_ppm
      |  FROM ps, b WHERE ps.removed <> '__none'),
      |t2 AS (SELECT CAST(SUM(removal_effect_ppm) AS BIGINT) AS re_total FROM o)
      |SELECT channel, conv_ppm_base, conv_ppm_removed, removal_effect_ppm,
      |  CAST((removal_effect_ppm * 1000000) // NULLIF(re_total, 0) AS BIGINT)
      |    AS share_ppm
      |FROM o, t2 ORDER BY channel""".stripMargin
  }

  /** k-truss at k=4, 8 unrolled peel rounds (the KcoreSql contract)
    * + a final within-truss support pass. */
  val KtrussSql: String = {
    // AS MATERIALIZED is load-bearing: each round references the
    // previous round's edges 5× (once directly, 2×2 via adj), so an
    // inlined expansion is 5⁸ scans of the base — DuckDB must pin
    // each round to one evaluation.
    def step(k: Int): String =
      s"""a$k AS MATERIALIZED (SELECT a AS u, b AS v FROM t${k - 1}
        |  UNION ALL SELECT b, a FROM t${k - 1}),
        |t$k AS MATERIALIZED (SELECT e.a, e.b FROM t${k - 1} e
        |  JOIN a$k n1 ON n1.u = e.a
        |  JOIN a$k n2 ON n2.u = e.b AND n2.v = n1.v
        |  GROUP BY e.a, e.b HAVING COUNT(*) >= 2)""".stripMargin
    """WITH base AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
      |  FROM events),
      |tr AS (
      |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
      |         item AS dst
      |  FROM base),
      |t0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |      FROM tr WHERE src IS NOT NULL AND src <> dst),
      |""".stripMargin + (1 to 8).map(step).mkString(",\n") + """
      |, af AS (SELECT a AS u, b AS v FROM t8 UNION ALL SELECT b, a FROM t8)
      |SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
      |FROM t8 e
      |JOIN af n1 ON n1.u = e.a
      |JOIN af n2 ON n2.u = e.b AND n2.v = n1.v
      |GROUP BY e.a, e.b ORDER BY a, b""".stripMargin
  }

  /** Exact Shapley attribution over the fixed 4-channel coalition
    * game: journey truncation as in [[MarkovAttributionSql]], masks
    * by bit_or, v(S) in exact ppm, factorial weights ×4! as integer
    * literals, one division at the edge. */
  val ShapleyAttributionSql: String = {
    val channels = Seq("click", "error", "signup", "view")
    val n = channels.size
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val bitCase = channels.zipWithIndex.map { case (c, i) =>
      s"WHEN event_type = '$c' THEN ${1L << i}"
    }.mkString("CASE ", " ", " ELSE 0 END")
    val chValues = channels.zipWithIndex.map { case (c, i) =>
      s"('$c', ${1L << i})"
    }.mkString(", ")
    val wCase = channels.indices.map { s =>
      s"WHEN $s THEN ${fact(s) * fact(n - 1 - s)}"
    }.mkString("CASE bit_count(smask) ", " ", " END")
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      |  FROM events),
      |fp AS (SELECT user_id, us AS cus, event_id AS ceid,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
      |  FROM e WHERE event_type = 'purchase'),
      |cut AS (SELECT user_id, cus, ceid FROM fp WHERE rn = 1),
      |kept AS (SELECT e.* FROM e LEFT JOIN cut c ON e.user_id = c.user_id
      |  WHERE c.user_id IS NULL OR (e.us, e.event_id) <= (c.cus, c.ceid)),
      |u AS (SELECT user_id,
      |    CAST(bit_or($bitCase) AS BIGINT) AS mask,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |  FROM kept GROUP BY user_id),
      |vt AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(converted) AS BIGINT) AS n_conv
      |  FROM u GROUP BY mask),
      |v AS (SELECT m.range AS mask,
      |    COALESCE(CAST((vt.n_conv * 1000000) // vt.n_users AS BIGINT), 0)
      |      AS v_ppm,
      |    COALESCE(vt.n_users, 0) AS n_users
      |  FROM range(${1L << n}) m LEFT JOIN vt ON vt.mask = m.range),
      |ch(channel, bit) AS (VALUES $chValues),
      |phi AS (SELECT ch.channel, ch.bit,
      |    CAST(CASE WHEN SUM(($wCase) * (vu.v_ppm - vs.v_ppm)) >= 0
      |      THEN SUM(($wCase) * (vu.v_ppm - vs.v_ppm)) // ${fact(n)}
      |      ELSE -((-SUM(($wCase) * (vu.v_ppm - vs.v_ppm))) // ${fact(n)})
      |      END AS BIGINT) AS shapley_ppm
      |  FROM (SELECT mask AS smask, v_ppm FROM v) vs
      |  CROSS JOIN ch
      |  JOIN (SELECT mask AS umask, v_ppm FROM v) vu
      |    ON vu.umask = (vs.smask | ch.bit)
      |  WHERE (vs.smask & ch.bit) = 0
      |  GROUP BY 1, 2),
      |tc AS (SELECT ch.channel, CAST(SUM(v.n_users) AS BIGINT)
      |      AS n_users_touched
      |  FROM v CROSS JOIN ch WHERE (v.mask & ch.bit) != 0
      |  GROUP BY 1)
      |SELECT phi.channel, COALESCE(tc.n_users_touched, 0) AS n_users_touched,
      |  phi.shapley_ppm
      |FROM phi LEFT JOIN tc ON tc.channel = phi.channel
      |ORDER BY phi.channel""".stripMargin
  }

  /** Unrolled 6-step truncated Katz (α = 1/2 as the 2^(6−k) integer
    * weights — katz·64 is exact). Every it_k is AS MATERIALIZED: each
    * step is referenced twice (by the next step and by the final
    * weighted sum), and inlining would recompute the chain per
    * reference (the eigenvector-oracle lesson). */
  val KatzSql: String = {
    val step = (k: Int) => s"""it$k AS MATERIALIZED (
      |  SELECT n2.item, COALESCE(fl.pin, CAST(0 AS HUGEINT)) AS p
      |  FROM nodes n2 LEFT JOIN (
      |    SELECT e.dst, CAST(SUM(p.p) AS HUGEINT) AS pin
      |    FROM it${k - 1} p JOIN e ON e.src = p.item GROUP BY 1) fl
      |    ON fl.dst = n2.item)""".stripMargin
    """WITH base AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS item
      |  FROM events),
      |tr AS (
      |  SELECT lag(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src,
      |         item AS dst
      |  FROM base),
      |e AS (SELECT DISTINCT src, dst FROM tr WHERE src IS NOT NULL),
      |nodes AS (SELECT DISTINCT src AS item FROM e UNION SELECT DISTINCT dst FROM e),
      |it0 AS MATERIALIZED (SELECT item, CAST(1 AS HUGEINT) AS p FROM nodes),
      |""".stripMargin +
      (1 to 6).map(step).mkString(",\n") + """,
      |acc AS (SELECT n.item,
      |    32 * i1.p + 16 * i2.p + 8 * i3.p + 4 * i4.p
      |      + 2 * i5.p + 1 * i6.p AS a
      |  FROM nodes n
      |  JOIN it1 i1 ON i1.item = n.item
      |  JOIN it2 i2 ON i2.item = n.item
      |  JOIN it3 i3 ON i3.item = n.item
      |  JOIN it4 i4 ON i4.item = n.item
      |  JOIN it5 i5 ON i5.item = n.item
      |  JOIN it6 i6 ON i6.item = n.item)
      |SELECT item, CAST(a AS BIGINT) AS katz_x64,
      |  floor(CAST(a AS DOUBLE) / 64.0 * 1e6 + 0.5) / 1e6 AS katz
      |FROM acc ORDER BY item""".stripMargin
  }

  // DuckDB oracle SQL. Deterministic cross-engine numerics: money math
  // through integer micros (floor then int64 SUM), single final
  // divisions, explicit rounding before ranking.
}
