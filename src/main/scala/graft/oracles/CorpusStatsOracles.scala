package graft.oracles

/** DuckDB oracle SQL for the corpusstats family — split out of SparkEntry
  * (round 9) purely for registry file size; keys and SQL are the
  * unchanged driver contract (SURVEY §5). */
private[graft] object CorpusStatsOracles {
  import OracleFragments._

  val sql: Map[String, String] = Map(

    // idf is the RATIO (N+1)/(df+1), not ln of it: +,*,/ are IEEE
    // correctly-rounded (bit-identical between engines); libm ln is
    // not. Rounded score is what both engines rank on.
    "tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, token, tf, df,
        |        ROUND(CAST(tf AS DOUBLE) *
        |          (CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 4) AS score
        |      FROM tf JOIN df USING (token), n),
        |r AS (SELECT doc_id, token, tf, df, score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY score DESC, token) AS INT) AS rank
        |      FROM s)
        |SELECT doc_id, token, tf, df, score, rank FROM r WHERE rank <= 5
        |ORDER BY doc_id, rank""".stripMargin,

    "repetition_stats" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
        |        CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |        CASE WHEN len(toks) >= 2
        |          THEN list_transform(generate_series(1, len(toks) - 1),
        |                 i -> toks[i] || ' ' || toks[i+1])
        |          ELSE [] END AS bigrams
        |      FROM t),
        |tb AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count FROM (
        |         SELECT doc_id, bg, COUNT(*) AS c
        |         FROM (SELECT doc_id, unnest(bigrams) AS bg FROM b)
        |         GROUP BY doc_id, bg) GROUP BY doc_id),
        |j AS (SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |        ROUND(CAST(b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE), 4)
        |          AS distinct_ratio,
        |        COALESCE(tb.top_bigram_count, 0) AS top_bigram_count,
        |        CASE WHEN b.n_tokens >= 2
        |          THEN ROUND(CAST(COALESCE(tb.top_bigram_count, 0) AS DOUBLE) /
        |                 CAST(b.n_tokens - 1 AS DOUBLE), 4)
        |          ELSE 0.0 END AS top_bigram_frac
        |      FROM b LEFT JOIN tb USING (doc_id))
        |SELECT doc_id, n_tokens, n_distinct, distinct_ratio, top_bigram_count,
        |  top_bigram_frac,
        |  (distinct_ratio >= 0.3 AND top_bigram_frac <= 0.2) AS keep
        |FROM j ORDER BY doc_id""".stripMargin,

    // Collocation salience is lift = P(w1 w2)/(P(w1)P(w2)) — the
    // log-free PMI variant, same IEEE-only-arithmetic rationale as
    // tfidf_top_terms. Parenthesization matches the Spark side exactly.
    "collocations" ->
      """WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c1
        |        FROM (SELECT unnest(toks) AS token FROM t) GROUP BY token),
        |big AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
        |          CAST(COUNT(*) AS BIGINT) AS c12
        |        FROM (SELECT unnest(CASE WHEN len(toks) >= 2
        |                THEN list_transform(generate_series(1, len(toks) - 1),
        |                       i -> toks[i] || ' ' || toks[i+1])
        |                ELSE [] END) AS bg FROM t)
        |        GROUP BY w1, w2 HAVING COUNT(*) >= 5),
        |tot AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n_uni,
        |               CAST(SUM(GREATEST(len(toks) - 1, 0)) AS BIGINT) AS n_big
        |        FROM t)
        |SELECT w1, w2, c12,
        |  ROUND((CAST(c12 AS DOUBLE) / CAST(n_big AS DOUBLE)) /
        |        ((CAST(a.c1 AS DOUBLE) / CAST(n_uni AS DOUBLE)) *
        |         (CAST(b.c1 AS DOUBLE) / CAST(n_uni AS DOUBLE))), 4) AS lift
        |FROM big JOIN uni a ON big.w1 = a.token JOIN uni b ON big.w2 = b.token, tot
        |ORDER BY c12 DESC, lift DESC, w1, w2 LIMIT 50""".stripMargin,

    "lang_quality_gate" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang, $QualitySqlExpr AS quality
        |  FROM documents),
        |th AS (SELECT lang,
        |         floor(quantile_cont(quality, 0.75) * 1e4 + 0.5) / 1e4 AS lang_p75
        |       FROM scored GROUP BY lang)
        |SELECT s.doc_id, s.lang, s.quality, th.lang_p75
        |FROM scored s JOIN th USING (lang)
        |WHERE s.quality >= th.lang_p75 ORDER BY s.doc_id""".stripMargin,

    // Trigram extraction mirrors TextF.charTrigrams (lower, collapse
    // whitespace runs to one space, 1-based substr windows); the score
    // keeps all integer sums exact and divides once (see
    // CorpusStats.lmQualityOf).
    "lm_quality" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(lower(text), '\s+', ' ', 'g') AS t FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(t) - 2),
        |                          i -> substr(t, i, 3))) AS g
        |  FROM t),
        |model AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY g),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_grams FROM model),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |    CAST(SUM(m.cnt) AS BIGINT) AS sum_cnt
        |  FROM g JOIN model m USING (g) GROUP BY doc_id)
        |SELECT doc_id, n_grams,
        |  floor(CAST(sum_cnt AS DOUBLE) * 1e6
        |    / (CAST(n_grams AS DOUBLE) * CAST(total_grams AS DOUBLE))
        |    * 1e4 + 0.5) / 1e4 AS score_ppm
        |FROM per, tot ORDER BY doc_id""".stripMargin,

    // The vocabulary subquery is vocab_df's oracle verbatim (same
    // ordering and LIMIT), so the coverage metric and the vocabulary
    // builder can never drift apart.
    "oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        |vocab AS (SELECT token FROM (
        |  SELECT token, COUNT(*) AS df, SUM(tf) AS cf
        |  FROM tf GROUP BY token
        |  ORDER BY df DESC, cf DESC, token LIMIT 100)),
        |per AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
        |    SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM tok t LEFT JOIN vocab v USING (token) GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_oov AS BIGINT) AS n_oov,
        |  floor(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS oov_rate
        |FROM per ORDER BY doc_id""".stripMargin,

    // Whitespace is the explicit class (Java \s ≠ RE2 \s); mean word
    // length = non-ws chars / tokens; ratios floor-round half-up like
    // the quality oracle.
    "gopher_rules" ->
      """WITH b AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS toks,
        |    length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) AS char_len
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(toks) AS INT) AS n_tokens,
        |    floor(CAST(char_len AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS mean_word_len,
        |    floor(CAST(len(list_filter(toks, t -> starts_with(t, '#') OR contains(t, '...'))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS symbol_frac,
        |    floor(CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS alpha_frac,
        |    CAST(len(list_intersect(list_distinct(toks),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_hits
        |  FROM b)
        |SELECT *,
        |  n_tokens >= 50 AND n_tokens <= 100000 AND
        |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AND
        |  symbol_frac <= 0.1 AND alpha_frac >= 0.8 AND n_stop_hits >= 2 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // df/cf/rank are all windows over the token partition — mirrors
    // the single-shuffle Spark plan; (tf DESC, doc_id) tiebreak.
    "inverted_index" ->
      """WITH tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |        FROM documents)
        |  GROUP BY 1, 2),
        |w AS (SELECT token, doc_id, tf,
        |    CAST(COUNT(*) OVER (PARTITION BY token) AS BIGINT) AS df,
        |    CAST(SUM(tf) OVER (PARTITION BY token) AS BIGINT) AS cf,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS INT) AS rank
        |  FROM tf)
        |SELECT token, df, cf, doc_id, tf, rank FROM w
        |WHERE df >= 5 AND rank <= 3 ORDER BY token, rank""".stripMargin,

    // One per-doc projection reusing the quality / BPE / Gopher
    // fragments verbatim, then exact-integer sums; both means divide
    // once and round half-up at the end.
    "corpus_card" ->
      s"""WITH b AS (SELECT lang, source, text,
        |    regexp_split_to_array(trim(text), '\\s+') AS toks,
        |    length(regexp_replace(text, '[ \\t\\n\\f\\r]', '', 'g')) AS char_len
        |  FROM documents),
        |g AS (SELECT lang, source, text, toks,
        |    CAST(len(toks) AS INT) AS n_tokens,
        |    floor(CAST(char_len AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS mean_word_len,
        |    floor(CAST(len(list_filter(toks, t -> starts_with(t, '#') OR contains(t, '...'))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS symbol_frac,
        |    floor(CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS alpha_frac,
        |    CAST(len(list_intersect(list_distinct(toks),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_hits
        |  FROM b),
        |m AS (SELECT lang, source,
        |    CAST(len(toks) AS BIGINT) AS t_ws,
        |    CAST(len(regexp_extract_all(text, ' ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+')) AS BIGINT) AS t_bpe,
        |    CAST(floor(($QualitySqlExpr) * 1e4 + 0.5) AS BIGINT) AS qq,
        |    CASE WHEN n_tokens >= 50 AND n_tokens <= 100000
        |      AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |      AND symbol_frac <= 0.1 AND alpha_frac >= 0.8
        |      AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS keep
        |  FROM g)
        |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t_ws) AS BIGINT) AS tokens_ws,
        |  CAST(SUM(t_bpe) AS BIGINT) AS tokens_bpe,
        |  floor(CAST(SUM(qq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4
        |    AS mean_quality,
        |  floor(CAST(SUM(keep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS gopher_keep_frac
        |FROM m GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // Distinct (token, source) first; Jaccard of vocabularies with one
    // division, 4dp half-up. The COUNT compare needs no hash twin for
    // Spark's xxhash64 token key (dup_matrix's argument).
    "vocab_overlap" ->
      """WITH vs AS (SELECT DISTINCT token, source FROM (
        |    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |    FROM documents)),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM vs GROUP BY 1),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_shared
        |      FROM vs a JOIN vs b ON a.token = b.token AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_shared,
        |  floor(CAST(n_shared AS DOUBLE) / CAST(sa.n + sb.n - n_shared AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS jaccard
        |FROM p JOIN sz sa ON sa.source = p.source_a
        |JOIN sz sb ON sb.source = p.source_b
        |ORDER BY source_a, source_b""".stripMargin,

    // Add-one smoothed relative-frequency ratio (ratio form, no libm);
    // one multiply per side of ONE division, rounded then ranked.
    "term_keyness" ->
      """WITH tok AS (SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT token,
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS f_focus,
        |    CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS f_rest
        |  FROM tok GROUP BY 1),
        |t AS (SELECT CAST(SUM(f_focus) AS BIGINT) AS nf,
        |        CAST(SUM(f_rest) AS BIGINT) AS nr,
        |        CAST(COUNT(*) AS BIGINT) AS v FROM tf)
        |SELECT token, f_focus, f_rest,
        |  floor((CAST(f_focus + 1 AS DOUBLE) * CAST(nr + v AS DOUBLE))
        |    / (CAST(f_rest + 1 AS DOUBLE) * CAST(nf + v AS DOUBLE)) * 1e4 + 0.5) / 1e4
        |    AS keyness
        |FROM tf CROSS JOIN t WHERE f_focus >= 5
        |ORDER BY keyness DESC, token LIMIT 50""".stripMargin,

    // Bin on the already-4dp score (exact); mean via the 1e4-integer
    // sum; both ratios divide once and round half-up.
    "calibration_curve" ->
      s"""WITH s AS (SELECT $QualitySqlExpr AS q, lang FROM documents),
        |b AS (SELECT CAST(least(floor(q * 20), 19) AS BIGINT) AS bin,
        |        CAST(floor(q * 1e4 + 0.5) AS BIGINT) AS qq,
        |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |      FROM s)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  floor(CAST(SUM(qq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4
        |    AS mean_score,
        |  floor(CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS pos_rate
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // Mann-Whitney AUC with tie credit 1/2 in doubled-integer space:
    // 2U = Σ np·(2·nn_below + nn) is an exact BIGINT; one division at
    // the end, rounded half-up to 6 dp.
    "auc_quality" ->
      s"""WITH s AS (SELECT source, $QualitySqlExpr AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |g AS (SELECT source, score, CAST(SUM(pos) AS BIGINT) AS np,
        |    CAST(SUM(1 - pos) AS BIGINT) AS nn FROM s GROUP BY 1, 2),
        |w AS (SELECT *, COALESCE(CAST(SUM(nn) OVER (PARTITION BY source ORDER BY score
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS nn_below
        |      FROM g),
        |a AS (SELECT source, CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(nn) AS BIGINT) AS n_neg,
        |    CAST(SUM(np * (2 * nn_below + nn)) AS BIGINT) AS u2
        |  FROM w GROUP BY 1)
        |SELECT source, n_pos, n_neg,
        |  floor(CAST(u2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS auc
        |FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY source""".stripMargin,

    // Odds-form RSJ idf (no log), k1=1.2 b=0.75, len/avgdl expanded to
    // len·N/total; per-term weights quantize to 1e-6 ints before the
    // per-doc sum. Parenthesization mirrors the Spark expression.
    "bm25_search" ->
      """WITH lens AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS len
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len) AS BIGINT) AS total_tokens FROM lens),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |        FROM documents)
        |  WHERE token IN ('spark', 'merge', 'window')
        |  GROUP BY 1, 2),
        |d AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY token) AS BIGINT) AS df FROM tf),
        |s AS (SELECT d.doc_id,
        |    CAST(floor(
        |      (CAST(tf AS DOUBLE) * 2.2 /
        |        (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |          (CAST(len AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE))))) *
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * 1e6 + 0.5) AS BIGINT) AS qw
        |  FROM d JOIN lens ON d.doc_id = lens.doc_id, tot)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  floor(CAST(SUM(qw) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS score
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // Complete 10-band grid (empty bands report zeros), descending
    // running sum = >= -threshold retention.
    "quality_retention" ->
      s"""WITH d AS (SELECT $QualitySqlExpr AS q,
        |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS t
        |  FROM documents),
        |b AS (SELECT LEAST(CAST(floor(q * 10) AS INT), 9) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(t) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY 1),
        |g AS (SELECT CAST(range AS INT) AS bucket FROM range(0, 10)),
        |j AS (SELECT g.bucket, COALESCE(n_docs, 0) AS n_docs,
        |    COALESCE(n_tokens, 0) AS n_tokens
        |  FROM g LEFT JOIN b ON g.bucket = b.bucket),
        |c AS (SELECT bucket,
        |    CAST(SUM(n_docs) OVER (ORDER BY bucket DESC) AS BIGINT) AS docs_kept,
        |    CAST(SUM(n_tokens) OVER (ORDER BY bucket DESC) AS BIGINT) AS tokens_kept,
        |    CAST(SUM(n_docs) OVER () AS BIGINT) AS total_docs,
        |    CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens
        |  FROM j)
        |SELECT CAST(bucket AS DOUBLE) / 10.0 AS threshold, docs_kept, tokens_kept,
        |  floor(CAST(docs_kept AS DOUBLE) / CAST(total_docs AS DOUBLE) * 1e4 + 0.5)
        |    / 1e4 AS doc_frac,
        |  floor(CAST(tokens_kept AS DOUBLE) / CAST(total_tokens AS DOUBLE) * 1e4 + 0.5)
        |    / 1e4 AS token_frac
        |FROM c ORDER BY threshold""".stripMargin,

    // Within-source rank -> 101-point global quantile grid
    // (quantile_cont of integer-quantized scores: the same IEEE
    // interpolation Spark's percentile runs — earnings_percentiles'
    // precedent).
    "quantile_normalize" ->
      s"""WITH s AS (SELECT doc_id, source,
        |    CAST(floor(($QualitySqlExpr) * 1e4 + 0.5) AS BIGINT) AS qq
        |  FROM documents),
        |g AS (SELECT quantile_cont(qq, [0.0, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.1, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.2, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28, 0.29, 0.3, 0.31, 0.32, 0.33, 0.34, 0.35, 0.36, 0.37, 0.38, 0.39, 0.4, 0.41, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47, 0.48, 0.49, 0.5, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58, 0.59, 0.6, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66, 0.67, 0.68, 0.69, 0.7, 0.71, 0.72, 0.73, 0.74, 0.75, 0.76, 0.77, 0.78, 0.79, 0.8, 0.81, 0.82, 0.83, 0.84, 0.85, 0.86, 0.87, 0.88, 0.89, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99, 1.0]) AS gl FROM s),
        |r AS (SELECT doc_id, source, qq,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY qq, doc_id) AS BIGINT)
        |      AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
        |  FROM s)
        |SELECT doc_id, source, CAST(qq AS DOUBLE) / 1e4 AS q_raw,
        |  floor(gl[CAST(CASE WHEN n_s > 1 THEN ((r - 1) * 100) // (n_s - 1)
        |                     ELSE 50 END AS INT) + 1] / 1e4 * 1e4 + 0.5) / 1e4
        |    AS q_norm
        |FROM r, g ORDER BY doc_id""".stripMargin,

    // Unigrams = whitespace tokens ([""] for empty docs); n >= 2 =
    // STRICT shingles (no unigram fallback faking diversity).
    "ngram_diversity" ->
      """WITH toks AS (SELECT source,
        |    regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |g1 AS (SELECT source, 1 AS n, unnest(tk) AS g FROM toks),
        |g2 AS (SELECT source, 2 AS n,
        |    unnest(list_transform(range(1, len(tk)),
        |      i -> tk[i] || ' ' || tk[i + 1])) AS g
        |  FROM toks WHERE len(tk) >= 2),
        |g3 AS (SELECT source, 3 AS n,
        |    unnest(list_transform(range(1, len(tk) - 1),
        |      i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
        |  FROM toks WHERE len(tk) >= 3),
        |u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL
        |      SELECT * FROM g3)
        |SELECT source, n, CAST(COUNT(*) AS BIGINT) AS total_ngrams,
        |  CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_ngrams,
        |  floor(CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    * 1e4 + 0.5) / 1e4 AS ttr
        |FROM u GROUP BY source, n ORDER BY source, n""".stripMargin,
  )
}
