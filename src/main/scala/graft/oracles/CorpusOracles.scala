package graft.oracles

/** DuckDB oracle SQL for the corpus family — split out of SparkEntry
  * (round 9) purely for registry file size; keys and SQL are the
  * unchanged driver contract (SURVEY §5). */
private[graft] object CorpusOracles {
  import OracleFragments._

  val sql: Map[String, String] = Map(

    // DSIR importance weights: md5-prefix buckets (train_split's
    // cross-engine hash), integer Laplace counts, the two-division
    // ratio tree parenthesized identically to the Spark build, 1e-6
    // quantization before the per-doc sum.
    "dsir_weights" ->
      """WITH tk AS (SELECT doc_id, source, substr(md5(tok), 1, 3) AS b
        |  FROM (SELECT doc_id, source,
        |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |        FROM documents)),
        |c AS (SELECT b,
        |    CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3') THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(COUNT(*) AS BIGINT) AS cr
        |  FROM tk GROUP BY b),
        |t AS (SELECT
        |    CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3') THEN 1 ELSE 0 END) AS BIGINT) AS t_tot,
        |    CAST(COUNT(*) AS BIGINT) AS r_tot
        |  FROM tk),
        |r AS (SELECT b, CAST(floor(
        |    CAST(ct + 1 AS DOUBLE) / CAST(t_tot + 4096 AS DOUBLE)
        |      / (CAST(cr + 1 AS DOUBLE) / CAST(r_tot + 4096 AS DOUBLE))
        |    * 1e6 + 0.5) AS BIGINT) AS r6
        |  FROM c, t),
        |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(r6) AS BIGINT) AS sr
        |  FROM tk JOIN r USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  floor(CAST(sr AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS weight
        |FROM s ORDER BY doc_id""".stripMargin,

    // Markup stripping on the planted-fragment construction (the
    // pii-family convention); tags strip before entities on both
    // engines, lengths are ASCII-identical.
    "strip_markup" ->
      """WITH s AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 4 = 0
        |       THEN '<div class="d' || CAST(doc_id % 7 AS VARCHAR) || '"><p>'
        |       ELSE '' END)
        |    || text
        |    || (CASE WHEN doc_id % 4 = 0 THEN '</p></div>' ELSE '' END)
        |    || (CASE WHEN doc_id % 3 = 0
        |       THEN ' &amp; tail&nbsp;' || CAST(doc_id % 9 AS VARCHAR)
        |       ELSE '' END) AS synth
        |  FROM documents),
        |t AS (SELECT doc_id, synth,
        |    regexp_replace(synth, '<[^<>]+>', '', 'g') AS stripped FROM s),
        |c AS (SELECT doc_id, synth, stripped,
        |    regexp_replace(stripped, '&[A-Za-z]{2,8};', ' ', 'g') AS clean FROM t)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(synth, '<[^<>]+>')) AS INT) AS n_tags,
        |  CAST(len(regexp_extract_all(stripped, '&[A-Za-z]{2,8};')) AS INT) AS n_entities,
        |  CAST(length(synth) - length(clean) AS INT) AS chars_removed,
        |  md5(clean) AS clean_md5
        |FROM c ORDER BY doc_id""".stripMargin,

    // Mojibake incidence on planted encoding artifacts; the pattern
    // is a literal alternation so Java regex and RE2 agree byte-wise.
    "mojibake_stats" ->
      """WITH s AS (SELECT source,
        |    text
        |    || (CASE WHEN doc_id % 6 = 0 THEN ' cafÃ© menu' ELSE '' END)
        |    || (CASE WHEN doc_id % 8 = 0 THEN ' itâ€™s fine' ELSE '' END)
        |    || (CASE WHEN doc_id % 11 = 0 THEN ' bad�byte' ELSE '' END) AS synth
        |  FROM documents),
        |h AS (SELECT source,
        |    CAST(len(regexp_extract_all(synth, 'Ã.|â€.|�')) AS INT) AS hits
        |  FROM s)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS affected_docs,
        |  CAST(SUM(hits) AS BIGINT) AS artifact_hits,
        |  floor(CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS affected_rate
        |FROM h GROUP BY source ORDER BY source""".stripMargin,

    "token_count_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+|[ \t\n\f\r]+')) AS INT) AS n_tokens_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "token_count" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
        |  CAST(MAX(len(regexp_split_to_array(trim(text), '\s+'))) AS INT) AS max_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "text_stats" ->
      """SELECT lang, docs, total_chars, total_tokens,
        |  ROUND(CAST(total_chars AS DOUBLE) / CAST(docs AS DOUBLE), 4) AS avg_chars,
        |  ROUND(CAST(total_tokens AS DOUBLE) / CAST(docs AS DOUBLE), 4) AS avg_tokens
        |FROM (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens
        |  FROM documents GROUP BY lang)
        |ORDER BY lang""".stripMargin,

    "quality_score" ->
      s"""SELECT doc_id, $QualitySqlExpr AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "doc_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_split_to_array(trim(text), '\s+'),
        |        t -> CAST(length(t) AS BIGINT) * 131 +
        |             CAST(ascii(substr(t, 1, 1)) AS BIGINT) * 31 +
        |             CAST(ascii(substr(t, -1, 1)) AS BIGINT))),
        |    (acc, c) -> (acc * 1000003 + c) % 2147483647) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  hex(encode(left(text, 4))) AS prefix_hex, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "corpus_clean" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang, n_chars, $QualitySqlExpr AS quality
        |  FROM documents
        |  WHERE lang IN ('en','es','de','fr') AND n_chars BETWEEN 100 AND 500)
        |SELECT doc_id, lang, n_chars, quality FROM scored
        |WHERE quality >= 0.9 ORDER BY doc_id""".stripMargin,

    // Argmax over per-language profile-word hits; ties break on the
    // GREATEST language code (= Spark's array_max over struct(score,
    // lang)), 'und' when nothing matched.
    "lang_id" -> LangIdSql,

    "pii_redact" ->
      """WITH s AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 > 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
        |      ELSE '' END AS synth
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(synth, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(synth, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(synth,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g')) AS redacted_md5
        |FROM s ORDER BY doc_id""".stripMargin,

    // regexp_replace('^\s+|\s+$') — not trim(), which strips only
    // spaces: the Spark side tokenizes with the native byte scanner,
    // which has no phantom empty token when text leads with a tab.
    "decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    CASE WHEN len(t) >= 8
        |      THEN list_distinct(list_transform(generate_series(1, len(t) - 7),
        |             i -> array_to_string(t[i:i+7], ' ')))
        |      ELSE [] END AS gs
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE source = 'src0'),
        |corp AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE source <> 'src0'),
        |m AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS shared
        |      FROM corp c JOIN bench b USING (gram) GROUP BY c.doc_id)
        |SELECT d.doc_id, COALESCE(m.shared, 0) AS shared_grams,
        |  COALESCE(m.shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
        |WHERE d.source <> 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    "vocab_df" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
        |FROM tf GROUP BY token
        |ORDER BY df DESC, cf DESC, token LIMIT 100""".stripMargin,

    "stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang, md5(text) AS h FROM documents),
        |r AS (SELECT doc_id, lang,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS INT) AS rn,
        |        COUNT(*) OVER (PARTITION BY lang) AS cnt
        |      FROM h)
        |SELECT doc_id, lang, rn FROM r WHERE rn <= (cnt + 4) // 5
        |ORDER BY lang, rn""".stripMargin,

    "chunk_docs" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |st AS (SELECT doc_id, toks,
        |         unnest(generate_series(0, GREATEST(len(toks) - 1, 0), 48)) AS start_tok
        |       FROM t),
        |c AS (SELECT doc_id, CAST(start_tok // 48 AS INT) AS chunk_idx,
        |        CAST(start_tok AS INT) AS start_tok,
        |        toks[start_tok + 1 : start_tok + 64] AS chunk
        |      FROM st
        |      WHERE start_tok = 0 OR start_tok - 48 + 64 < len(toks))
        |SELECT doc_id, chunk_idx, start_tok, CAST(len(chunk) AS INT) AS n_chunk_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "pack_greedy" ->
      """WITH d AS (SELECT doc_id, source,
        |             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
        |           FROM documents),
        |w AS (SELECT doc_id, source, n_tokens,
        |        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          - n_tokens AS start_off
        |      FROM d)
        |SELECT doc_id, source, n_tokens,
        |  start_off // 256 AS seq_id, start_off % 256 AS seq_offset
        |FROM w ORDER BY source, doc_id""".stripMargin,

    "train_split" ->
      """WITH h AS (SELECT doc_id,
        |             substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) AS bucket
        |           FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 'e6' THEN 'train'
        |       WHEN bucket < 'f3' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,

    // Same ceil(frac·cnt) double math, same parenthesization → same
    // IEEE result both engines; ranks are content-keyed md5 order.
    "mix_sources" ->
      """WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |r AS (SELECT doc_id, source,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS INT) AS rn,
        |        COUNT(*) OVER (PARTITION BY source) AS cnt
        |      FROM h),
        |f AS (SELECT *, CASE source WHEN 'src0' THEN CAST(1.0 AS DOUBLE)
        |                 WHEN 'src1' THEN CAST(0.6 AS DOUBLE)
        |                 ELSE CAST(0.2 AS DOUBLE) END AS frac
        |      FROM r)
        |SELECT doc_id, source, rn FROM f
        |WHERE rn <= CAST(ceil(frac * cnt) AS BIGINT)
        |ORDER BY source, rn""".stripMargin,

    // Same strict-8-gram construction as the decontaminate oracle
    // (string grams; the Spark side matches on 63-bit xxhash64 values
    // — collision odds are nil and the hash compare itself verifies).
    "boilerplate_stats" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(list_distinct(list_transform(generate_series(1, len(t) - 7),
        |          i -> array_to_string(t[i:i+7], ' ')))) AS gram
        |      FROM toks WHERE len(t) >= 8),
        |d AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY gram) AS df FROM g),
        |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |        CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |      FROM d GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_dup,
        |  floor(CAST(n_dup AS DOUBLE) / CAST(n_grams AS DOUBLE) * 1e4 + 0.5) / 1e4 AS dup_frac
        |FROM s ORDER BY doc_id""".stripMargin,

    // sqrt is correctly rounded under IEEE 754 in every engine (the
    // one libm function that is), so √n quantized to micro-units is
    // cross-engine exact; fractions/targets are single identically-
    // parenthesized double expressions.
    "source_temperature" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS qw
        |      FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
        |        CAST(SUM(qw) AS BIGINT) AS qwsum FROM c)
        |SELECT source, n_docs,
        |  floor(CAST(qw AS DOUBLE) / CAST(qwsum AS DOUBLE) * 1e4 + 0.5) / 1e4 AS frac,
        |  CAST(floor(CAST(qw AS DOUBLE) * CAST(total_docs AS DOUBLE)
        |    / CAST(qwsum AS DOUBLE)) AS BIGINT) AS target_docs
        |FROM c, t ORDER BY source""".stripMargin,

    // Nests the lang_id oracle verbatim — the confusion matrix can
    // never drift from the per-document prediction oracle.
    "lang_confusion" ->
      s"""WITH p AS (SELECT lang, pred_lang FROM ($LangIdSql)),
        |g AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM p GROUP BY 1, 2),
        |r AS (SELECT *, SUM(n) OVER (PARTITION BY lang) AS lang_total FROM g)
        |SELECT lang, pred_lang, n,
        |  floor(CAST(n AS DOUBLE) / CAST(lang_total AS DOUBLE) * 1e4 + 0.5) / 1e4 AS frac
        |FROM r ORDER BY lang, pred_lang""".stripMargin,

    // Positional grams (pos, 8 tokens joined by one space) → df >= 2
    // across distinct docs → cut every covered token position →
    // reassemble survivors in order. md5 hash-checks the reassembled
    // CONTENT (cf. pii_redact); md5('') covers fully-cut docs on both
    // engines.
    "span_dedup" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |              FROM documents),
        |gp AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
        |           i -> struct_pack(pos := i, gram := array_to_string(t[i:i+7], ' ')))) AS s
        |       FROM toks),
        |g AS (SELECT doc_id, s.pos AS pos, s.gram AS gram FROM gp),
        |common AS (SELECT gram FROM g GROUP BY gram
        |           HAVING COUNT(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, cpos FROM (
        |          SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS cpos
        |          FROM g JOIN common USING (gram))),
        |tp AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(t)),
        |           i -> struct_pack(pos := i, tok := t[i]))) AS s
        |       FROM toks),
        |t2 AS (SELECT doc_id, s.pos AS pos, s.tok AS tok FROM tp),
        |j AS (SELECT t2.doc_id, t2.pos, t2.tok,
        |        cov.cpos IS NOT NULL AS removed
        |      FROM t2 LEFT JOIN cov ON t2.doc_id = cov.doc_id AND t2.pos = cov.cpos)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  md5(COALESCE(array_to_string(list(tok ORDER BY pos) FILTER (WHERE NOT removed), ' '), '')) AS clean_md5
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Max of w md5 pseudo-uniforms per doc (A-Res in hex-string space,
    // no libm pow); hex strings order identically in both engines
    // (bootstrap_ci precedent). Top-100 by (key DESC, doc_id).
    "weighted_sample" ->
      """WITH w AS (SELECT doc_id,
        |    CAST(1 + least(n_chars // 500, 9) AS BIGINT) AS weight
        |  FROM documents),
        |d AS (SELECT doc_id, weight,
        |    unnest(list_transform(generate_series(1, weight),
        |      i -> md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)))) AS u
        |  FROM w),
        |m AS (SELECT doc_id, any_value(weight) AS weight, max(u) AS key
        |      FROM d GROUP BY doc_id)
        |SELECT doc_id, weight, key FROM m
        |ORDER BY key DESC, doc_id LIMIT 100""".stripMargin,

    // Bucket hash on the GROUP key (source) — all docs of a source
    // share a split; same hex-bucket arithmetic as train_split.
    "grouped_split" ->
      """SELECT doc_id, source, substr(md5(source), 1, 2) AS bucket,
        |  CASE WHEN substr(md5(source), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(source), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Buckets of 64 tokens, batches of 32 in doc_id order inside each
    // bucket; padding = batch max − own length.
    "length_batching" ->
      """WITH l AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
        |    ROW_NUMBER() OVER (PARTITION BY n_tokens // 64 ORDER BY doc_id) AS rn
        |  FROM l),
        |b AS (SELECT doc_id, n_tokens, CAST(bucket AS BIGINT) AS bucket,
        |    CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
        |    CAST((rn - 1) % 32 AS BIGINT) AS pos_in_batch
        |  FROM r)
        |SELECT doc_id, n_tokens, bucket, batch_id, pos_in_batch,
        |  CAST(MAX(n_tokens) OVER (PARTITION BY bucket, batch_id) - n_tokens AS INT) AS padding
        |FROM b ORDER BY doc_id""".stripMargin,

    // First-8-token prefix md5; ≥ 2-member groups; saved prefill =
    // (n_docs − 1) · 8.
    "prefix_cache_groups" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |p AS (SELECT doc_id, md5(array_to_string(toks[1:8], ' ')) AS prefix_key
        |      FROM t WHERE len(toks) >= 8)
        |SELECT prefix_key, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS cache_owner,
        |  CAST((COUNT(*) - 1) * 8 AS BIGINT) AS tokens_saved
        |FROM p GROUP BY prefix_key HAVING COUNT(*) >= 2
        |ORDER BY prefix_key""".stripMargin,

    // Same planted patterns and RE2/Java-identical regexes as the
    // pii_redact oracle; per-source incidence + one rounded rate.
    "pii_by_source" ->
      """WITH s AS (
        |  SELECT source, text ||
        |    CASE WHEN doc_id % 3 > 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
        |      ELSE '' END AS synth
        |  FROM documents),
        |c AS (SELECT source,
        |    len(regexp_extract_all(synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
        |    len(regexp_extract_all(synth, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS p,
        |    len(regexp_extract_all(synth, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS i
        |  FROM s)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
        |  CAST(SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
        |  CAST(SUM(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
        |  CAST(SUM(e + p + i) AS BIGINT) AS total_hits,
        |  floor(CAST(SUM(e + p + i) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS hits_per_doc
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // Integer equal-share targets; slack REPORTED as unfilled.
    "mixture_plan" ->
      """WITH a AS (SELECT lang,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |      AS available_tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT *, CAST(COUNT(*) OVER () AS BIGINT) AS n_langs FROM a)
        |SELECT lang, available_tokens,
        |  least(available_tokens, 100000 // n_langs) AS target_tokens,
        |  (100000 // n_langs) - least(available_tokens, 100000 // n_langs) AS unfilled,
        |  floor(CAST(least(available_tokens, 100000 // n_langs) AS DOUBLE)
        |    / CAST(available_tokens AS DOUBLE) * 1e4 + 0.5) / 1e4 AS sample_frac
        |FROM w ORDER BY lang""".stripMargin,

    // Power-of-two buckets via binary-string length — no libm log2.
    "token_len_histogram" ->
      """WITH t AS (SELECT
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CASE WHEN n > 0 THEN CAST(length(bin(n)) AS INT) ELSE 0 END
        |        AS bucket, n FROM t)
        |SELECT bucket,
        |  CASE WHEN bucket > 0 THEN CAST(1 AS BIGINT) << (bucket - 1)
        |       ELSE CAST(0 AS BIGINT) END AS bucket_lo,
        |  (CAST(1 AS BIGINT) << bucket) - 1 AS bucket_hi,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS total_tokens,
        |  CAST(MIN(n) AS BIGINT) AS min_tokens,
        |  CAST(MAX(n) AS BIGINT) AS max_tokens
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // 0-based match position (pos), 1-based list slicing; left context
    // is the up-to-ctx tokens before the match, right the 3 after.
    "kwic_snippets" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |              FROM documents),
        |tp AS (SELECT doc_id, t,
        |         unnest(list_transform(generate_series(1, len(t)),
        |           i -> struct_pack(pos := i, tok := t[i]))) AS s
        |       FROM toks),
        |m AS (SELECT doc_id, t, s.pos AS p, s.tok AS tok FROM tp
        |      WHERE s.tok = 'spark')
        |SELECT doc_id, CAST(p - 1 AS INT) AS pos,
        |  COALESCE(array_to_string(t[greatest(p - 3, 1):p - 1], ' '), '') AS left_ctx,
        |  tok AS match,
        |  COALESCE(array_to_string(t[p + 1:p + 3], ' '), '') AS right_ctx
        |FROM m ORDER BY doc_id, pos""".stripMargin,

    // ---- Pinned-contract oracles -------------------------------------
    // The four below are DETERMINISTIC but not SQL-expressible (BPE
    // merge learning, banded-MinHash recall, KLL and HLL sketches have
    // no RNG — their output is a pure function of the corpus). The
    // literal frame IS the contract at the driver's verification scale
    // (sf0.01): any implementation drift changes the values and fails
    // the hash, upgrading what was a rows-only check. Scalatest
    // properties cover the algebra at every other scale
    // (TokenizerSpec, DedupSpec lsh-recall, Report/AlertsSpec sketch
    // error bands).

    // The first 5 merges learned from the sf0.01 corpus — the merge
    // table is the tokenizer's spec (Sennrich'16), stable by corpus.
    "bpe_merges" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS INTEGER), 'e', 'r', 'er', CAST(4568 AS BIGINT)),
        |  (CAST(2 AS INTEGER), 'i', 'n', 'in', CAST(2760 AS BIGINT)),
        |  (CAST(3 AS INTEGER), 'o', 'w', 'ow', CAST(2747 AS BIGINT)),
        |  (CAST(4 AS INTEGER), 'o', 'r', 'or', CAST(2696 AS BIGINT)),
        |  (CAST(5 AS INTEGER), 's', 't', 'st', CAST(2676 AS BIGINT))
        |) AS t("rank", "left", "right", merged, merged_count)""".stripMargin,

    // Ascending-capacity greedy water-fill; integer water level,
    // flooring remainder REPORTED (mixture_plan's contract).
    "waterfill_budget" ->
      """WITH caps AS (SELECT source,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS cap
        |  FROM documents GROUP BY 1),
        |s AS (SELECT source, cap,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cap, source) AS BIGINT) AS i,
        |    CAST(SUM(cap) OVER (ORDER BY cap, source) AS BIGINT) AS cum,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM caps),
        |f AS (SELECT *, cap * (n - i + 1) <= 15000 - (cum - cap) AS is_full FROM s),
        |g AS (SELECT *,
        |    MAX(CASE WHEN is_full THEN i ELSE 0 END) OVER () AS istar,
        |    MAX(CASE WHEN is_full THEN cum ELSE 0 END) OVER () AS cumstar FROM f),
        |a AS (SELECT source, cap,
        |    CASE WHEN is_full THEN cap
        |         ELSE (15000 - cumstar) // (n - istar) END AS alloc_tokens,
        |    is_full FROM g)
        |SELECT source, cap AS available_tokens,
        |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
        |  is_full AS fully_funded,
        |  floor(CAST(alloc_tokens AS DOUBLE) / CAST(cap AS DOUBLE) * 1e4 + 0.5) / 1e4
        |    AS sample_frac,
        |  CAST(15000 - SUM(alloc_tokens) OVER () AS BIGINT) AS undistributed
        |FROM a ORDER BY source""".stripMargin,

    // Round-robin along the content-keyed per-language rank:
    // stratified, balanced, reproducible.
    "kfold_assign" ->
      """WITH r AS (SELECT doc_id, lang,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(text), doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, CAST((rn - 1) % 5 AS INT) AS fold
        |FROM r ORDER BY doc_id""".stripMargin,

    // sklearn-"balanced" inverse-frequency weights, alpha = 0.
    "class_weights" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |t AS (SELECT *, CAST(SUM(n_docs) OVER () AS BIGINT) AS n_total,
        |        CAST(COUNT(*) OVER () AS BIGINT) AS n_classes FROM c)
        |SELECT lang, n_docs,
        |  floor(CAST(n_total AS DOUBLE)
        |    / (CAST(n_classes AS DOUBLE) * CAST(n_docs AS DOUBLE))
        |    * 1e4 + 0.5) / 1e4 AS weight
        |FROM t ORDER BY lang""".stripMargin,

    // Stub-decoder multimodal features (deterministic synthetic payloads).
    "multimodal_features" ->
      """WITH r(doc_id, width, height, n_bytes, features_fp) AS (VALUES
        |  (0,108,102,157,2390659930989298302), (1,99,98,406,5948455493410314606), (2,116,110,246,3165111457418796443), (3,120,106,147,-5761622609017425025), (4,101,98,250,-5449271558277710786),
        |  (5,98,104,314,7757586431932552392), (6,98,104,78,-5928045969521325384), (7,99,98,402,-2246376456799717114), (8,117,105,470,-691312828522123605), (9,112,115,391,-4216260157517622801),
        |  (10,112,115,214,-82848332923596002), (11,117,105,304,7140529609403349884), (12,99,98,348,-2782519536185663448), (13,120,106,346,-907936107753476639), (14,116,117,495,-5216924570879886432),
        |  (15,112,115,228,-7380146537072060581), (16,109,106,90,-6137441929464755024), (17,108,102,426,-5928250909303944282), (18,110,102,423,-1733281258795905389), (19,119,102,57,-1918772937857224699),
        |  (20,120,106,394,-2270363971645814615), (21,108,102,217,6192422396415936459), (22,116,109,454,2443051921394741924), (23,103,106,166,4090057702675564900), (24,116,112,535,5938844974118669363),
        |  (25,110,102,505,1647831497607685999), (26,117,98,63,-4312553027506662887), (27,108,102,346,1524148830694069786), (28,114,118,334,-4979217718090040755), (29,117,98,196,-8022633969854632087),
        |  (30,108,102,167,-3695256066322366327), (31,117,105,250,-868343178603698066), (32,117,98,513,-3826056075775703007), (33,109,106,247,-6165472998779304600), (34,116,112,165,7196621873018677034),
        |  (35,103,106,452,7079007022476931598), (36,116,117,135,-29389054432257915), (37,101,98,378,7412258119001322986), (38,110,102,203,-827235278456687839), (39,116,110,124,8093665561176326312),
        |  (40,112,115,421,37948997850534574), (41,109,106,337,5076505629401066945), (42,104,115,303,6054559093197221851), (43,116,117,152,-3573289400681940085), (44,101,98,128,-2683790332790317433),
        |  (45,110,102,432,4718111975754914327), (46,116,100,492,6101660121718011141), (47,98,33,224,4974381780473777565), (48,100,118,164,8084630882626189670), (49,114,118,256,1654413882863100231),
        |  (50,116,109,256,2899682091117994856), (51,112,115,326,-2524026175448520479), (52,113,98,63,-5476316498737897853), (53,104,115,190,3549226027805678598), (54,99,98,357,-6928244090131600530),
        |  (55,116,117,196,1831738139011966693), (56,110,102,549,1215409724930554249), (57,105,98,447,-246256066248271682), (58,100,112,389,5759150755227952117), (59,107,112,118,-4604820612671256123),
        |  (60,108,102,493,-4305613990903911495), (61,110,102,309,6099190567260313713), (62,104,115,392,-6652054170981502204), (63,116,100,529,-7249872486371591800), (64,107,112,135,-7099262195314765136),
        |  (65,117,105,99,922048058613684559), (66,98,33,352,1441147731145119914), (67,108,102,333,8768532689348586277), (68,108,102,186,2009343094611638778), (69,100,112,308,1163639389164615955),
        |  (70,117,105,509,-1519932927798224388), (71,103,106,336,-2379549818810001826), (72,105,98,230,-2641326957392080574), (73,107,112,503,974965774411191099), (74,101,98,48,-2153129497054566902),
        |  (75,100,118,312,2492225478489993678), (76,117,98,382,6029863915612489947), (77,98,33,319,7994898090941682612), (78,101,98,233,974631785027029756), (79,116,112,63,1627264610034299669),
        |  (80,113,98,172,4061271686461645163), (81,99,98,357,-1710060288922472835), (82,117,98,260,-6420457901350655392), (83,119,98,88,5198723549846847660), (84,105,98,403,-4126092252360196801),
        |  (85,115,112,155,-6400500158406910448), (86,119,98,138,4284125201163919978), (87,114,118,128,8694098675316276376), (88,100,118,289,7840007838296629357), (89,105,98,141,6152996305893178587),
        |  (90,115,112,112,5039166482245812948), (91,99,98,431,-3345286871193601336), (92,117,105,146,-8225850580644167266), (93,119,102,130,1684617285731946595), (94,116,109,143,5687325266796651676),
        |  (95,113,98,296,2971741964264707210), (96,100,112,454,-291723497434241254), (97,116,100,320,2053110797804682121), (98,116,113,526,-4491461603936125108), (99,100,112,196,8153890706192883731),
        |  (100,99,98,461,4736218112880284330), (101,117,98,232,5575049788081685357), (102,100,118,515,-1472539153104030664), (103,100,118,527,8102637550143614182), (104,115,112,246,5891373674942044094),
        |  (105,117,105,328,233404754912962794), (106,116,110,70,8484579325303568671), (107,105,98,212,2020592607319513083), (108,117,98,86,6727871103025559587), (109,113,98,395,8270413604634245948),
        |  (110,116,100,54,-7967115000813003326), (111,110,102,529,-5611567656867433112), (112,119,102,322,1822486750872583375), (113,116,100,428,2662761557489156901), (114,100,118,207,-2755988856753407454),
        |  (115,115,112,132,1856236356268302844), (116,116,110,62,2890312367774751442), (117,116,100,246,3526418177894162497), (118,117,98,396,-3874643133544470861), (119,100,112,87,1079577319654049714),
        |  (120,116,113,211,-1145296430347952021), (121,116,113,168,-4976919149232627159), (122,100,118,102,-6286799488845044725), (123,117,105,158,-6827571208159744078), (124,116,109,311,-5663887701596529205),
        |  (125,103,98,185,-975520736072582505), (126,108,102,509,2146984634260655585), (127,113,98,434,-6116636202827896053), (128,119,98,455,-6623141387287724586), (129,103,106,439,-3185338182654310547),
        |  (130,116,113,150,8293466747159202446), (131,115,112,293,-5791405262518046858), (132,107,112,330,4402583289162169230), (133,115,112,500,2622725748513403074), (134,114,118,132,1080644844835532244),
        |  (135,110,102,538,-309186364762388612), (136,98,33,334,-3864614407803619715), (137,109,106,233,-8279812105723016871), (138,101,98,364,-4094719566280067754), (139,116,117,294,-6989072393612292302),
        |  (140,104,115,157,-4322323397722324874), (141,116,100,432,-2377514984544091443), (142,117,105,512,5674994967441345115), (143,98,33,411,-6607325721886775689), (144,100,112,89,6952472050194089846),
        |  (145,116,109,401,-3376944451743367959), (146,119,102,129,-7837142829428202175), (147,104,115,442,-5616297197824707420), (148,119,98,197,-6253550400905398516), (149,117,105,157,-6176068097728822737),
        |  (150,116,112,274,-5383589796843357664), (151,116,117,519,7691696202650724358), (152,103,98,218,8454278749721026226), (153,100,112,433,9081732341640028533), (154,116,112,443,5826855745880636209),
        |  (155,120,106,367,6777884972150362049), (156,105,98,122,-1684985333035017154), (157,116,109,91,-4077726216225557467), (158,105,98,106,-2267251204433751297), (159,101,98,379,-5478475356497559982),
        |  (160,99,98,246,891617267950174713), (161,103,98,473,-4360156047299267044), (162,100,118,458,258571312397103042), (163,115,112,257,3247045765309913987), (164,108,102,108,4511583394210556865),
        |  (165,116,109,108,-7063882360209668615), (166,114,118,327,2965575077820200129), (167,108,102,475,2382691750975555879), (168,116,110,228,2457734080551827861), (169,120,106,398,2762244014131489139),
        |  (170,104,115,124,-3175916302301630785), (171,114,118,328,-4892974391150740807), (172,116,112,103,3413805963396841639), (173,104,115,540,527688853020055189), (174,116,109,315,-5163867157417569109),
        |  (175,104,115,158,4783562511260665520), (176,105,98,491,-8343179768366901303), (177,117,105,263,6315910716432375626), (178,103,98,214,3840216336286576648), (179,108,102,484,-5241847863828504932),
        |  (180,98,104,185,4128340904761033424), (181,103,106,109,-1104219403908004627), (182,98,104,343,3914455779666469193), (183,120,106,99,-1450068415987264151), (184,113,98,441,1403585581693386346),
        |  (185,110,102,305,1194585377406805965), (186,115,112,413,435789089768105869), (187,98,33,497,7790236219345849425), (188,110,102,246,3901158585377086383), (189,104,115,207,3934968907403621326),
        |  (190,117,98,428,4078977865883636319), (191,100,118,118,1028053147972292253), (192,103,106,132,-5551402392024498491), (193,109,106,168,-709022899208453338), (194,117,105,156,5947215753793105438),
        |  (195,116,110,318,-88973043990413243), (196,103,106,339,-3841984600826486907), (197,98,33,522,8188078585406375377), (198,116,109,254,-768304878119540343), (199,100,112,154,5413423190577399817),
        |  (200,113,98,303,5054972218264719495), (201,109,106,315,-7123737606170117101), (202,107,112,481,-7489097786603728589), (203,100,112,128,5909235387984353544), (204,119,102,117,-1821459319323052613),
        |  (205,107,112,376,-5682656581916397819), (206,108,102,130,5471059905933677057), (207,110,102,385,-6613057698095537028), (208,105,98,115,7286696487881969654), (209,99,106,223,-2732432551240547445),
        |  (210,100,118,515,-1657422670189227047), (211,100,112,279,7102731255416524885), (212,119,102,254,8346183304888906942), (213,103,98,467,6173983846120338063), (214,101,98,69,-362026384339234890),
        |  (215,116,109,527,3004551458878971341), (216,100,112,529,4363630299967804543), (217,117,98,350,8945006001307817968), (218,101,98,455,-7050913145599571447), (219,116,100,175,1372199457722566994),
        |  (220,113,98,553,4959656387886819462), (221,107,112,221,102525940022226185), (222,119,102,261,320935520689516573), (223,117,98,459,1455337445796633650), (224,116,100,442,3022285481383669068),
        |  (225,116,110,419,9019594895213096996), (226,113,98,109,-1821288971828761659), (227,107,112,468,-7204798021434306921), (228,105,98,464,8223277372078256657), (229,117,105,409,3169641735369416058),
        |  (230,117,105,311,-8461052419688381822), (231,98,33,155,-589474427552784331), (232,108,102,316,-7372581432810154373), (233,107,112,458,-2348195430301484014), (234,98,33,344,-3085481441036793573),
        |  (235,108,102,224,649317432717931094), (236,117,98,62,-6820701633675883287), (237,113,98,416,-7757545495084617989), (238,114,118,257,1061220145260547885), (239,103,98,164,6709592142251185813),
        |  (240,117,105,380,8234429945834228936), (241,98,33,511,1035206607291774143), (242,107,112,388,-5063955425622925317), (243,105,98,178,38753253809107840), (244,114,118,371,-3282581695063333144),
        |  (245,117,105,466,-4101531645281610401), (246,98,104,175,-3196062600534344071), (247,116,109,430,8685885956138313929), (248,100,118,446,-123051667050623764), (249,112,115,431,-3174062315375902733),
        |  (250,119,98,247,3636022391876327595), (251,113,98,523,415355032846293060), (252,116,113,252,-5856992154691580490), (253,108,102,197,1617131793996658496), (254,108,102,103,6361315472440044177),
        |  (255,115,112,157,-2994456111720100787), (256,104,115,62,8857574647602977938), (257,117,105,114,8962359376013185166), (258,116,110,396,-8836437972887741110), (259,109,106,259,-4636722292033039456),
        |  (260,112,115,134,7483166605012858964), (261,98,33,472,-4156461447854426119), (262,98,33,256,-1739196298358090216), (263,101,98,447,-7743238011276606523), (264,117,98,544,-8474182898318662472),
        |  (265,117,98,268,4069850703254064622), (266,109,106,225,-4827258761988288851), (267,110,102,424,2656491958103986252), (268,101,98,216,-31971039389363304), (269,101,98,467,5608299683044493511),
        |  (270,100,112,499,-6321942004375010088), (271,120,106,295,-4269064224618179605), (272,116,109,486,-2461037207346274712), (273,98,104,157,-1868674963183093222), (274,120,106,537,-3820131313671628142),
        |  (275,98,33,49,8686878834463753696), (276,120,106,538,7291754022058507983), (277,114,118,163,2677632690138966619), (278,115,112,394,387901181560384140), (279,119,98,281,4120364410741212314),
        |  (280,116,100,470,6531933130336589628), (281,115,112,171,1239582108394900486), (282,98,33,178,7828384064217413438), (283,100,118,471,1752425920558256184), (284,99,98,278,-3330569441605554679),
        |  (285,104,115,512,1256779556799262547), (286,119,98,258,-5579142961369723390), (287,100,118,101,-2748073655009413925), (288,98,33,176,-2474615840210711955), (289,98,33,224,-8240595919751137223),
        |  (290,116,113,530,2487181728298436918), (291,107,112,417,-4617509117008750196), (292,99,98,458,8676279265161622707), (293,100,112,385,722824274950336703), (294,115,112,470,-6147187606383406508),
        |  (295,112,115,186,-865454827819773623), (296,99,98,359,-7655290947726081680), (297,113,98,322,3112265817350089983), (298,112,115,189,-8649979693005680715), (299,114,118,502,6637536707656029384),
        |  (300,119,102,216,-7911966500612357682), (301,104,115,508,6584070874181343043), (302,117,98,484,-2789118039707484537), (303,100,118,454,1778036228348624870), (304,115,112,219,4597953244962933329),
        |  (305,103,106,63,-4335314656601120596), (306,112,115,421,-3847761645577561718), (307,117,105,302,-8323207486609246996), (308,99,98,97,-7488045389085540192), (309,115,112,238,5967723389423478625),
        |  (310,110,102,148,6063908665039801756), (311,110,102,495,-5535591736044260923), (312,116,112,369,-2256659355878743522), (313,103,106,87,7458224397738408004), (314,100,118,190,-2597032487893128891),
        |  (315,104,115,460,-3056438035725342198), (316,116,100,407,8662624342803350271), (317,110,102,408,-2836932402328897579), (318,116,117,456,5689124894806297140), (319,98,104,513,7054002348204202438),
        |  (320,117,105,405,6429676126972098047), (321,116,117,292,615871079579865992), (322,117,98,255,-1708416689715679637), (323,114,118,331,4654949235597718833), (324,104,115,228,6674447261601820143),
        |  (325,117,98,328,6458896395205984121), (326,116,100,198,-821947308600424237), (327,104,115,181,-7463286237978852539), (328,107,112,495,8866626754700930019), (329,110,102,353,6477860020248229073),
        |  (330,99,106,316,-8919177866606083271), (331,100,118,300,-9112122801306006345), (332,116,113,207,2048293737530430088), (333,105,98,177,3723496765182837115), (334,107,112,484,-5451726002887369241),
        |  (335,100,112,325,7823304217325597062), (336,117,98,376,-8838661754968531930), (337,103,106,242,4598910912640911505), (338,101,98,91,-5206261603898552404), (339,119,102,187,-3031360274311017051),
        |  (340,99,98,247,1019044803039087291), (341,113,98,427,3971484524704912532), (342,119,98,116,-3239517751893853288), (343,115,112,155,2065115241997996474), (344,115,112,417,-1152672420721716828),
        |  (345,109,106,323,1977450734352617672), (346,103,98,409,-6259634211401526993), (347,103,106,282,-3541191692000021864), (348,99,98,131,5157179878171114632), (349,114,118,457,3395921052355638372),
        |  (350,99,98,467,2618889670950879636), (351,98,33,368,8896379907806391335), (352,98,33,536,847519674270100819), (353,100,118,315,-6264110849597157279), (354,100,118,426,-4664217952862270695),
        |  (355,116,113,353,-8710842371972899796), (356,108,102,359,223121069121167591), (357,105,98,253,-7113414731086915838), (358,107,112,59,-2579235440651958092), (359,116,112,328,7330383968433162505),
        |  (360,119,102,443,-3423960826747578838), (361,120,106,363,1268410871643334698), (362,116,109,81,154862410410837362), (363,110,102,357,-8393739693663084), (364,103,98,270,3223137106120664363),
        |  (365,119,102,67,1819428605361319714), (366,109,106,311,-6994633238025404579), (367,116,100,213,6021926452762335894), (368,98,104,73,8684809774155221359), (369,116,112,273,7986467110067116692),
        |  (370,113,98,246,977454973394959631), (371,120,106,350,3990827387773560197), (372,100,112,142,-7120442259491648845), (373,110,102,388,2243788865409381563), (374,112,115,182,4425115972351612626),
        |  (375,116,117,343,8064504709157472778), (376,101,98,367,8011199330283718881), (377,105,98,234,7683914684756391956), (378,116,112,337,374437789529011387), (379,116,113,403,-363594555577203791),
        |  (380,120,106,443,-3759086695701522624), (381,116,100,353,-5373142800648220975), (382,100,118,132,168011659979106601), (383,117,105,254,1867368540299460202), (384,108,102,92,-3984713149417570001),
        |  (385,100,118,399,3201111230783007035), (386,103,106,471,5074887823449388225), (387,105,98,208,1103193500281941498), (388,109,106,345,-3385517108153267391), (389,110,102,152,5089228645682731936),
        |  (390,116,109,137,9175853505178628122), (391,120,106,238,2622298983165019985), (392,119,102,135,676266670838895463), (393,103,98,465,-4525829359803837517), (394,114,118,404,-8562915539757662621),
        |  (395,104,115,479,411966137815152303), (396,99,106,248,8620927098465837181), (397,117,98,294,-1358078466269367171), (398,116,112,105,7197151796964571025), (399,100,112,309,-1914323566132422164),
        |  (400,101,98,134,-1075761817406658311), (401,108,102,438,1289906677970662826), (402,99,106,160,2899102845713377208), (403,112,115,473,-1609560700778267860), (404,119,98,221,1695048876355423317),
        |  (405,105,98,314,4167815954125371332), (406,117,98,460,3738264767378810119), (407,105,98,108,-8013717498788169960), (408,114,118,87,7128422245120637098), (409,116,110,273,336387180054647878),
        |  (410,115,112,413,-1305236905637180650), (411,119,102,411,6293466075131408997), (412,98,104,365,1137165095939365478), (413,110,102,428,3349952723037745762), (414,113,98,408,5014294978944080023),
        |  (415,117,105,313,4794757851044992017), (416,108,102,287,798567604940333611), (417,120,106,520,-1934764458740923400), (418,98,104,439,-6411263217043075000), (419,115,112,114,3496978274301582822),
        |  (420,103,98,461,895046512254373017), (421,108,102,460,7397914899029896744), (422,107,112,365,-898702500966430260), (423,107,112,363,6603443190618698460), (424,107,112,409,-6803794029262523711),
        |  (425,98,33,131,7168668535720754800), (426,110,102,452,-3138596776695473727), (427,98,33,420,9041270314337091404), (428,103,106,279,-1951713483270361934), (429,114,118,537,3287918416138157447),
        |  (430,100,118,399,5949110513737068727), (431,119,102,307,-3258737552627614317), (432,116,100,359,-172097838466318165), (433,117,105,176,5409726284078606433), (434,100,112,423,-7709838515070439096),
        |  (435,113,98,167,-5134738603868397894), (436,104,115,277,1023784651222515300), (437,112,115,440,-5268385035702884973), (438,103,98,172,-3733274317052201357), (439,104,115,184,-2400813972245707435),
        |  (440,100,118,243,5594887001684208339), (441,116,109,542,405863922745148912), (442,116,117,455,-1331228507218261857), (443,99,106,280,-3645686900530142946), (444,108,102,419,-5199497336632092277),
        |  (445,116,110,307,-2008938113081092534), (446,101,98,132,6084976224231483624), (447,117,105,505,-258807720665394609), (448,116,109,286,-4512097662281618514), (449,103,106,177,188718760041765010),
        |  (450,117,105,142,5767198470309259052), (451,98,33,112,8745238990344356430), (452,115,112,358,171204786846068421), (453,103,106,519,-5470334817823046103), (454,116,117,153,3907753999224782630),
        |  (455,117,98,59,8918077446214286053), (456,103,98,114,8956826636478123173), (457,116,100,202,-8696166413899345601), (458,108,102,323,67859894928446176), (459,99,98,376,3380134191834599669),
        |  (460,98,104,261,1781952707068070862), (461,115,112,372,704660095428167862), (462,108,102,327,7897519974972997533), (463,103,106,491,-6104829718406991043), (464,99,98,204,-490592394645533167),
        |  (465,109,106,320,-8077150535122528016), (466,99,98,471,-7241776145582483506), (467,116,112,360,3123665922239570074), (468,100,112,207,444238265709786771), (469,115,112,57,2757218335001825720),
        |  (470,98,104,232,-6959009945941399588), (471,99,98,335,6819946469631629862), (472,98,104,208,-8803644721931995659), (473,99,98,293,1907852554282588161), (474,112,115,356,7019616865575255009),
        |  (475,109,106,77,-4703339028530119001), (476,105,98,84,916733010411535210), (477,109,106,151,-7578730591819274416), (478,120,106,290,1828918780849226097), (479,116,112,389,4196454217865589747),
        |  (480,113,98,359,4465044075255656954), (481,109,106,85,8608452254609303107), (482,103,106,165,-4224011923172440154), (483,107,112,245,1539770439280141431), (484,119,98,221,-740791030801367330),
        |  (485,116,113,129,-7842901753479846710), (486,113,98,171,3214472087548832633), (487,108,102,321,6406969548950889376), (488,119,98,205,-5020671266322414133), (489,100,118,317,2343524094975679474),
        |  (490,120,106,271,2148000499042559452), (491,100,112,368,333870262690138658), (492,119,98,77,-688645437559186158), (493,103,106,465,-324583371772074437), (494,116,112,206,7803089601672541442),
        |  (495,103,106,384,8535369678139019753), (496,117,105,457,8834217611962253139), (497,120,106,123,-2583941609913889424), (498,119,98,485,1792404679759455654), (499,109,106,166,2142656942090719754))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height, CAST(n_bytes AS INTEGER) AS n_bytes, CAST(features_fp AS BIGINT) AS features_fp
        |FROM r""".stripMargin,

    // Learned-BPE segmentation fertility per doc.
    "bpe_segment" ->
      """WITH r(doc_id, n_words, n_subwords, fertility) AS (VALUES
        |  (0,32,115,3.5938), (1,72,288,4.0), (2,45,183,4.0667), (3,27,107,3.963), (4,45,179,3.9778), (5,56,230,4.1071),
        |  (6,15,59,3.9333), (7,72,284,3.9444), (8,84,341,4.0595), (9,74,277,3.7432), (10,39,158,4.0513), (11,58,219,3.7759),
        |  (12,65,239,3.6769), (13,60,246,4.1), (14,87,362,4.1609), (15,41,163,3.9756), (16,16,66,4.125), (17,77,299,3.8831),
        |  (18,75,301,4.0133), (19,11,40,3.6364), (20,68,276,4.0588), (21,37,153,4.1351), (22,81,331,4.0864), (23,30,121,4.0333),
        |  (24,97,383,3.9485), (25,94,352,3.7447), (26,12,48,4.0), (27,64,255,3.9844), (28,60,237,3.95), (29,34,140,4.1176),
        |  (30,31,118,3.8065), (31,43,183,4.2558), (32,93,369,3.9677), (33,46,171,3.7174), (34,29,113,3.8966), (35,85,320,3.7647),
        |  (36,22,96,4.3636), (37,69,268,3.8841), (38,36,140,3.8889), (39,23,90,3.913), (40,73,304,4.1644), (41,61,247,4.0492),
        |  (42,56,211,3.7679), (43,28,110,3.9286), (44,24,92,3.8333), (45,80,318,3.975), (46,86,357,4.1512), (47,41,166,4.0488),
        |  (48,30,114,3.8), (49,46,191,4.1522), (50,45,188,4.1778), (51,58,235,4.0517), (52,13,47,3.6154), (53,34,141,4.1471),
        |  (54,65,259,3.9846), (55,37,136,3.6757), (56,97,395,4.0722), (57,83,317,3.8193), (58,72,279,3.875), (59,24,85,3.5417),
        |  (60,93,356,3.828), (61,59,231,3.9153), (62,72,279,3.875), (63,96,380,3.9583), (64,25,96,3.84), (65,19,71,3.7368),
        |  (66,62,251,4.0484), (67,61,244,4.0), (68,33,132,4.0), (69,57,211,3.7018), (70,94,367,3.9043), (71,60,240,4.0),
        |  (72,42,163,3.881), (73,93,364,3.914), (74,10,38,3.8), (75,60,220,3.6667), (76,71,278,3.9155), (77,57,235,4.1228),
        |  (78,42,164,3.9048), (79,12,45,3.75), (80,32,124,3.875), (81,63,256,4.0635), (82,47,186,3.9574), (83,15,64,4.2667),
        |  (84,72,297,4.125), (85,31,115,3.7097), (86,23,98,4.2609), (87,23,92,4.0), (88,51,207,4.0588), (89,27,107,3.963),
        |  (90,24,77,3.2083), (91,77,307,3.987), (92,26,104,4.0), (93,25,96,3.84), (94,24,101,4.2083), (95,55,216,3.9273),
        |  (96,81,326,4.0247), (97,59,232,3.9322), (98,93,387,4.1613), (99,38,144,3.7895), (100,83,332,4.0), (101,42,163,3.881),
        |  (102,91,381,4.1868), (103,93,377,4.0538), (104,44,179,4.0682), (105,60,237,3.95), (106,13,47,3.6154), (107,40,147,3.675),
        |  (108,16,66,4.125), (109,70,283,4.0429), (110,11,40,3.6364), (111,94,389,4.1383), (112,58,224,3.8621), (113,79,301,3.8101),
        |  (114,36,147,4.0833), (115,24,95,3.9583), (116,10,44,4.4), (117,47,180,3.8298), (118,70,288,4.1143), (119,16,64,4.0),
        |  (120,37,158,4.2703), (121,30,120,4.0), (122,19,74,3.8947), (123,28,109,3.8929), (124,60,223,3.7167), (125,34,131,3.8529),
        |  (126,90,356,3.9556), (127,83,318,3.8313), (128,81,321,3.963), (129,81,317,3.9136), (130,29,107,3.6897), (131,54,206,3.8148),
        |  (132,62,244,3.9355), (133,94,357,3.7979), (134,24,95,3.9583), (135,97,391,4.0309), (136,63,242,3.8413), (137,43,168,3.907),
        |  (138,66,258,3.9091), (139,56,208,3.7143), (140,28,112,4.0), (141,75,317,4.2267), (142,95,363,3.8211), (143,72,300,4.1667),
        |  (144,18,66,3.6667), (145,72,286,3.9722), (146,22,94,4.2727), (147,84,320,3.8095), (148,37,143,3.8649), (149,27,113,4.1852),
        |  (150,48,193,4.0208), (151,94,374,3.9787), (152,39,162,4.1538), (153,78,312,4.0), (154,83,315,3.7952), (155,67,257,3.8358),
        |  (156,21,86,4.0952), (157,17,65,3.8235), (158,17,80,4.7059), (159,69,274,3.971), (160,44,170,3.8636), (161,86,338,3.9302),
        |  (162,82,325,3.9634), (163,45,184,4.0889), (164,19,79,4.1579), (165,21,79,3.7619), (166,61,232,3.8033), (167,85,343,4.0353),
        |  (168,40,158,3.95), (169,69,284,4.1159), (170,22,93,4.2273), (171,61,233,3.8197), (172,20,75,3.75), (173,97,392,4.0412),
        |  (174,57,224,3.9298), (175,29,114,3.931), (176,88,359,4.0795), (177,49,188,3.8367), (178,38,159,4.1842), (179,87,345,3.9655),
        |  (180,32,134,4.1875), (181,19,80,4.2105), (182,64,248,3.875), (183,20,67,3.35), (184,80,318,3.975), (185,58,228,3.931),
        |  (186,80,278,3.475), (187,91,356,3.9121), (188,47,176,3.7447), (189,37,159,4.2973), (190,78,306,3.9231), (191,21,87,4.1429),
        |  (192,26,98,3.7692), (193,31,122,3.9355), (194,29,110,3.7931), (195,58,237,4.0862), (196,59,240,4.0678), (197,95,371,3.9053),
        |  (198,47,183,3.8936), (199,30,114,3.8), (200,53,214,4.0377), (201,56,227,4.0536), (202,91,337,3.7033), (203,24,93,3.875),
        |  (204,21,81,3.8571), (205,69,267,3.8696), (206,25,96,3.84), (207,73,277,3.7945), (208,22,82,3.7273), (209,44,161,3.6591),
        |  (210,94,366,3.8936), (211,51,200,3.9216), (212,43,183,4.2558), (213,88,334,3.7955), (214,13,50,3.8462), (215,98,372,3.7959),
        |  (216,92,380,4.1304), (217,66,249,3.7727), (218,81,332,4.0988), (219,29,125,4.3103), (220,99,401,4.0505), (221,42,157,3.7381),
        |  (222,51,198,3.8824), (223,85,334,3.9294), (224,77,318,4.1299), (225,76,309,4.0658), (226,20,82,4.1), (227,81,336,4.1481),
        |  (228,86,332,3.8605), (229,74,302,4.0811), (230,55,225,4.0909), (231,27,110,4.0741), (232,58,228,3.931), (233,83,332,4.0),
        |  (234,66,247,3.7424), (235,39,163,4.1795), (236,12,47,3.9167), (237,79,298,3.7722), (238,48,182,3.7917), (239,30,115,3.8333),
        |  (240,70,273,3.9), (241,92,375,4.0761), (242,69,272,3.942), (243,33,126,3.8182), (244,67,266,3.9701), (245,83,338,4.0723),
        |  (246,34,131,3.8529), (247,80,299,3.7375), (248,79,322,4.0759), (249,82,305,3.7195), (250,44,183,4.1591), (251,94,375,3.9894),
        |  (252,46,178,3.8696), (253,38,139,3.6579), (254,19,76,4.0), (255,28,111,3.9643), (256,11,46,4.1818), (257,21,84,4.0),
        |  (258,74,290,3.9189), (259,45,189,4.2), (260,26,97,3.7308), (261,84,336,4.0), (262,47,187,3.9787), (263,83,318,3.8313),
        |  (264,99,391,3.9495), (265,47,198,4.2128), (266,41,159,3.878), (267,78,312,4.0), (268,39,159,4.0769), (269,86,330,3.8372),
        |  (270,93,353,3.7957), (271,53,211,3.9811), (272,92,350,3.8043), (273,28,117,4.1786), (274,96,384,4.0), (275,10,31,3.1),
        |  (276,96,384,4.0), (277,32,119,3.7188), (278,72,289,4.0139), (279,51,202,3.9608), (280,88,337,3.8295), (281,30,117,3.9),
        |  (282,32,133,4.1563), (283,84,332,3.9524), (284,51,203,3.9804), (285,94,371,3.9468), (286,46,190,4.1304), (287,18,74,4.1111),
        |  (288,32,127,3.9688), (289,38,157,4.1316), (290,94,390,4.1489), (291,76,293,3.8553), (292,86,323,3.7558), (293,71,276,3.8873),
        |  (294,83,335,4.0361), (295,32,132,4.125), (296,66,254,3.8485), (297,62,229,3.6935), (298,32,141,4.4063), (299,94,352,3.7447),
        |  (300,39,148,3.7949), (301,93,368,3.957), (302,88,350,3.9773), (303,83,321,3.8675), (304,42,160,3.8095), (305,11,47,4.2727),
        |  (306,75,304,4.0533), (307,54,216,4.0), (308,17,71,4.1765), (309,44,168,3.8182), (310,27,107,3.963), (311,90,360,4.0),
        |  (312,67,268,4.0), (313,18,66,3.6667), (314,37,133,3.5946), (315,87,322,3.7011), (316,74,303,4.0946), (317,72,282,3.9167),
        |  (318,83,315,3.7952), (319,87,363,4.1724), (320,75,285,3.8), (321,50,208,4.16), (322,45,186,4.1333), (323,62,235,3.7903),
        |  (324,43,162,3.7674), (325,60,242,4.0333), (326,36,141,3.9167), (327,33,125,3.7879), (328,89,350,3.9326), (329,66,250,3.7879),
        |  (330,59,229,3.8814), (331,51,212,4.1569), (332,36,155,4.3056), (333,32,125,3.9063), (334,92,340,3.6957), (335,61,236,3.8689),
        |  (336,68,272,4.0), (337,43,175,4.0698), (338,18,65,3.6111), (339,32,139,4.3438), (340,44,177,4.0227), (341,80,303,3.7875),
        |  (342,21,88,4.1905), (343,29,114,3.931), (344,77,295,3.8312), (345,59,222,3.7627), (346,74,293,3.9595), (347,51,208,4.0784),
        |  (348,24,97,4.0417), (349,84,330,3.9286), (350,85,327,3.8471), (351,67,261,3.8955), (352,97,375,3.866), (353,59,221,3.7458),
        |  (354,76,300,3.9474), (355,61,255,4.1803), (356,67,260,3.8806), (357,47,181,3.8511), (358,11,42,3.8182), (359,60,236,3.9333),
        |  (360,79,320,4.0506), (361,65,266,4.0923), (362,15,59,3.9333), (363,64,257,4.0156), (364,47,190,4.0426), (365,12,48,4.0),
        |  (366,55,225,4.0909), (367,39,153,3.9231), (368,13,56,4.3077), (369,50,198,3.96), (370,41,182,4.439), (371,65,249,3.8308),
        |  (372,28,99,3.5357), (373,70,279,3.9857), (374,31,129,4.1613), (375,63,241,3.8254), (376,69,263,3.8116), (377,43,166,3.8605),
        |  (378,64,234,3.6563), (379,72,286,3.9722), (380,80,311,3.8875), (381,63,262,4.1587), (382,25,96,3.84), (383,44,186,4.2273),
        |  (384,17,66,3.8824), (385,70,278,3.9714), (386,88,334,3.7955), (387,39,144,3.6923), (388,63,247,3.9206), (389,28,110,3.9286),
        |  (390,26,99,3.8077), (391,43,168,3.907), (392,23,93,4.0435), (393,81,332,4.0988), (394,71,286,4.0282), (395,81,343,4.2346),
        |  (396,44,181,4.1136), (397,53,212,4.0), (398,19,77,4.0526), (399,57,221,3.8772), (400,25,94,3.76), (401,76,311,4.0921),
        |  (402,31,111,3.5806), (403,85,331,3.8941), (404,43,158,3.6744), (405,56,231,4.125), (406,83,323,3.8916), (407,20,80,4.0),
        |  (408,16,64,4.0), (409,53,197,3.717), (410,75,289,3.8533), (411,79,293,3.7089), (412,71,257,3.6197), (413,79,315,3.9873),
        |  (414,78,292,3.7436), (415,58,225,3.8793), (416,53,200,3.7736), (417,93,367,3.9462), (418,77,317,4.1169), (419,20,83,4.15),
        |  (420,80,329,4.1125), (421,83,325,3.9157), (422,66,265,4.0152), (423,65,266,4.0923), (424,73,289,3.9589), (425,24,98,4.0833),
        |  (426,82,319,3.8902), (427,79,306,3.8734), (428,48,208,4.3333), (429,95,392,4.1263), (430,72,290,4.0278), (431,56,220,3.9286),
        |  (432,65,257,3.9538), (433,31,128,4.129), (434,79,303,3.8354), (435,31,120,3.871), (436,51,197,3.8627), (437,81,316,3.9012),
        |  (438,31,121,3.9032), (439,33,135,4.0909), (440,42,174,4.1429), (441,99,384,3.8788), (442,84,328,3.9048), (443,51,195,3.8235),
        |  (444,75,299,3.9867), (445,58,225,3.8793), (446,25,95,3.8), (447,93,364,3.914), (448,54,203,3.7593), (449,33,124,3.7576),
        |  (450,25,101,4.04), (451,20,80,4.0), (452,65,255,3.9231), (453,97,366,3.7732), (454,28,113,4.0357), (455,11,45,4.0909),
        |  (456,23,85,3.6957), (457,37,144,3.8919), (458,59,236,4.0), (459,69,275,3.9855), (460,49,185,3.7755), (461,67,261,3.8955),
        |  (462,60,239,3.9833), (463,91,357,3.9231), (464,35,145,4.1429), (465,62,222,3.5806), (466,86,336,3.907), (467,66,262,3.9697),
        |  (468,39,146,3.7436), (469,10,40,4.0), (470,42,169,4.0238), (471,63,244,3.873), (472,38,149,3.9211), (473,53,207,3.9057),
        |  (474,67,254,3.791), (475,15,58,3.8667), (476,16,64,4.0), (477,28,104,3.7143), (478,50,206,4.12), (479,69,270,3.913),
        |  (480,64,257,4.0156), (481,16,63,3.9375), (482,30,117,3.9), (483,47,172,3.6596), (484,43,159,3.6977), (485,23,94,4.087),
        |  (486,32,123,3.8438), (487,59,229,3.8814), (488,36,151,4.1944), (489,57,225,3.9474), (490,50,198,3.96), (491,67,264,3.9403),
        |  (492,13,59,4.5385), (493,88,326,3.7045), (494,38,151,3.9737), (495,70,283,4.0429), (496,81,338,4.1728), (497,20,87,4.35),
        |  (498,89,350,3.9326), (499,33,119,3.6061))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_words AS BIGINT) AS n_words, CAST(n_subwords AS BIGINT) AS n_subwords, CAST(fertility AS DOUBLE) AS fertility
        |FROM r""".stripMargin,
  )
}
