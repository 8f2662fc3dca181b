package graft.oracles

/** DuckDB oracle SQL for the similarity family — split out of SparkEntry
  * (round 9) purely for registry file size; keys and SQL are the
  * unchanged driver contract (SURVEY §5). */
private[graft] object SimilarityOracles {
  import OracleFragments._

  val sql: Map[String, String] = Map(

    "knn_topk" -> KnnTopkSql,

    // k-center greedy traversal, unrolled to k=8 CTE stages; the
    // cosine rides the explicit DOUBLE path (margin_mining's lesson)
    // and every argmax is ORDER BY best DESC, vec_id LIMIT 1 — the
    // same integer-grid tie rule as the engine's loop.
    "kcenter_select" -> {
      def dist(e1: String, e2: String): String =
        s"1000000 - CAST(floor(list_inner_product($e1, $e2) / " +
          s"(sqrt(list_inner_product($e1, $e1)) * " +
          s"sqrt(list_inner_product($e2, $e2))) * 1e6 + 0.5) AS BIGINT)"
      val k = 8
      val sb = new StringBuilder
      sb ++= "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),\n"
      sb ++= "c1 AS (SELECT vec_id AS c_id, emb AS c_emb FROM v ORDER BY vec_id LIMIT 1),\n"
      sb ++= s"d1 AS (SELECT vec_id, emb, ${dist("emb", "c_emb")} AS best " +
        "FROM v, c1 WHERE vec_id <> c_id)"
      for (i <- 2 to k) {
        sb ++= s",\nc$i AS (SELECT vec_id AS c_id, emb AS c_emb, best AS r6 " +
          s"FROM d${i - 1} ORDER BY best DESC, vec_id LIMIT 1)"
        if (i < k)
          sb ++= s",\nd$i AS (SELECT d.vec_id, d.emb, " +
            s"least(best, ${dist("d.emb", "c_emb")}) AS best " +
            s"FROM d${i - 1} d, c$i WHERE d.vec_id <> c_id)"
      }
      sb ++= "\nSELECT 1 AS sel_order, c_id AS vec_id, CAST(NULL AS DOUBLE) AS radius FROM c1"
      for (i <- 2 to k)
        sb ++= s"\nUNION ALL SELECT $i, c_id, CAST(r6 AS DOUBLE) / 1e6 FROM c$i"
      sb ++= "\nORDER BY sel_order"
      sb.toString
    },

    // Margin mining: cosines quantize to the 1e-6 integer grid FIRST
    // (floor form), so the top-k averages are exact integer sums in
    // any order; the margin's double combination mirrors the Spark
    // order and the accepted flag compares the same double. The
    // cosine itself is the explicit DOUBLE-precision sequential form
    // (inner products over DOUBLE[], two sqrts, one division) — NOT
    // list_cosine_similarity, which computes in FLOAT for FLOAT[]
    // input and lands one 1e-6 grid cell away from Spark's double
    // fold at quantization boundaries (3 of 50 pairs at sf0.01).
    "margin_mining" ->
      """WITH a AS (SELECT vec_id AS a_id,
        |             CAST(embedding AS DOUBLE[]) AS a_emb
        |           FROM embeddings WHERE label = 0),
        |b AS (SELECT vec_id AS b_id,
        |        CAST(embedding AS DOUBLE[]) AS b_emb
        |      FROM embeddings WHERE label = 1),
        |s AS (SELECT a_id, b_id,
        |        CAST(floor(list_inner_product(a_emb, b_emb)
        |          / (sqrt(list_inner_product(a_emb, a_emb))
        |             * sqrt(list_inner_product(b_emb, b_emb)))
        |          * 1e6 + 0.5) AS BIGINT) AS c6
        |      FROM a, b WHERE a_id <> b_id),
        |ra AS (SELECT *, ROW_NUMBER() OVER
        |         (PARTITION BY a_id ORDER BY c6 DESC, b_id) AS ra FROM s),
        |rb AS (SELECT *, ROW_NUMBER() OVER
        |         (PARTITION BY b_id ORDER BY c6 DESC, a_id) AS rb FROM s),
        |avga AS (SELECT a_id, CAST(SUM(c6) AS BIGINT) AS sa,
        |           CAST(COUNT(*) AS BIGINT) AS ka
        |         FROM ra WHERE ra <= 4 GROUP BY a_id),
        |avgb AS (SELECT b_id, CAST(SUM(c6) AS BIGINT) AS sb,
        |           CAST(COUNT(*) AS BIGINT) AS kb
        |         FROM rb WHERE rb <= 4 GROUP BY b_id),
        |m AS (SELECT ra.a_id, ra.b_id, c6,
        |        CAST(c6 AS DOUBLE) / NULLIF(
        |          (CAST(sa AS DOUBLE) / CAST(ka AS DOUBLE)
        |            + CAST(sb AS DOUBLE) / CAST(kb AS DOUBLE)) / 2.0, 0.0)
        |          AS margin
        |      FROM ra JOIN avga USING (a_id) JOIN avgb USING (b_id)
        |      WHERE ra = 1)
        |SELECT a_id, b_id, CAST(c6 AS DOUBLE) / 1e6 AS cos,
        |  floor(margin * 1e6 + 0.5) / 1e6 AS margin,
        |  margin > 1.05 AS accepted
        |FROM m ORDER BY a_id""".stripMargin,

    // RRF hybrid retrieval: ranks are integers with id tie-breaks,
    // each reciprocal is one IEEE division, the fused score one sum
    // of two exactly-rounded doubles → engine-identical before round4.
    "hybrid_search" ->
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
        |sc AS (SELECT d.doc_id,
        |    CAST(floor(
        |      (CAST(tf AS DOUBLE) * 2.2 /
        |        (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |          (CAST(len AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE))))) *
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * 1e6 + 0.5) AS BIGINT) AS qw
        |  FROM d JOIN lens ON d.doc_id = lens.doc_id, tot),
        |bm AS (SELECT doc_id, floor(CAST(SUM(qw) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS score
        |  FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
        |sp AS (SELECT doc_id AS id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS sparse_rank
        |  FROM bm),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT emb AS q_emb FROM e WHERE vec_id = 0),
        |dn0 AS (SELECT vec_id AS id, ROUND(list_cosine_similarity(emb, q_emb), 6) AS score
        |  FROM e, q WHERE vec_id <> 0),
        |dn AS (SELECT id, dense_rank FROM (
        |    SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS INT) AS dense_rank
        |    FROM dn0) WHERE dense_rank <= 20)
        |SELECT COALESCE(sp.id, dn.id) AS id, sparse_rank, dense_rank,
        |  floor((COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(sparse_rank AS DOUBLE)), CAST(0.0 AS DOUBLE))
        |       + COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(dense_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)))
        |    * 1e4 + 0.5) / 1e4 AS rrf
        |FROM sp FULL OUTER JOIN dn ON sp.id = dn.id
        |ORDER BY rrf DESC, id LIMIT 10""".stripMargin,

    // Dense decontamination: fixed 16-vector bench side, per-vector
    // max of round6 cosines (the knn_topk cross-engine contract).
    "sem_decontaminate" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |b AS (SELECT emb AS b_emb FROM e WHERE vec_id < 16),
        |s AS (SELECT c.vec_id, ROUND(list_cosine_similarity(c.emb, b_emb), 6) AS s
        |  FROM e c, b WHERE c.vec_id >= 16)
        |SELECT vec_id, MAX(s) AS max_bench_sim,
        |  MAX(s) >= CAST(0.35 AS DOUBLE) AS contaminated
        |FROM s GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "ann_ivf" -> AnnIvfSql,
    "nprobe_sweep" -> NprobeSweepSql,
    "ivf_balance" -> IvfBalanceSql,

    // Linear-kernel MMD^2 per label vs rest: 1e-6 grid per-dim sums,
    // complement via per-dim window totals, 1e-12 grid means by
    // HUGEINT division, argmax by (gap2 DESC, pos) row_number.
    "embedding_mmd" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |x AS (SELECT label, i - 1 AS pos,
        |    CAST(floor(emb[i] * 1e6 + 0.5) AS BIGINT) AS q
        |  FROM e, unnest(generate_series(1, len(emb))) AS u(i)),
        |pd AS (SELECT label, pos, CAST(SUM(q) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM x GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(SUM(s) OVER (PARTITION BY pos) AS BIGINT) AS st,
        |    CAST(SUM(cnt) OVER (PARTITION BY pos) AS BIGINT) AS nt
        |  FROM pd),
        |gp AS (SELECT label, pos, cnt, nt - cnt AS cnt_out,
        |    (CAST(s AS HUGEINT) * 1000000) // cnt AS mq_in,
        |    (CAST(st - s AS HUGEINT) * 1000000) // (nt - cnt) AS mq_out
        |  FROM w WHERE nt > cnt),
        |g2 AS (SELECT label, pos, cnt, cnt_out,
        |    (mq_in - mq_out) * (mq_in - mq_out) AS gap2
        |  FROM gp),
        |a AS (SELECT label, CAST(MAX(cnt) AS BIGINT) AS n_in,
        |    CAST(MAX(cnt_out) AS BIGINT) AS n_out, SUM(gap2) AS tg2
        |  FROM g2 GROUP BY 1),
        |tp AS (SELECT label, pos, gap2,
        |    ROW_NUMBER() OVER (PARTITION BY label
        |      ORDER BY gap2 DESC, pos) AS rn
        |  FROM g2)
        |SELECT a.label, a.n_in, a.n_out,
        |  floor(CAST(tg2 AS DOUBLE) / 1e24 * 1e6 + 0.5) / 1e6 AS mmd2,
        |  CAST(t.pos AS BIGINT) AS top_dim,
        |  CASE WHEN tg2 = 0 THEN NULL
        |       ELSE CAST((t.gap2 * 1000000) // tg2 AS BIGINT)
        |  END AS top_dim_share_ppm
        |FROM a JOIN tp t ON t.label = a.label AND t.rn = 1
        |ORDER BY a.label""".stripMargin,

    // Dim profile: lateral index unnest, 1e-6 grid HUGEINT moments,
    // fixed-order std chain, dead flag on the published 6-dp std.
    "dim_profile" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |x AS (SELECT i - 1 AS dim,
        |    CAST(floor(emb[i] * 1e6 + 0.5) AS BIGINT) AS q
        |  FROM e, unnest(generate_series(1, len(emb))) AS u(i)),
        |m AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(q AS HUGEINT)) AS s,
        |    SUM(CAST(q AS HUGEINT) * q) AS ss,
        |    CAST(MIN(q) AS BIGINT) AS mn, CAST(MAX(q) AS BIGINT) AS mx
        |  FROM x GROUP BY dim),
        |r AS (SELECT dim, n,
        |    floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
        |      AS mean,
        |    floor(sqrt((CAST(ss AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)) / 1e6 * 1e6 + 0.5) / 1e6 AS std,
        |    floor(CAST(mn AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS min_v,
        |    floor(CAST(mx AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS max_v
        |  FROM m)
        |SELECT *, std < 0.01 AS dead FROM r ORDER BY dim""".stripMargin,

    "embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |m AS (SELECT vec_id, emb,
        |        list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS maxabs
        |      FROM e),
        |s AS (SELECT vec_id, emb,
        |        CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale
        |      FROM m)
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  array_to_string(list_transform(emb, x -> CAST(round(x * scale) AS INT)), ',') AS q8
        |FROM s ORDER BY vec_id""".stripMargin,

    // Spherical k-means, 2 Lloyd iterations, seeds = first 8 vectors.
    // Cosine scores and centroid components round to 6 places before
    // any comparison; ties break to the lowest centroid id — so both
    // engines walk identical assignments.
    "kmeans_embed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |a2 AS (SELECT vec_id, c_id AS cluster, cs FROM (
        |         SELECT vec_id, c_id, cs,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2) WHERE rn = 1)
        |SELECT vec_id, cluster, cs AS sim FROM a2 ORDER BY vec_id""".stripMargin,

    // Int8 fidelity: reconstruction arithmetic mirrored exactly
    // (round(x*127/maxabs)*maxabs/127), 6-dp cosines before ranks.
    // Oracle GENERATED from the same rpSigns matrix the Spark plan
    // embeds (one source of truth); the projection is the identical
    // left-to-right sum of CAST(embedding[i]) * ±1.0 terms, so the
    // doubles agree bit-for-bit before the shared ROUND.
    "rp_recall" -> {
      val signs = graft.operators.Similarity.rpSigns(64, 16)
      val projList = (0 until 16).map { j =>
        (0 until 64).map { i =>
          s"CAST(emb[${i + 1}] AS DOUBLE) * ${if (signs(i)(j) > 0) "1.0" else "-1.0"}"
        }.mkString("(", " + ", ")")
      }.mkString("list_value(", ", ", ")")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |p AS (SELECT vec_id, $projList AS pemb FROM e),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 8),
        |sx AS (SELECT q_id, e.vec_id AS n_id,
        |        ROUND(list_cosine_similarity(q_emb, e.emb), 6) AS score
        |      FROM q, e WHERE q_id <> e.vec_id),
        |tx AS (SELECT q_id, n_id FROM (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY q_id ORDER BY score DESC, n_id) AS rn FROM sx)
        |      WHERE rn <= 10),
        |pq AS (SELECT vec_id AS q_id, pemb AS q_pemb FROM p WHERE vec_id < 8),
        |sp AS (SELECT q_id, p.vec_id AS n_id,
        |        ROUND(list_cosine_similarity(q_pemb, p.pemb), 6) AS score
        |      FROM pq, p WHERE q_id <> p.vec_id),
        |tp AS (SELECT q_id, n_id FROM (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY q_id ORDER BY score DESC, n_id) AS rn FROM sp)
        |      WHERE rn <= 10)
        |SELECT tx.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  (CAST(COUNT(*) AS BIGINT) * 1000000) // 10 AS recall_ppm
        |FROM tx JOIN tp ON tx.q_id = tp.q_id AND tx.n_id = tp.n_id
        |GROUP BY tx.q_id ORDER BY tx.q_id""".stripMargin
    },

    "quantize_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |rc AS (SELECT vec_id,
        |        list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS maxabs,
        |        emb
        |      FROM e),
        |r AS (SELECT vec_id,
        |        CASE WHEN maxabs > 0 THEN
        |          list_transform(emb, x -> round(x * (127.0 / maxabs))
        |            * (maxabs / 127.0))
        |        ELSE emb END AS remb
        |      FROM rc),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 8),
        |sx AS (SELECT q_id, e.vec_id AS n_id,
        |        ROUND(list_cosine_similarity(q_emb, e.emb), 6) AS score
        |      FROM q, e WHERE q_id <> e.vec_id),
        |tx AS (SELECT q_id, n_id FROM (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY q_id ORDER BY score DESC, n_id) AS rn FROM sx)
        |      WHERE rn <= 10),
        |si AS (SELECT q_id, r.vec_id AS n_id,
        |        ROUND(list_cosine_similarity(q_emb, r.remb), 6) AS score
        |      FROM q, r WHERE q_id <> r.vec_id),
        |ti AS (SELECT q_id, n_id FROM (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY q_id ORDER BY score DESC, n_id) AS rn FROM si)
        |      WHERE rn <= 10)
        |SELECT tx.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap,
        |  (CAST(COUNT(*) AS BIGINT) * 1000000) // 10 AS recall_ppm
        |FROM tx JOIN ti ON tx.q_id = ti.q_id AND tx.n_id = ti.n_id
        |GROUP BY tx.q_id ORDER BY tx.q_id""".stripMargin,

    // Topic labels: the kmeans a2 assignment CTEs verbatim + token
    // explode + term_keyness's add-one ratio, top-3 per cluster.
    "cluster_topics" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |a2 AS (SELECT vec_id, c_id AS cluster FROM (
        |         SELECT vec_id, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2) WHERE rn = 1),
        |tok AS (SELECT a2.cluster, t.token
        |        FROM documents d
        |        JOIN a2 ON a2.vec_id = d.doc_id,
        |        unnest(regexp_split_to_array(trim(d.text), '\s+')) AS t(token)),
        |tf AS (SELECT cluster, token, CAST(COUNT(*) AS BIGINT) AS f
        |       FROM tok GROUP BY 1, 2),
        |ct AS (SELECT cluster, CAST(SUM(f) AS BIGINT) AS n_c FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(f) AS BIGINT) AS n,
        |          CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM tf),
        |pt AS (SELECT token, CAST(SUM(f) AS BIGINT) AS f_all FROM tf GROUP BY 1),
        |sc AS (SELECT tf.cluster, tf.token, tf.f,
        |        floor(CAST(tf.f + 1 AS DOUBLE) * CAST((tot.n - ct.n_c) + tot.v AS DOUBLE)
        |          / (CAST((pt.f_all - tf.f) + 1 AS DOUBLE) * CAST(ct.n_c + tot.v AS DOUBLE))
        |          * 1e4 + 0.5) / 1e4 AS keyness
        |       FROM tf JOIN ct USING (cluster) JOIN pt USING (token), tot
        |       WHERE tf.f >= 3),
        |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY cluster
        |         ORDER BY keyness DESC, token) AS INT) AS "rank" FROM sc)
        |SELECT cluster, token, f, keyness, "rank"
        |FROM rk WHERE "rank" <= 3 ORDER BY cluster, "rank"""".stripMargin,

    // Sign-bit codes packed into two 32-bit halves (exact BIGINT
    // arithmetic in both engines; a single 64-bit pack would overflow
    // DOUBLE-safe integer range in list_sum).
    "ann_hamming" ->
      """WITH b AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, 32),
        |      i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)) AS BIGINT) AS h0,
        |    CAST(list_sum(list_transform(generate_series(33, 64),
        |      i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END)) AS BIGINT) AS h1
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, h0 AS q0, h1 AS q1 FROM b WHERE vec_id < 8),
        |s AS (SELECT q.q_id, b.vec_id AS n_id,
        |    CAST(bit_count(xor(q.q0, b.h0)) + bit_count(xor(q.q1, b.h1)) AS INT) AS hamming
        |  FROM q JOIN b ON q.q_id <> b.vec_id),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY hamming, n_id) AS INT) AS "rank" FROM s)
        |SELECT q_id, n_id, hamming, "rank" FROM r WHERE "rank" <= 10
        |ORDER BY q_id, "rank"""".stripMargin,

    // Same element-wise quantized-mean centroid machinery as the
    // kmeans oracle; cohesion means go through integer-quantized sums.
    // Drift monitor: the label_centroids quantized-mean construction
    // per vintage half, one cosine per label.
    "embedding_drift" ->
      """WITH v AS (SELECT label, vec_id % 2 = 0 AS old_half,
        |    CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |m AS (SELECT label, old_half, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS cv,
        |        CAST(COUNT(*) AS BIGINT) AS n
        |      FROM v, generate_series(1, 64) AS g(i) GROUP BY label, old_half, i),
        |c AS (SELECT label, old_half, MAX(n) AS n, list(cv ORDER BY i) AS c_emb
        |      FROM m GROUP BY 1, 2),
        |o AS (SELECT label, n AS n_old, c_emb AS c_old FROM c WHERE old_half),
        |nw AS (SELECT label, n AS n_new, c_emb AS c_new FROM c WHERE NOT old_half)
        |SELECT o.label, n_old, n_new,
        |  ROUND(list_cosine_similarity(c_old, c_new), 6) AS drift_cos
        |FROM o JOIN nw ON o.label = nw.label ORDER BY o.label""".stripMargin,

    "label_centroids" ->
      """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |m AS (SELECT label, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS cv
        |      FROM v, generate_series(1, 64) AS g(i) GROUP BY label, i),
        |c AS (SELECT label, list(cv ORDER BY i) AS c_emb FROM m GROUP BY label),
        |s AS (SELECT v.label, ROUND(list_cosine_similarity(v.emb, c.c_emb), 6) AS cs
        |      FROM v JOIN c USING (label)
        |      WHERE NOT isnan(list_cosine_similarity(v.emb, c.c_emb)))
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        |  floor(CAST(SUM(CAST(floor(cs * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1e6 / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS avg_cos,
        |  MIN(cs) AS min_cos
        |FROM s GROUP BY label ORDER BY label""".stripMargin,

    // Nests the EXACT same knn/ivf oracle strings as derived tables, so
    // the recall ground truth can never drift from the per-query oracles.
    "ann_recall" ->
      s"""WITH ex AS (SELECT q_id, n_id FROM ($KnnTopkSql)),
        |ap AS (SELECT q_id, n_id, CAST(1 AS BIGINT) AS hit FROM ($AnnIvfSql))
        |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS k,
        |  CAST(SUM(COALESCE(ap.hit, 0)) AS BIGINT) AS hits,
        |  floor(CAST(SUM(COALESCE(ap.hit, 0)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS recall
        |FROM ex LEFT JOIN ap USING (q_id, n_id)
        |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin,

    // Hardest positive = min (cos, id) same-label; hardest negative =
    // max (cos, id) other-label — each row_number direction mirrors
    // the Spark struct-extreme's tiebreak. Cosines round to 6 dp like
    // the knn oracle.
    "hard_mining" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
        |           FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb, label AS q_label
        |      FROM e WHERE vec_id < 8),
        |s AS (SELECT q_id, q_label, e.vec_id AS n_id, e.label AS n_label,
        |        ROUND(list_cosine_similarity(q_emb, e.emb), 6) AS cos
        |      FROM q JOIN e ON e.vec_id <> q.q_id),
        |rp AS (SELECT q_id, n_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos ASC, n_id ASC) AS rn
        |       FROM s WHERE n_label = q_label),
        |rn_ AS (SELECT q_id, n_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id DESC) AS rn
        |       FROM s WHERE n_label <> q_label)
        |SELECT DISTINCT s.q_id, s.q_label,
        |  p.n_id AS pos_id, p.cos AS pos_cos,
        |  g.n_id AS neg_id, g.cos AS neg_cos
        |FROM s
        |JOIN rp p ON p.q_id = s.q_id AND p.rn = 1
        |JOIN rn_ g ON g.q_id = s.q_id AND g.rn = 1
        |ORDER BY s.q_id""".stripMargin,

    // The kmeans oracle's assignment CTEs verbatim (same no-drift
    // rationale as KnnTopkSql), then within-cluster smaller-id
    // neighbors at >= 0.45 rounded cosine; min such neighbor = dup_of.
    "sem_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, e.emb, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |a2 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id, cs,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2) WHERE rn = 1),
        |p AS (SELECT a.vec_id, MIN(b.vec_id) AS dup_of
        |      FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
        |      WHERE ROUND(list_cosine_similarity(a.emb, b.emb), 6) >= 0.45
        |      GROUP BY a.vec_id)
        |SELECT a2.vec_id, a2.cluster, p.dup_of, p.dup_of IS NULL AS keep
        |FROM a2 LEFT JOIN p USING (vec_id) ORDER BY vec_id""".stripMargin,

    // Nested knn shape (6-dp rounded-then-ranked cosines, id
    // tiebreaks); majority vote ties go to the smallest label —
    // row_number (cnt DESC, n_label) mirrors the Spark struct-min.
    "knn_classify" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb, label AS q_label FROM e WHERE vec_id < 64),
        |s AS (SELECT q_id, q_label, e.vec_id AS n_id, e.label AS n_label,
        |        ROUND(list_cosine_similarity(q_emb, e.emb), 6) AS cos
        |      FROM q JOIN e ON e.vec_id <> q.q_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s),
        |v AS (SELECT q_id, q_label, n_label, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM r WHERE rn <= 5 GROUP BY 1, 2, 3),
        |p AS (SELECT q_id, q_label, n_label AS pred_label,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cnt DESC, n_label) AS pr
        |      FROM v)
        |SELECT CAST(q_label AS INT) AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  CAST(SUM(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  floor(CAST(SUM(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS accuracy
        |FROM p WHERE pr = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    // First same-label rank under the rounded-cosine total order
    // (knn_topk's contract); reciprocal ranks quantized to 1e-6
    // integers before summing so the mean is order-independent.
    "mrr_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
        |           FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb, label AS q_label
        |      FROM e WHERE vec_id < 64),
        |s AS (SELECT q_id, q_label, e.vec_id AS n_id, e.label AS n_label,
        |        ROUND(list_cosine_similarity(q_emb, e.emb), 6) AS cos
        |      FROM q JOIN e ON e.vec_id <> q.q_id),
        |r AS (SELECT q_id, q_label, n_label,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |          ORDER BY cos DESC, n_id) AS BIGINT) AS rnk FROM s),
        |f AS (SELECT q_id, q_label, MIN(rnk) AS frank
        |      FROM r WHERE n_label = q_label GROUP BY 1, 2)
        |SELECT CAST(q_label AS INT) AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  floor(CAST(SUM(CAST(floor(1e6 / CAST(frank AS DOUBLE) + 0.5) AS BIGINT)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS mrr,
        |  floor(CAST(SUM(CASE WHEN frank = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS hit1,
        |  floor(CAST(SUM(CASE WHEN frank <= 10 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS hit10
        |FROM f GROUP BY q_label ORDER BY label""".stripMargin,

    "mmr_rerank" -> MmrRerankSql,

    "ndcg_eval" -> NdcgEvalSql,

    // Leave-one-out kNN votes under the rounded-cosine order; the
    // challenger argmax ties to the smallest label (knn_classify's
    // contract); suspects have at most 1 agreeing neighbor.
    "label_noise" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
        |           FROM embeddings),
        |s AS (SELECT q.vec_id AS q_id, q.label AS q_label,
        |        e.vec_id AS n_id, e.label AS n_label,
        |        ROUND(list_cosine_similarity(q.emb, e.emb), 6) AS cos
        |      FROM e q JOIN e ON e.vec_id <> q.vec_id
        |      WHERE q.vec_id < 512),
        |r AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, n_id) AS rn FROM s) WHERE rn <= 5),
        |v AS (SELECT q_id, q_label, n_label, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM r GROUP BY 1, 2, 3),
        |a AS (SELECT q_id, cnt AS n_agree FROM v WHERE n_label = q_label),
        |c AS (SELECT q_id, q_label, n_label AS challenger_label,
        |        cnt AS challenger_votes,
        |        ROW_NUMBER() OVER (PARTITION BY q_id
        |          ORDER BY cnt DESC, n_label) AS rc
        |      FROM v WHERE n_label <> q_label)
        |SELECT c.q_id, CAST(c.q_label AS INT) AS label,
        |  COALESCE(a.n_agree, 0) AS n_agree,
        |  CAST(c.challenger_label AS INT) AS challenger_label,
        |  c.challenger_votes
        |FROM c LEFT JOIN a USING (q_id)
        |WHERE rc = 1 AND COALESCE(a.n_agree, 0) <= 1 ORDER BY q_id""".stripMargin,

    // Sequential index-order fold for the squared norm (libm-free);
    // 1e-6-quantized so min/max/mean are exact.
    "embedding_norm_stats" ->
      """WITH q AS (SELECT CAST(label AS INT) AS label,
        |    CAST(floor(list_reduce(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x * x), (a, b) -> a + b) * 1e6 + 0.5) AS BIGINT) AS qn2
        |  FROM embeddings)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(qn2) AS DOUBLE) / 1e6 AS min_norm2,
        |  CAST(MAX(qn2) AS DOUBLE) / 1e6 AS max_norm2,
        |  floor(CAST(SUM(qn2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
        |    AS mean_norm2
        |FROM q GROUP BY label ORDER BY label""".stripMargin,

    // Alignment/separation: the sum-vector identity on 1e-6-quantized
    // unit vectors — HUGEINT component sums, squares and cross dots;
    // norm via the same index-order list_reduce fold as the engine's
    // aggregate(); the only floats are the published division chains.
    "embedding_alignment" ->
      """WITH v AS (SELECT CAST(label AS INT) AS label,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n0 AS (SELECT label, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
        |  FROM v),
        |q AS (SELECT label,
        |    list_transform(v, x -> CAST(floor(x / nrm * 1e6 + 0.5) AS BIGINT))
        |      AS q
        |  FROM n0 WHERE nrm > 0),
        |t AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(q, x -> x * x)), (a, b) -> a + b) AS HUGEINT))
        |      AS tt
        |  FROM q GROUP BY 1),
        |d AS (SELECT label, i, SUM(CAST(q[i] AS HUGEINT)) AS s
        |  FROM q, generate_series(1, 64) AS g(i) GROUP BY 1, 2),
        |sl AS (SELECT label, SUM(s * s) AS s2 FROM d GROUP BY 1),
        |sg AS (SELECT i, SUM(s) AS gs FROM d GROUP BY 1),
        |xd AS (SELECT d.label, SUM(d.s * (sg.gs - d.s)) AS xd
        |  FROM d JOIN sg ON sg.i = d.i GROUP BY 1),
        |nn AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM t)
        |SELECT t.label, t.n,
        |  floor(CAST(sl.s2 - t.tt AS DOUBLE)
        |    / CAST(NULLIF(CAST(t.n AS HUGEINT) * (t.n - 1), 0) AS DOUBLE)
        |    / 1e12 * 1e6 + 0.5) / 1e6 AS within_cos,
        |  floor(CAST(xd.xd AS DOUBLE)
        |    / CAST(NULLIF(CAST(t.n AS HUGEINT) * (nn.nt - t.n), 0) AS DOUBLE)
        |    / 1e12 * 1e6 + 0.5) / 1e6 AS cross_cos
        |FROM t JOIN sl USING (label) JOIN xd USING (label) CROSS JOIN nn
        |ORDER BY t.label""".stripMargin,

    // Multiprobe random-hyperplane ANN top-k per query (seed-42 planes).
    "ann_lsh" ->
      """WITH r(q_id, n_id, score, "rank") AS (VALUES
        |  (0,344,0.252487,1), (0,498,0.250726,2), (0,270,0.212398,3), (0,51,0.198503,4),
        |  (0,70,0.192008,5), (0,108,0.17969,6), (0,374,0.177726,7), (0,174,0.167213,8),
        |  (0,150,0.163994,9), (0,177,0.163878,10), (1,467,0.232573,1), (1,393,0.212942,2),
        |  (1,495,0.163655,3), (1,400,0.151482,4), (1,347,0.140457,5), (1,42,0.133924,6),
        |  (1,436,0.123223,7), (1,488,0.108734,8), (1,340,0.100584,9), (1,105,0.09758,10),
        |  (2,117,0.318143,1), (2,112,0.245311,2), (2,172,0.239829,3), (2,459,0.223401,4),
        |  (2,100,0.203405,5), (2,474,0.201024,6), (2,307,0.19598,7), (2,351,0.170685,8),
        |  (2,389,0.157093,9), (2,449,0.154898,10), (3,207,0.291702,1), (3,474,0.276738,2),
        |  (3,50,0.238652,3), (3,201,0.232611,4), (3,428,0.213656,5), (3,341,0.20897,6),
        |  (3,301,0.198535,7), (3,468,0.191929,8), (3,98,0.188014,9), (3,104,0.182994,10),
        |  (4,482,0.313897,1), (4,384,0.240413,2), (4,332,0.227642,3), (4,190,0.182306,4),
        |  (4,394,0.166058,5), (4,26,0.12512,6), (4,228,0.124109,7), (4,214,0.118311,8),
        |  (4,213,0.118302,9), (4,99,0.116692,10), (5,404,0.328403,1), (5,359,0.305821,2),
        |  (5,133,0.23748,3), (5,46,0.232479,4), (5,121,0.190744,5), (5,126,0.189613,6),
        |  (5,25,0.181068,7), (5,171,0.171972,8), (5,489,0.169903,9), (5,499,0.150708,10),
        |  (6,350,0.324518,1), (6,386,0.275196,2), (6,395,0.25912,3), (6,207,0.226754,4),
        |  (6,260,0.213129,5), (6,156,0.189464,6), (6,179,0.188849,7), (6,120,0.144427,8),
        |  (6,149,0.134593,9), (6,261,0.133764,10), (7,445,0.340782,1), (7,442,0.253476,2),
        |  (7,418,0.245739,3), (7,407,0.239432,4), (7,61,0.209327,5), (7,103,0.204742,6),
        |  (7,307,0.204541,7), (7,48,0.195415,8), (7,479,0.191586,9), (7,299,0.188076,10))
        |SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id, CAST(score AS DOUBLE) AS score, CAST("rank" AS INTEGER) AS "rank"
        |FROM r""".stripMargin,

    // Product-quantization ADC top-k per query (deterministic codebooks).
    "ann_pq" ->
      """WITH r(q_id, n_id, dist, "rank") AS (VALUES
        |  (0,365,1.260013,1), (0,334,1.274556,2), (0,423,1.406133,3), (0,73,1.409132,4),
        |  (0,7,1.414316,5), (0,320,1.424279,6), (0,190,1.436411,7), (0,388,1.447399,8),
        |  (0,483,1.486599,9), (0,498,1.498549,10), (1,386,1.257031,1), (1,27,1.303584,2),
        |  (1,407,1.34598,3), (1,195,1.354511,4), (1,64,1.367251,5), (1,124,1.3945,6),
        |  (1,402,1.415356,7), (1,220,1.420436,8), (1,203,1.463691,9), (1,363,1.473387,10),
        |  (2,450,1.467312,1), (2,145,1.473011,2), (2,188,1.473456,3), (2,320,1.489914,4),
        |  (2,418,1.491941,5), (2,112,1.509378,6), (2,197,1.533701,7), (2,440,1.537262,8),
        |  (2,109,1.543299,9), (2,97,1.549982,10), (3,130,1.200255,1), (3,343,1.383057,2),
        |  (3,174,1.392904,3), (3,207,1.416596,4), (3,192,1.418394,5), (3,437,1.43893,6),
        |  (3,474,1.446524,7), (3,396,1.47807,8), (3,134,1.498798,9), (3,444,1.511003,10),
        |  (4,114,1.202975,1), (4,496,1.317577,2), (4,408,1.354494,3), (4,482,1.372206,4),
        |  (4,249,1.440739,5), (4,257,1.455203,6), (4,384,1.519174,7), (4,346,1.536871,8),
        |  (4,288,1.542749,9), (4,434,1.582588,10), (5,419,1.361525,1), (5,157,1.377488,2),
        |  (5,33,1.378026,3), (5,359,1.388358,4), (5,316,1.417775,5), (5,487,1.473913,6),
        |  (5,225,1.48097,7), (5,433,1.51949,8), (5,133,1.525039,9), (5,379,1.53359,10),
        |  (6,350,1.350965,1), (6,430,1.354959,2), (6,145,1.404609,3), (6,437,1.433939,4),
        |  (6,268,1.480117,5), (6,252,1.48874,6), (6,270,1.534456,7), (6,271,1.537824,8),
        |  (6,207,1.546491,9), (6,381,1.552378,10), (7,340,1.014469,1), (7,425,1.18496,2),
        |  (7,209,1.211075,3), (7,381,1.309642,4), (7,445,1.318435,5), (7,221,1.350644,6),
        |  (7,302,1.370952,7), (7,49,1.423297,8), (7,332,1.429107,9), (7,59,1.459528,10))
        |SELECT CAST(q_id AS BIGINT) AS q_id, CAST(n_id AS BIGINT) AS n_id, CAST(dist AS DOUBLE) AS dist, CAST("rank" AS INTEGER) AS "rank"
        |FROM r""".stripMargin,

    // label_centroids' quantized centroid frame; median/MAD are exact
    // order statistics on the 1e-6-int cosine domain; MAD-degenerate
    // labels flag nothing.
    "centroid_outliers" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |m AS (SELECT label, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS cv
        |      FROM v, generate_series(1, 64) AS g(i) GROUP BY label, i),
        |c AS (SELECT label, list(cv ORDER BY i) AS c_emb FROM m GROUP BY label),
        |s AS (SELECT v.vec_id, v.label,
        |        CAST(floor(list_cosine_similarity(v.emb, c.c_emb) * 1e6 + 0.5)
        |          AS BIGINT) AS cq
        |      FROM v JOIN c USING (label)
        |      WHERE NOT isnan(list_cosine_similarity(v.emb, c.c_emb))),
        |st AS (SELECT label, quantile_cont(cq, 0.5) AS med FROM s GROUP BY label),
        |sd AS (SELECT s.label, st.med,
        |         quantile_cont(abs(s.cq - st.med), 0.5) AS mad
        |       FROM s JOIN st USING (label) GROUP BY s.label, st.med)
        |SELECT s.vec_id, s.label, CAST(s.cq AS DOUBLE) / 1e6 AS cos,
        |  sd.med / 1e6 AS label_median, sd.mad / 1e6 AS label_mad
        |FROM s JOIN sd USING (label)
        |WHERE sd.mad > 0.0 AND CAST(s.cq AS DOUBLE) < sd.med - 3.0 * sd.mad
        |ORDER BY vec_id""".stripMargin,

    // Matryoshka prefix energy: index-order fold of x² per prefix
    // (list_reduce mirrors Spark's aggregate fold), 1e-9 quantized.
    "matryoshka_energy" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |p AS (SELECT t.d,
        |        CAST(floor(list_reduce(list_transform(e[1:t.d], x -> x * x),
        |          (a, b) -> a + b) * 1e9 + 0.5) AS BIGINT) AS q_prefix,
        |        CAST(floor(list_reduce(list_transform(e, x -> x * x),
        |          (a, b) -> a + b) * 1e9 + 0.5) AS BIGINT) AS q_total
        |      FROM v, (VALUES (8),(16),(32),(48),(64)) t(d)),
        |f AS (SELECT d, q_prefix, q_total,
        |        CASE WHEN q_total = 0 THEN 0
        |          ELSE CAST(floor(CAST(q_prefix AS DOUBLE) / CAST(q_total AS DOUBLE)
        |            * 1e6 + 0.5) AS BIGINT) END AS frac_q
        |      FROM p)
        |SELECT CAST(d AS INT) AS d, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CASE WHEN SUM(q_total) = 0 THEN 0.0
        |    ELSE floor(CAST(SUM(q_prefix) AS DOUBLE) / CAST(SUM(q_total) AS DOUBLE)
        |      * 1e4 + 0.5) / 1e4 END AS pooled_energy_frac,
        |  floor(CAST(SUM(frac_q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
        |    * 1e4 + 0.5) / 1e4 AS mean_vector_frac
        |FROM f GROUP BY d ORDER BY d""".stripMargin,

    // Cosine near-dup NN per vector (seed-42 hyperplane buckets).
    "dedup_cosine" ->
      """WITH r(vec_id, nn_id, cosine) AS (VALUES
        |  (0,73,0.295434), (1,467,0.232573), (2,117,0.318143), (3,174,0.303548), (4,482,0.313897), (5,404,0.328403),
        |  (6,350,0.324518), (7,425,0.40752), (8,39,0.384696), (9,414,0.3323), (10,44,0.355178), (11,181,0.25525),
        |  (12,402,0.316485), (13,440,0.358399), (14,146,0.354298), (15,436,0.324028), (16,421,0.365334), (17,135,0.337837),
        |  (18,181,0.321305), (19,276,0.29827), (20,54,0.275133), (21,24,0.30201), (22,36,0.252355), (23,490,0.295902),
        |  (24,21,0.30201), (25,339,0.318166), (26,482,0.345549), (27,464,0.357837), (28,381,0.281586), (29,369,0.346203),
        |  (30,337,0.268886), (31,367,0.320055), (32,143,0.355542), (33,62,0.293696), (34,366,0.313066), (35,428,0.366143),
        |  (36,150,0.309901), (37,324,0.38002), (38,44,0.315193), (39,8,0.384696), (40,139,0.307517), (41,410,0.361128),
        |  (42,376,0.375677), (43,198,0.356115), (44,10,0.355178), (45,75,0.281638), (46,114,0.379782), (47,406,0.301718),
        |  (48,366,0.355126), (49,136,0.297693), (50,429,0.398303), (51,475,0.301982), (52,206,0.248115), (53,300,0.452967),
        |  (54,404,0.386683), (55,197,0.254193), (56,271,0.399389), (57,324,0.361481), (58,131,0.365298), (59,138,0.274555),
        |  (60,245,0.369119), (61,468,0.259752), (62,209,0.317244), (63,303,0.252696), (64,438,0.309636), (65,78,0.263088),
        |  (66,354,0.291839), (67,458,0.361368), (68,240,0.35011), (69,321,0.303297), (70,104,0.350564), (71,280,0.325377),
        |  (72,477,0.299386), (73,456,0.346405), (74,148,0.397289), (75,440,0.340537), (76,14,0.262818), (77,41,0.349525),
        |  (78,362,0.265653), (79,390,0.248862), (80,230,0.394779), (81,96,0.290946), (82,197,0.322839), (83,389,0.337041),
        |  (84,329,0.310569), (85,21,0.26145), (86,306,0.335816), (87,496,0.328711), (88,252,0.320604), (89,250,0.370362),
        |  (90,440,0.240701), (91,441,0.315729), (92,485,0.281074), (93,57,0.276225), (94,260,0.346567), (95,167,0.371593),
        |  (96,494,0.342505), (97,245,0.335838), (98,172,0.361173), (99,464,0.249851), (100,398,0.358359), (101,469,0.336604),
        |  (102,306,0.322274), (103,445,0.269306), (104,70,0.350564), (105,111,0.377208), (106,149,0.237135), (107,9,0.284494),
        |  (108,142,0.437164), (109,94,0.263712), (110,205,0.337502), (111,105,0.377208), (112,17,0.246621), (113,299,0.345194),
        |  (114,46,0.379782), (115,17,0.335693), (116,305,0.331017), (117,2,0.318143), (118,134,0.285691), (119,364,0.322112),
        |  (120,225,0.289594), (121,262,0.308183), (122,158,0.321924), (123,288,0.372932), (124,398,0.290116), (125,376,0.37284),
        |  (126,121,0.293874), (127,266,0.330599), (128,257,0.257008), (129,421,0.287669), (130,291,0.262358), (131,58,0.365298),
        |  (132,336,0.319475), (133,314,0.307574), (134,449,0.342107), (135,17,0.337837), (136,49,0.297693), (137,434,0.343297),
        |  (138,59,0.274555), (139,170,0.355048), (140,296,0.303071), (141,313,0.332267), (142,108,0.437164), (143,32,0.355542),
        |  (144,57,0.314753), (145,6,0.297696), (146,14,0.354298), (147,473,0.328291), (148,74,0.397289), (149,382,0.373609),
        |  (150,152,0.418255), (151,220,0.33312), (152,150,0.418255), (153,455,0.307808), (154,124,0.272834), (155,327,0.323479),
        |  (156,181,0.343485), (157,451,0.317455), (158,452,0.47196), (159,202,0.403142), (160,164,0.335801), (161,402,0.396835),
        |  (162,231,0.273851), (163,337,0.360517), (164,160,0.335801), (165,185,0.391615), (166,324,0.473997), (167,368,0.385165),
        |  (168,452,0.327382), (169,466,0.512837), (170,139,0.355048), (171,324,0.330727), (172,440,0.431492), (173,276,0.369487),
        |  (174,3,0.303548), (175,401,0.234986), (176,469,0.284532), (177,277,0.275978), (178,125,0.309508), (179,447,0.304879),
        |  (180,265,0.349929), (181,439,0.348423), (182,449,0.279506), (183,205,0.349208), (184,203,0.266935), (185,165,0.391615),
        |  (186,492,0.269673), (187,424,0.265823), (188,347,0.309582), (189,360,0.37166), (190,24,0.2981), (191,431,0.442058),
        |  (192,111,0.263029), (193,275,0.253487), (194,486,0.343168), (195,404,0.338728), (196,287,0.228812), (197,202,0.387774),
        |  (198,468,0.429228), (199,361,0.336822), (200,189,0.252752), (201,477,0.270175), (202,245,0.409958), (203,363,0.325887),
        |  (204,143,0.28519), (205,485,0.407421), (206,457,0.353104), (207,326,0.416773), (208,173,0.257478), (209,62,0.317244),
        |  (210,72,0.259589), (211,23,0.25618), (212,488,0.261181), (213,170,0.318583), (214,449,0.302041), (215,195,0.320017),
        |  (216,16,0.364333), (217,140,0.243267), (218,372,0.352815), (219,487,0.245133), (220,151,0.33312), (221,7,0.324678),
        |  (222,191,0.282053), (223,180,0.275565), (224,421,0.355992), (225,489,0.326541), (226,303,0.266861), (227,453,0.353513),
        |  (228,116,0.303002), (229,236,0.297934), (230,80,0.394779), (231,355,0.326422), (232,108,0.406755), (233,390,0.324209),
        |  (234,384,0.444816), (235,39,0.297493), (236,229,0.297934), (237,159,0.308991), (238,344,0.372953), (239,343,0.339267),
        |  (240,68,0.35011), (241,98,0.301376), (242,264,0.236211), (243,247,0.264047), (244,272,0.296347), (245,202,0.409958),
        |  (246,194,0.2788), (247,355,0.333912), (248,336,0.307532), (249,139,0.301659), (250,89,0.370362), (251,389,0.305103),
        |  (252,88,0.320604), (253,385,0.404556), (254,173,0.354698), (255,379,0.27274), (256,198,0.357352), (257,159,0.322454),
        |  (258,268,0.286853), (259,394,0.38747), (260,94,0.346567), (261,141,0.306971), (262,291,0.417426), (263,372,0.329285),
        |  (264,271,0.286277), (265,180,0.349929), (266,396,0.394642), (267,319,0.319325), (268,258,0.286853), (269,221,0.317356),
        |  (270,127,0.290876), (271,56,0.399389), (272,244,0.296347), (273,434,0.322173), (274,172,0.328299), (275,481,0.377374),
        |  (276,173,0.369487), (277,321,0.295972), (278,315,0.246484), (279,153,0.232201), (280,391,0.339035), (281,114,0.339426),
        |  (282,460,0.285875), (283,160,0.251494), (284,473,0.357365), (285,296,0.297533), (286,71,0.313763), (287,307,0.311865),
        |  (288,123,0.372932), (289,265,0.344994), (290,325,0.458754), (291,262,0.417426), (292,402,0.334826), (293,150,0.268561),
        |  (294,472,0.286264), (295,495,0.32095), (296,140,0.303071), (297,384,0.388446), (298,403,0.3815), (299,113,0.345194),
        |  (300,53,0.452967), (301,438,0.357053), (302,492,0.255748), (303,429,0.32819), (304,458,0.384218), (305,116,0.331017),
        |  (306,86,0.335816), (307,287,0.311865), (308,463,0.317058), (309,31,0.289364), (310,280,0.312785), (311,42,0.314536),
        |  (312,39,0.350926), (313,141,0.332267), (314,496,0.312106), (315,457,0.324085), (316,317,0.26633), (317,461,0.335005),
        |  (318,369,0.354819), (319,267,0.319325), (320,444,0.292708), (321,267,0.309887), (322,212,0.257954), (323,234,0.268096),
        |  (324,166,0.473997), (325,290,0.458754), (326,207,0.416773), (327,399,0.34006), (328,191,0.273164), (329,84,0.310569),
        |  (330,173,0.281455), (331,325,0.428167), (332,86,0.234236), (333,423,0.300178), (334,382,0.429677), (335,152,0.260952),
        |  (336,399,0.36362), (337,163,0.360517), (338,91,0.26604), (339,25,0.318166), (340,435,0.281334), (341,474,0.327999),
        |  (342,126,0.275957), (343,239,0.339267), (344,238,0.372953), (345,89,0.367791), (346,197,0.25642), (347,188,0.309582),
        |  (348,149,0.242007), (349,343,0.283156), (350,395,0.407086), (351,131,0.284294), (352,436,0.296267), (353,475,0.33217),
        |  (354,77,0.319769), (355,247,0.333912), (356,50,0.374967), (357,473,0.347175), (358,400,0.282526), (359,122,0.316334),
        |  (360,189,0.37166), (361,199,0.336822), (362,157,0.281413), (363,203,0.325887), (364,365,0.357747), (365,364,0.357747),
        |  (366,48,0.355126), (367,31,0.320055), (368,167,0.385165), (369,413,0.383951), (370,426,0.231117), (371,443,0.350084),
        |  (372,218,0.352815), (373,467,0.352556), (374,398,0.373119), (375,445,0.282353), (376,42,0.375677), (377,91,0.246073),
        |  (378,312,0.302454), (379,303,0.310737), (380,386,0.243296), (381,413,0.371086), (382,334,0.429677), (383,413,0.31876),
        |  (384,234,0.444816), (385,253,0.404556), (386,9,0.322118), (387,407,0.320392), (388,461,0.326466), (389,83,0.337041),
        |  (390,233,0.324209), (391,280,0.339035), (392,441,0.322335), (393,83,0.27904), (394,259,0.38747), (395,350,0.407086),
        |  (396,266,0.394642), (397,256,0.351245), (398,374,0.373119), (399,496,0.383395), (400,451,0.378531), (401,253,0.387486),
        |  (402,161,0.396835), (403,298,0.3815), (404,54,0.386683), (405,153,0.280127), (406,221,0.322591), (407,387,0.320392),
        |  (408,482,0.294034), (409,312,0.33286), (410,41,0.361128), (411,456,0.290028), (412,424,0.255637), (413,369,0.383951),
        |  (414,9,0.3323), (415,400,0.260144), (416,446,0.277237), (417,10,0.268989), (418,442,0.369455), (419,262,0.309712),
        |  (420,484,0.269677), (421,16,0.365334), (422,70,0.292159), (423,385,0.339033), (424,187,0.265823), (425,7,0.40752),
        |  (426,481,0.316151), (427,304,0.277097), (428,35,0.366143), (429,50,0.398303), (430,13,0.309928), (431,191,0.442058),
        |  (432,424,0.238659), (433,101,0.278921), (434,137,0.343297), (435,95,0.366868), (436,15,0.324028), (437,374,0.323166),
        |  (438,301,0.357053), (439,181,0.348423), (440,172,0.431492), (441,460,0.358433), (442,418,0.369455), (443,371,0.350084),
        |  (444,320,0.292708), (445,7,0.340782), (446,300,0.362978), (447,179,0.304879), (448,484,0.386073), (449,134,0.342107),
        |  (450,465,0.355959), (451,400,0.378531), (452,158,0.47196), (453,227,0.353513), (454,127,0.318819), (455,153,0.307808),
        |  (456,73,0.346405), (457,384,0.371135), (458,304,0.384218), (459,297,0.265982), (460,441,0.358433), (461,317,0.335005),
        |  (462,133,0.288213), (463,308,0.317058), (464,27,0.357837), (465,450,0.355959), (466,169,0.512837), (467,373,0.352556),
        |  (468,198,0.429228), (469,158,0.368373), (470,284,0.282739), (471,381,0.31156), (472,418,0.317746), (473,284,0.357365),
        |  (474,341,0.327999), (475,353,0.33217), (476,299,0.315394), (477,72,0.299386), (478,97,0.313788), (479,13,0.334648),
        |  (480,54,0.28791), (481,275,0.377374), (482,26,0.345549), (483,32,0.34532), (484,448,0.386073), (485,205,0.407421),
        |  (486,194,0.343168), (487,301,0.246472), (488,122,0.268734), (489,225,0.326541), (490,23,0.295902), (491,50,0.306945),
        |  (492,202,0.276645), (493,327,0.28614), (494,96,0.342505), (495,206,0.342648), (496,399,0.383395), (497,194,0.336306),
        |  (498,272,0.295365), (499,167,0.297703))
        |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(nn_id AS BIGINT) AS nn_id, CAST(cosine AS DOUBLE) AS cosine
        |FROM r""".stripMargin,

    // 2-PC projection (one-pass moment sketch + pinned eigensigns).
    "pca_embed" ->
      """WITH r(vec_id, label, pc1, pc2) AS (VALUES
        |  (0,2,-0.061896,-0.094042), (1,0,0.086127,-0.177913), (2,1,-0.27276,0.015462), (3,8,0.294815,0.111346), (4,9,0.058279,-0.001989), (5,4,0.274131,-0.223729),
        |  (6,6,-0.04646,0.18274), (7,0,-0.100455,-0.200231), (8,5,0.207632,0.179075), (9,0,-0.100132,0.038642), (10,5,0.171966,-0.15221), (11,8,0.015457,0.072049),
        |  (12,6,0.177778,0.000998), (13,9,0.067841,0.127746), (14,4,0.144317,-0.027699), (15,6,-0.1477,-0.068758), (16,2,0.400085,-0.010175), (17,0,-0.289079,0.132308),
        |  (18,3,0.077959,0.048309), (19,1,-0.140794,-0.389045), (20,6,-0.334777,0.181591), (21,7,-0.133257,0.047018), (22,6,-0.059435,-0.149724), (23,7,0.000126,-0.242001),
        |  (24,7,-0.122719,-0.113119), (25,1,0.209911,-0.012696), (26,0,0.04328,-0.149296), (27,9,0.099132,-0.028485), (28,3,-0.062176,0.082784), (29,3,-0.131687,0.111015),
        |  (30,6,0.146159,0.118862), (31,2,0.188762,-0.102095), (32,7,-0.03034,-0.043364), (33,0,0.086855,-0.284554), (34,8,-0.175124,-0.331404), (35,9,0.372472,-0.018125),
        |  (36,2,-0.015651,-0.167009), (37,3,0.130531,0.065503), (38,8,-0.109395,-0.099417), (39,2,0.168557,-0.248485), (40,6,0.026785,0.193393), (41,9,0.026451,-0.254736),
        |  (42,1,-0.126496,0.034276), (43,0,0.128064,0.09228), (44,0,0.244515,-0.165809), (45,0,-0.147882,-0.197663), (46,7,0.075904,-0.242853), (47,5,0.116981,0.192504),
        |  (48,2,0.049018,-0.341802), (49,3,-0.285964,-0.110676), (50,3,0.255228,0.154), (51,5,0.140374,-0.053001), (52,0,-0.095456,-0.006148), (53,5,-0.145114,0.435643),
        |  (54,6,-0.368521,-0.163039), (55,1,-0.282474,0.010781), (56,4,0.075553,-0.018881), (57,1,0.15789,-0.089542), (58,8,0.20474,-0.034975), (59,5,-0.082798,-0.060736),
        |  (60,2,-0.183546,-0.143828), (61,0,0.225481,0.127231), (62,4,-0.247059,-0.007947), (63,0,0.179397,-0.024354), (64,0,-0.072495,-0.087544), (65,3,-0.053667,-0.311047),
        |  (66,5,-0.205561,0.171688), (67,0,-0.181307,-0.121313), (68,8,-0.200081,-0.187087), (69,2,-0.093009,0.018333), (70,0,-0.172852,0.208293), (71,7,-0.121542,-0.017337),
        |  (72,8,-0.093247,0.113864), (73,6,0.042868,0.166713), (74,0,0.069867,0.216457), (75,8,-0.033996,0.103606), (76,2,-0.045408,0.073202), (77,9,-0.23487,-0.089952),
        |  (78,9,-0.072043,-0.150621), (79,8,0.052466,0.194145), (80,0,0.193705,-0.229991), (81,9,-0.120951,0.230586), (82,1,-0.233467,0.503963), (83,9,-0.007377,0.232647),
        |  (84,7,-0.103396,-0.17171), (85,7,0.018529,0.153047), (86,3,0.025671,-0.172481), (87,0,-0.191986,-0.237433), (88,3,0.319015,0.173466), (89,6,0.073461,0.029747),
        |  (90,3,-0.113932,0.238308), (91,2,-0.040054,0.15263), (92,8,0.219164,-0.024124), (93,6,0.094041,0.067148), (94,1,-0.302414,0.0425), (95,8,-0.256788,-0.282358),
        |  (96,5,0.048384,0.073548), (97,9,-0.30308,0.056364), (98,6,-0.164433,0.156215), (99,2,0.009061,0.074666), (100,6,-0.03447,-0.005817), (101,0,0.201382,-0.285151),
        |  (102,6,0.198661,0.322384), (103,7,-0.137883,-0.260953), (104,4,-0.005296,0.263822), (105,8,0.233752,0.035543), (106,3,-0.187994,-0.059178), (107,6,0.006413,0.172771),
        |  (108,8,-0.245852,-0.169299), (109,9,-0.296897,0.01988), (110,7,-0.029401,-0.024584), (111,8,0.085999,0.18813), (112,3,-0.10598,-0.189691), (113,3,0.052729,0.151525),
        |  (114,7,0.077325,-0.235845), (115,3,-0.053829,0.186681), (116,9,-0.107844,0.208073), (117,4,-0.307713,0.18746), (118,0,0.040411,0.096652), (119,4,-0.081728,0.196229),
        |  (120,4,-0.100529,0.110689), (121,6,0.230758,0.018388), (122,2,0.134659,-0.094104), (123,5,0.324065,-0.210997), (124,3,0.149945,-0.129641), (125,9,0.411421,-0.060042),
        |  (126,1,0.297264,0.023499), (127,1,0.253479,0.027131), (128,3,-0.252009,-0.122279), (129,9,-0.048373,0.129795), (130,0,0.070174,0.239036), (131,3,0.159393,-0.020962),
        |  (132,6,0.165032,0.068689), (133,6,0.186266,0.029524), (134,7,-0.215412,0.10423), (135,9,-0.28555,-0.086439), (136,4,-0.274157,-0.002582), (137,8,0.079049,0.041032),
        |  (138,9,0.064432,-0.127578), (139,9,0.04386,0.080393), (140,3,-0.160311,-0.020869), (141,9,-0.14402,-0.139881), (142,5,-0.043127,0.042956), (143,5,-0.001231,-0.11029),
        |  (144,3,0.17271,-0.079789), (145,9,-0.323011,0.065843), (146,4,0.117701,0.216845), (147,5,0.112984,-0.018097), (148,7,0.025384,0.246241), (149,8,0.068098,0.019257),
        |  (150,7,0.178899,-0.050053), (151,3,0.026169,0.012926), (152,2,0.103177,-0.025513), (153,9,0.145957,-0.086312), (154,6,0.01806,-0.213613), (155,5,-0.033056,0.067854),
        |  (156,5,0.112825,-0.138402), (157,5,0.110901,-0.270758), (158,1,0.219998,-0.263004), (159,4,-0.039001,0.183702), (160,0,-0.030048,0.072732), (161,6,0.216794,-0.02701),
        |  (162,6,0.196008,-0.221111), (163,4,0.163646,0.016609), (164,7,0.115509,-0.171099), (165,0,-0.217929,-0.046469), (166,9,0.062596,0.168431), (167,8,-0.150627,0.003702),
        |  (168,2,-0.003369,-0.065316), (169,1,-0.022474,-0.050075), (170,9,-0.14979,-0.001334), (171,1,-0.061457,-0.119631), (172,5,0.096,0.478984), (173,3,0.05525,0.141015),
        |  (174,5,0.210899,-0.097777), (175,7,-0.211219,0.150192), (176,5,-0.113239,-0.151504), (177,4,-0.092416,0.220273), (178,3,0.075818,0.205427), (179,4,-0.159443,0.09755),
        |  (180,1,0.056602,0.108984), (181,3,0.03641,-0.173231), (182,5,0.057545,-0.13494), (183,2,-0.155262,0.275158), (184,5,-0.016998,-0.169111), (185,8,-0.140283,-0.363411),
        |  (186,7,-0.308477,0.158227), (187,6,-0.253078,-0.301928), (188,7,-0.220606,-0.026164), (189,1,0.069695,-0.050778), (190,7,-0.15405,-0.284861), (191,1,-0.031715,0.03895),
        |  (192,4,0.23965,0.415475), (193,0,-0.331988,-0.185636), (194,6,0.040337,-0.027911), (195,0,0.226537,-0.08983), (196,5,0.070342,-0.000439), (197,1,-0.416172,0.228773),
        |  (198,9,0.264636,0.155552), (199,7,0.030926,-0.187317), (200,8,-0.093606,-0.119564), (201,3,0.220645,0.022557), (202,2,-0.154298,0.347551), (203,9,0.22833,-0.167207),
        |  (204,7,-0.029537,-0.044513), (205,5,-0.009954,0.015607), (206,2,-0.015787,0.082732), (207,8,0.042186,-0.174784), (208,1,0.016102,0.106669), (209,9,-0.202613,-0.241377),
        |  (210,4,-0.057442,-0.02055), (211,3,0.255034,-0.128287), (212,4,0.054169,0.032183), (213,1,-0.29119,-0.049532), (214,7,-0.126295,0.079918), (215,2,0.064254,-0.051912),
        |  (216,8,0.201656,0.225249), (217,6,0.133192,0.038777), (218,2,0.115546,0.020415), (219,9,0.17212,0.101056), (220,0,-0.056072,-0.044217), (221,5,-0.008573,-0.131361),
        |  (222,2,0.11847,-0.007989), (223,3,-0.227562,0.012953), (224,2,0.151538,0.00012), (225,9,-0.060971,-0.051086), (226,9,0.103475,0.005472), (227,9,0.051242,0.08027),
        |  (228,7,-0.014742,0.145848), (229,0,0.006169,-0.18671), (230,5,0.190052,-0.075649), (231,7,0.187188,0.15198), (232,7,-0.104609,-0.072792), (233,6,0.124861,0.039536),
        |  (234,2,-0.299632,0.20693), (235,6,0.196098,-0.279469), (236,8,0.065635,-0.065489), (237,7,0.211341,0.063508), (238,8,0.006702,0.401103), (239,4,-0.041652,-0.043361),
        |  (240,0,0.001165,-0.358762), (241,3,-0.052894,-0.132043), (242,0,-0.101555,-0.035311), (243,5,0.040558,0.168351), (244,0,0.047279,-0.128829), (245,3,-0.033965,0.298793),
        |  (246,5,-0.087629,-0.025155), (247,0,-0.324703,0.191733), (248,6,0.090539,-0.092496), (249,9,0.114184,0.14961), (250,9,-0.136822,0.141746), (251,4,0.097765,0.095276),
        |  (252,3,-0.023317,0.345529), (253,7,-0.089893,-0.063749), (254,9,0.390374,0.140052), (255,0,-0.027085,-0.097159), (256,7,0.147134,0.006243), (257,7,-0.170872,-0.066482),
        |  (258,1,-0.144731,-0.063335), (259,0,0.016562,-0.115581), (260,8,-0.475243,-0.07144), (261,5,0.011643,-0.067369), (262,2,0.413756,0.066094), (263,1,0.121387,-0.121483),
        |  (264,7,-0.130638,0.021507), (265,2,-0.059903,0.362244), (266,1,0.165611,-0.088503), (267,3,0.13278,0.172297), (268,7,-0.006941,-0.011587), (269,6,-0.031209,-0.080114),
        |  (270,1,0.140937,0.185946), (271,2,-0.015787,0.044214), (272,1,-0.004768,-0.301166), (273,7,-0.043164,-0.195452), (274,3,-0.001538,0.434146), (275,8,-0.134429,-0.180049),
        |  (276,2,-0.03054,0.121315), (277,4,-0.010231,0.224956), (278,2,-0.021124,0.114581), (279,1,0.008604,0.012887), (280,5,-0.018936,0.162326), (281,5,-0.084948,0.125218),
        |  (282,0,0.373541,-0.390689), (283,8,-0.041356,0.089509), (284,6,0.012024,-0.145961), (285,1,-0.048597,-0.287802), (286,2,-0.234704,-0.130441), (287,7,0.087869,0.211017),
        |  (288,0,0.352554,0.007805), (289,4,0.204047,0.132199), (290,9,-0.089614,0.082725), (291,9,0.183196,0.364108), (292,4,0.083067,-0.185618), (293,1,0.137703,0.0229),
        |  (294,4,-0.187109,-0.2759), (295,3,0.20079,-0.369991), (296,9,-0.097459,-0.034805), (297,0,0.105104,0.285519), (298,3,-0.107465,0.000802), (299,3,0.038484,0.127567),
        |  (300,4,0.039452,0.151619), (301,3,0.12821,0.038403), (302,4,-0.403591,-0.070486), (303,9,0.184228,-0.034879), (304,4,-0.027727,0.218284), (305,4,-0.046405,0.243583),
        |  (306,3,0.062385,0.144528), (307,1,-0.08338,0.105829), (308,1,0.214146,-0.076917), (309,9,-0.054765,0.00427), (310,6,-0.189117,0.159037), (311,3,-0.331962,-0.130699),
        |  (312,9,0.054103,-0.142824), (313,7,-0.069895,-0.165583), (314,7,0.208962,0.176416), (315,4,0.007313,0.150725), (316,2,0.359041,-0.085917), (317,9,0.189641,-0.142251),
        |  (318,8,-0.1402,0.281939), (319,1,-0.205116,0.189202), (320,2,-0.287585,0.17397), (321,8,-0.011717,0.336316), (322,4,0.280923,0.148387), (323,0,-0.202007,0.234758),
        |  (324,8,-0.049774,-0.124915), (325,2,-0.10104,0.248891), (326,3,0.215084,0.005361), (327,6,-0.019365,-0.028077), (328,2,-0.025018,0.202512), (329,9,0.046818,-0.072646),
        |  (330,4,0.04145,0.110799), (331,4,-0.087705,0.119065), (332,8,0.002314,-0.106301), (333,8,-0.081948,-0.063103), (334,0,-0.044027,-0.162788), (335,9,-0.043818,-0.044904),
        |  (336,9,-0.059629,0.126318), (337,4,0.100847,-0.114822), (338,8,0.160096,0.083581), (339,7,-0.095412,-0.196472), (340,1,-0.22125,0.005453), (341,7,0.070449,-0.053218),
        |  (342,6,0.133638,0.132552), (343,7,0.226229,-0.118923), (344,4,0.141934,0.293786), (345,3,0.22162,-0.033756), (346,8,0.078174,0.052087), (347,3,-0.010056,-0.034108),
        |  (348,3,-0.241307,0.199157), (349,8,0.251882,0.005014), (350,3,-0.175018,0.151232), (351,2,0.158339,-0.084441), (352,8,-0.241855,-0.158777), (353,6,-0.169812,0.047643),
        |  (354,6,-0.294925,0.00706), (355,3,-0.156768,0.27594), (356,1,0.173096,0.023128), (357,6,-0.09486,-0.380308), (358,4,-0.108208,-0.055179), (359,2,0.221904,-0.007729),
        |  (360,4,0.081417,0.057361), (361,5,0.043934,-0.481432), (362,9,-0.092854,-0.233739), (363,8,0.042896,-0.151503), (364,6,-0.166818,0.015438), (365,8,-0.253511,-0.164548),
        |  (366,6,-0.100412,-0.127807), (367,3,-0.103803,-0.108663), (368,4,-0.250091,-0.034916), (369,4,-0.196161,0.20631), (370,1,-0.132767,0.148487), (371,1,-0.107111,-0.077891),
        |  (372,2,0.040212,-0.016235), (373,3,0.173418,0.024916), (374,3,0.028733,0.046509), (375,1,-0.131954,-0.298557), (376,4,0.232561,0.136505), (377,7,-0.139586,0.12966),
        |  (378,8,0.010632,-0.076408), (379,7,0.15867,0.040088), (380,0,-0.044445,-0.056755), (381,4,-0.128522,-0.023581), (382,8,0.01075,-0.096173), (383,5,-0.0397,0.045758),
        |  (384,3,-0.222254,0.124876), (385,8,-0.328702,-0.054309), (386,3,0.031673,-0.178495), (387,6,0.005082,-0.010508), (388,1,0.079875,-0.354192), (389,2,-0.204814,0.154737),
        |  (390,0,-0.014599,-0.017109), (391,9,0.336268,-0.074117), (392,7,0.18493,0.180749), (393,0,-0.19017,0.084789), (394,7,-0.172482,-0.128407), (395,3,-0.138647,0.194872),
        |  (396,0,0.079464,0.077449), (397,9,0.136818,-0.096008), (398,7,0.210015,-0.104889), (399,5,-0.161939,0.004847), (400,9,-0.094454,-0.092105), (401,7,-0.041545,0.060655),
        |  (402,7,0.372129,0.004914), (403,7,-0.059975,0.133425), (404,3,0.044155,-0.081726), (405,6,0.158098,0.20076), (406,2,0.21565,0.178177), (407,9,-0.172552,0.157061),
        |  (408,5,-0.092183,0.083535), (409,8,-0.028459,-0.211613), (410,6,-0.032956,-0.3515), (411,2,-0.059217,0.076707), (412,4,-0.374442,-0.177727), (413,1,-0.156956,0.086509),
        |  (414,2,0.166936,0.144172), (415,4,-0.04243,-0.279892), (416,0,0.026392,0.063453), (417,5,-0.061982,0.231011), (418,9,-0.174579,-0.060545), (419,2,0.312888,-0.209853),
        |  (420,8,-0.039487,-0.121949), (421,4,0.336039,0.098401), (422,7,-0.149638,0.065261), (423,0,-0.171251,-0.131687), (424,0,-0.219962,-0.015717), (425,4,0.108416,0.062408),
        |  (426,2,-0.06746,0.045766), (427,8,0.134004,0.152141), (428,8,0.294772,0.067647), (429,3,0.125274,0.150405), (430,1,-0.12052,0.349639), (431,4,-0.048067,0.161672),
        |  (432,7,0.038988,0.2374), (433,8,9e-05,-0.310965), (434,8,-0.130292,-0.111822), (435,6,-0.189791,-0.18923), (436,3,-0.251676,-0.438883), (437,9,0.194789,-0.162596),
        |  (438,5,0.041626,-0.031302), (439,6,0.028434,-0.15527), (440,4,-0.000719,0.197739), (441,3,0.242514,-0.036405), (442,9,-0.075928,-0.319952), (443,6,-0.190597,-0.246603),
        |  (444,6,-0.426531,0.056406), (445,0,0.100232,-0.026294), (446,6,-0.112391,0.186218), (447,4,-0.063477,0.332547), (448,3,-0.15148,-0.013883), (449,5,-0.118725,0.035547),
        |  (450,3,0.036832,0.106216), (451,4,0.263429,-0.309072), (452,1,0.024762,-0.23183), (453,9,0.107933,0.07694), (454,0,0.075375,-0.182332), (455,5,0.435467,0.033673),
        |  (456,1,0.211561,0.152581), (457,5,-0.16519,0.191733), (458,1,-0.242832,0.084772), (459,1,-0.080066,0.118597), (460,1,0.211694,0.031896), (461,1,0.185205,0.081431),
        |  (462,3,-0.275301,0.181311), (463,7,0.195283,0.149096), (464,4,0.166098,-0.007002), (465,8,-0.080478,0.120185), (466,2,0.04155,-0.207223), (467,2,-0.227652,-0.381297),
        |  (468,5,0.320799,-0.065141), (469,4,0.315994,-0.126328), (470,5,-0.058069,0.076198), (471,8,-0.165637,0.01418), (472,7,-0.059683,-0.227341), (473,5,-0.035325,-0.089502),
        |  (474,9,0.078625,-0.06327), (475,1,0.070268,0.085464), (476,7,0.055678,0.137057), (477,5,0.125905,0.209776), (478,7,-0.147282,-0.015496), (479,7,0.019027,0.075666),
        |  (480,0,-0.186815,0.01795), (481,2,-0.1102,-0.293293), (482,2,-0.039158,0.215476), (483,4,0.124044,0.09588), (484,2,-0.053147,-0.136435), (485,0,0.111865,-0.16929),
        |  (486,3,-0.040122,-0.154141), (487,9,0.302347,0.16399), (488,4,0.024502,0.003619), (489,1,-0.081484,-0.229475), (490,5,0.048796,-0.101168), (491,6,0.046329,0.251337),
        |  (492,5,-0.376469,-0.00126), (493,9,0.210523,0.082368), (494,3,-0.12541,0.114002), (495,3,0.220535,-0.155853), (496,2,0.104716,0.043276), (497,0,0.060871,-0.171244),
        |  (498,4,-0.043139,-0.325618), (499,8,0.25487,-0.110322))
        |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS INTEGER) AS label, CAST(pc1 AS DOUBLE) AS pc1, CAST(pc2 AS DOUBLE) AS pc2
        |FROM r""".stripMargin,

    // Pairwise cosines over the kmeans c1 centroids (same CTE chain);
    // k(k-1)/2 rows.
    "centroid_separation" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster)
        |SELECT a.c_id AS c_a, b.c_id AS c_b,
        |  ROUND(list_cosine_similarity(a.c_emb, b.c_emb), 6) AS cosine
        |FROM c1 a JOIN c1 b ON a.c_id < b.c_id
        |ORDER BY c_a, c_b""".stripMargin,

    // Centroid-form silhouette over the kmeans_embed final centroids:
    // SAME c0→a1→c1 CTE chain as the kmeans oracle (the one-contract
    // centroid machinery), then the rank-1/rank-2 scores of the same
    // (cs DESC, c_id) window give a = 1 − own, b = 1 − runner-up;
    // s quantizes to 1e-6 ints before the per-cluster mean.
    "silhouette" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |r AS (SELECT vec_id, c_id, cs,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |      FROM s2 WHERE cs IS NOT NULL AND NOT isnan(cs)),
        |p AS (SELECT vec_id,
        |        MAX(CASE WHEN rn = 1 THEN c_id END) AS cluster,
        |        1.0 - MAX(CASE WHEN rn = 1 THEN cs END) AS a,
        |        1.0 - MAX(CASE WHEN rn = 2 THEN cs END) AS b
        |      FROM r WHERE rn <= 2 GROUP BY 1),
        |q AS (SELECT cluster,
        |        CASE WHEN greatest(a, b) = 0.0 THEN CAST(0 AS BIGINT)
        |          ELSE CAST(floor((b - a) / greatest(a, b) * 1e6 + 0.5) AS BIGINT)
        |        END AS sq
        |      FROM p)
        |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
        |  floor(CAST(SUM(sq) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5)
        |    / 1e4 AS mean_silhouette,
        |  CAST(MIN(sq) AS DOUBLE) / 1e6 AS min_silhouette
        |FROM q GROUP BY cluster ORDER BY cluster""".stripMargin,

    // Davies–Bouldin per cluster: SAME c0→a1→c1 chain, rank-1 member
    // scatter on the 1e-6 grid, k×k pair ratios, (ratio DESC, j) pick.
    "davies_bouldin" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |r AS (SELECT vec_id, c_id, cs,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |      FROM s2 WHERE cs IS NOT NULL AND NOT isnan(cs)),
        |st AS (SELECT c_id AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
        |        SUM(CAST(floor((1.0 - cs) * 1e6 + 0.5) AS BIGINT)) AS ssum
        |      FROM r WHERE rn = 1 GROUP BY 1),
        |si AS (SELECT cluster, n,
        |        CAST(ssum AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS s FROM st),
        |pr AS (SELECT a.c_id AS ci, b.c_id AS cj,
        |        1.0 - ROUND(list_cosine_similarity(a.c_emb, b.c_emb), 6) AS mij
        |      FROM c1 a JOIN c1 b ON a.c_id <> b.c_id),
        |t AS (SELECT pr.ci, pr.cj, i.n AS n_i, i.s AS s_i,
        |        (i.s + j.s) / NULLIF(pr.mij, 0.0) AS ratio
        |      FROM pr JOIN si i ON i.cluster = pr.ci
        |      JOIN si j ON j.cluster = pr.cj),
        |w AS (SELECT ci, cj, n_i, s_i, ratio,
        |        ROW_NUMBER() OVER (PARTITION BY ci
        |          ORDER BY ratio DESC NULLS LAST, cj) AS rn
        |      FROM t)
        |SELECT ci AS cluster, n_i AS n,
        |  floor(s_i * 1e4 + 0.5) / 1e4 AS scatter,
        |  cj AS worst_other,
        |  floor(ratio * 1e6 + 0.5) / 1e6 AS db_term
        |FROM w WHERE rn = 1 ORDER BY cluster""".stripMargin,

    // Isotropy audit: quantized global centroid, 6-dp cosines to it,
    // per-element-quantized squared norms (order-blind integer sums),
    // NaN-cosines normalized to NULL to match the native expression.
    "isotropy_audit" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |m AS (SELECT i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT))
        |            AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM e, generate_series(1, 64) AS g(i) GROUP BY i),
        |mu AS (SELECT list(v ORDER BY i) AS c_emb FROM m),
        |musq AS (SELECT SUM(CAST(floor(v * v * 1e9 + 0.5) AS BIGINT)) AS mu_sq
        |         FROM m),
        |s0 AS (SELECT
        |        ROUND(list_cosine_similarity(e.emb, mu.c_emb), 6) AS cs0,
        |        list_sum(list_transform(e.emb,
        |          x -> CAST(floor(x * x * 1e9 + 0.5) AS BIGINT))) AS sq
        |      FROM e, mu),
        |s AS (SELECT CASE WHEN isnan(cs0) THEN NULL ELSE cs0 END AS cs,
        |        CAST(floor(sqrt(CAST(sq AS DOUBLE) / 1e9) * 1e6 + 0.5)
        |          AS BIGINT) AS normq
        |      FROM s0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(cs) AS BIGINT) AS n_scored,
        |  floor(CAST(SUM(CAST(floor(cs * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1e6 / CAST(COUNT(cs) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS avg_cos,
        |  MIN(cs) AS min_cos,
        |  CAST((SUM(CASE WHEN cs < 0.0 THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(cs) AS BIGINT) AS neg_ppm,
        |  floor(CAST(SUM(normq) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS mean_norm,
        |  floor(sqrt(CAST(MAX(mu_sq) AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6
        |    AS norm_of_mean,
        |  floor(sqrt(CAST(MAX(mu_sq) AS DOUBLE) / 1e9)
        |    / NULLIF(CAST(SUM(normq) AS DOUBLE) / 1e6
        |      / CAST(COUNT(*) AS DOUBLE), 0.0) * 1e6 + 0.5) / 1e6
        |    AS anisotropy
        |FROM s, musq""".stripMargin,

    // Hubness audit over the kmeans cells: the sem_dedup assignment
    // chain, per-point 3-NN under (cs DESC, id), in-degree histogram.
    "hubness_audit" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, e.emb, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |a2 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2) WHERE rn = 1),
        |ed AS (SELECT a.cluster, a.vec_id, b.vec_id AS b_id,
        |         ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cs
        |       FROM a2 a JOIN a2 b
        |         ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
        |top AS (SELECT cluster, b_id FROM (
        |         SELECT cluster, b_id, cs,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id
        |             ORDER BY cs DESC, b_id) AS rn
        |         FROM ed WHERE cs IS NOT NULL AND NOT isnan(cs))
        |       WHERE rn <= 3),
        |ind AS (SELECT cluster, b_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS indeg
        |        FROM top GROUP BY 1, 2),
        |f AS (SELECT a2.cluster, COALESCE(ind.indeg, 0) AS indeg
        |      FROM a2 LEFT JOIN ind
        |        ON ind.cluster = a2.cluster AND ind.vec_id = a2.vec_id)
        |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(indeg) AS BIGINT) AS max_indegree,
        |  CAST((SUM(CASE WHEN indeg = 0 THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS antihub_ppm,
        |  CAST((SUM(CASE WHEN indeg >= 6 THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS hub_ppm
        |FROM f GROUP BY cluster ORDER BY cluster""".stripMargin,

    // Cluster label purity/Gini: the assignment chain + one
    // (cluster, label) contingency, denominators cleared.
    "cluster_purity" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |a2 AS (SELECT vec_id, c_id AS cluster FROM (
        |         SELECT vec_id, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2) WHERE rn = 1),
        |cl AS (SELECT a2.cluster, CAST(em.label AS BIGINT) AS label,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM a2 JOIN embeddings em USING (vec_id) GROUP BY 1, 2),
        |mj AS (SELECT cluster, label AS majority_label, c AS n_majority
        |       FROM (SELECT cluster, label, c,
        |               ROW_NUMBER() OVER (PARTITION BY cluster
        |                 ORDER BY c DESC, label) AS rn FROM cl)
        |       WHERE rn = 1),
        |ag AS (SELECT cluster, CAST(SUM(c) AS BIGINT) AS n,
        |         SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sq,
        |         CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
        |       FROM cl GROUP BY 1)
        |SELECT ag.cluster, ag.n, ag.n_labels, mj.majority_label,
        |  CAST((mj.n_majority * 1000000) // ag.n AS BIGINT) AS purity_ppm,
        |  CAST(((CAST(ag.n AS HUGEINT) * ag.n - ag.sq) * 1000000)
        |    // (CAST(ag.n AS HUGEINT) * ag.n) AS BIGINT) AS gini_ppm
        |FROM ag JOIN mj ON mj.cluster = ag.cluster
        |ORDER BY ag.cluster""".stripMargin,

    // Mutual-kNN reciprocity over the hubness 3-NN edges: same chain,
    // one reversed-edge self-join.
    "mutual_knn_rate" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.emb, c0.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0.c_emb), 6) AS cs
        |       FROM e, c0),
        |a1 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1) WHERE rn = 1),
        |m AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1 AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM m GROUP BY cluster),
        |s2 AS (SELECT e.vec_id, e.emb, c1.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1.c_emb), 6) AS cs
        |       FROM e, c1),
        |a2 AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2) WHERE rn = 1),
        |ed AS (SELECT a.cluster, a.vec_id, b.vec_id AS b_id,
        |         ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cs
        |       FROM a2 a JOIN a2 b
        |         ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
        |top AS (SELECT cluster, vec_id, b_id FROM (
        |         SELECT cluster, vec_id, b_id, cs,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id
        |             ORDER BY cs DESC, b_id) AS rn
        |         FROM ed WHERE cs IS NOT NULL AND NOT isnan(cs))
        |       WHERE rn <= 3),
        |mu AS (SELECT t.cluster, CAST(COUNT(*) AS BIGINT) AS n_mutual
        |       FROM top t JOIN top r ON r.cluster = t.cluster
        |         AND r.vec_id = t.b_id AND r.b_id = t.vec_id
        |       WHERE t.vec_id < t.b_id GROUP BY 1),
        |eg AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_edges
        |       FROM top GROUP BY 1)
        |SELECT eg.cluster, eg.n_edges,
        |  COALESCE(mu.n_mutual, 0) AS n_mutual_pairs,
        |  CAST((COALESCE(mu.n_mutual, 0) * 2000000) // eg.n_edges AS BIGINT)
        |    AS reciprocity_ppm
        |FROM eg LEFT JOIN mu ON mu.cluster = eg.cluster
        |ORDER BY eg.cluster""".stripMargin,

    // ARI between the vec_id<8 and 8..15 seed chains: doubled kmeans
    // CTE chain, exact pair combinatorics, denominators cleared so
    // ONE double division renders each index.
    "cluster_stability_ari" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c0a AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        |s1a AS (SELECT e.vec_id, e.emb, c0a.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0a.c_emb), 6) AS cs
        |       FROM e, c0a),
        |a1a AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1a) WHERE rn = 1),
        |ma AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1a, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1a AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM ma GROUP BY cluster),
        |s2a AS (SELECT e.vec_id, c1a.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1a.c_emb), 6) AS cs
        |       FROM e, c1a),
        |a2a AS (SELECT vec_id, c_id AS ca FROM (
        |         SELECT vec_id, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2a) WHERE rn = 1),
        |c0b AS (SELECT vec_id AS c_id, emb AS c_emb FROM e
        |        WHERE vec_id >= 8 AND vec_id < 16),
        |s1b AS (SELECT e.vec_id, e.emb, c0b.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c0b.c_emb), 6) AS cs
        |       FROM e, c0b),
        |a1b AS (SELECT vec_id, emb, c_id AS cluster FROM (
        |         SELECT vec_id, emb, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s1b) WHERE rn = 1),
        |mb AS (SELECT cluster, i,
        |        ROUND(CAST(SUM(CAST(round(list_extract(emb, i) * 1e6) AS BIGINT)) AS DOUBLE)
        |          / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) AS v
        |      FROM a1b, generate_series(1, 64) AS g(i) GROUP BY cluster, i),
        |c1b AS (SELECT cluster AS c_id, list(v ORDER BY i) AS c_emb FROM mb GROUP BY cluster),
        |s2b AS (SELECT e.vec_id, c1b.c_id,
        |         ROUND(list_cosine_similarity(e.emb, c1b.c_emb), 6) AS cs
        |       FROM e, c1b),
        |a2b AS (SELECT vec_id, c_id AS cb FROM (
        |         SELECT vec_id, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
        |         FROM s2b) WHERE rn = 1),
        |ct AS (SELECT a.ca, b.cb, CAST(COUNT(*) AS BIGINT) AS nij
        |       FROM a2a a JOIN a2b b USING (vec_id) GROUP BY 1, 2),
        |sij AS (SELECT SUM(CAST((nij * (nij - 1)) // 2 AS HUGEINT)) AS sij,
        |         SUM(CAST(nij AS HUGEINT)) AS n,
        |         CAST(COUNT(DISTINCT ca) AS BIGINT) AS ka,
        |         CAST(COUNT(DISTINCT cb) AS BIGINT) AS kb
        |       FROM ct),
        |sa AS (SELECT SUM(CAST((ai * (ai - 1)) // 2 AS HUGEINT)) AS sa
        |       FROM (SELECT CAST(SUM(nij) AS BIGINT) AS ai FROM ct GROUP BY ca)),
        |sb AS (SELECT SUM(CAST((bi * (bi - 1)) // 2 AS HUGEINT)) AS sb
        |       FROM (SELECT CAST(SUM(nij) AS BIGINT) AS bi FROM ct GROUP BY cb)),
        |f AS (SELECT *, (n * (n - 1)) // 2 AS t FROM sij, sa, sb)
        |SELECT CAST(n AS BIGINT) AS n_vectors, ka, kb,
        |  floor((1.0 - CAST(sa + sb - 2 * sij AS DOUBLE)
        |    / NULLIF(CAST(t AS DOUBLE), 0.0)) * 1e6 + 0.5) / 1e6 AS rand_index,
        |  floor(CAST(2 * t * sij - 2 * sa * sb AS DOUBLE)
        |    / NULLIF(CAST(t * (sa + sb) - 2 * sa * sb AS DOUBLE), 0.0)
        |    * 1e6 + 0.5) / 1e6 AS ari
        |FROM f""".stripMargin,
  )
}
