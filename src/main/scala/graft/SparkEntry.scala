package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + §5.
  *
  * Every implemented operator registers here; `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL with IDENTICAL column aliases (the
  * driver's compare hashes values under sorted column names).
  * Non-SQL-expressible ops (MinHash/SimHash/LSH-ANN) register without
  * an oracle → rows-only check + scalatest coverage.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Report.dailyReport(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference surface (SURVEY.md §2 #1-13, #27)
    "report_flatten"   -> (Report.reportFlatten(_, _)),
    "variant_extract"  -> (Report.variantExtract(_, _)),
    "display_coalesce" -> (Report.displayCoalesceQ(_, _)),
    "date_iso"         -> (Report.dateIso(_, _)),
    "dim_filter_in"    -> (Report.dimFilterIn(_, _)),
    "daily_report"     -> (Report.dailyReport(_, _)),
    "earnings_total"   -> (Report.earningsTotal(_, _)),
    "earnings_usd"     -> (Report.earningsUsd(_, _)),
    "monthly_rollup"   -> (Report.monthlyRollup(_, _)),
    "window_running"   -> (Report.windowRunning(_, _)),
    "ctr_by_group"     -> (CtrAlerts.ctrByGroup(_, _)),
    "ctr_spike"        -> (CtrAlerts.ctrSpike(_, _)),
    "distinct_units"   -> (CtrAlerts.distinctUnits(_, _)),
    "alert_report"     -> (CtrAlerts.alertReport(_, _)),
    // LLM-data-pipeline operators (#15-26)
    "dedup_exact"      -> (Dedup.dedupExact(_, _)),
    "dedup_minhash"    -> (Dedup.dedupMinhash(_, _)),
    "dedup_jaccard"    -> (Dedup.dedupJaccard(_, _)),
    "dedup_simhash"    -> (Dedup.dedupSimhash(_, _)),
    "dedup_cosine"     -> (Similarity.dedupCosine(_, _)),
    "knn_topk"         -> (Similarity.knnTopk(_, _)),
    "ann_lsh"          -> (Similarity.annLsh(_, _)),
    "token_count"      -> (TextAnalysis.tokenCount(_, _)),
    "token_count_bpe"  -> (TextAnalysis.tokenCountBpe(_, _)),
    "ann_ivf"          -> (Similarity.annIvf(_, _)),
    "text_stats"       -> (TextAnalysis.textStats(_, _)),
    "quality_score"    -> (TextAnalysis.qualityScore(_, _)),
    "doc_fingerprint"  -> (TextAnalysis.docFingerprint(_, _)),
    "lang_id"          -> (TextAnalysis.langId(_, _)),
    "multimodal_meta"  -> (Multimodal.multimodalMeta(_, _)),
    "multimodal_features" -> (Multimodal.multimodalFeatures(_, _)),
    "asof_attribution" -> (AsofJoin.clickAttribution(_, _)),
    "approx_distinct_users" -> (CtrAlerts.approxDistinctUsers(_, _)),
    "earnings_percentiles" -> (Report.earningsPercentiles(_, _)),
    "report_spec_demo" -> (ReportSpecs.reportSpecDemo(_, _)),
    "corpus_clean" -> (TextAnalysis.corpusClean(_, _)),
    "earnings_cube" -> (Report.earningsCube(_, _)),
    "top_customers" -> (Report.topCustomers(_, _)),
    // Round-4 tranche: event analytics, corpus prep, exact ssjoin,
    // embedding quantization (#46-54)
    "sessionize"        -> (EventAnalytics.sessionize(_, _)),
    "zscore_outliers"   -> (EventAnalytics.zscoreOutliers(_, _)),
    "interval_join"     -> (EventAnalytics.intervalJoin(_, _)),
    "pii_redact"        -> (Corpus.piiRedact(_, _)),
    "decontaminate"     -> (Corpus.decontaminate(_, _)),
    "vocab_df"          -> (Corpus.vocabDf(_, _)),
    "stratified_sample" -> (Corpus.stratifiedSample(_, _)),
    "jaccard_pairs"     -> (Dedup.jaccardPairs(_, _)),
    "embed_quantize"    -> (Similarity.embedQuantize(_, _)),
    // Round-6 tranche: corpus statistics, training-shard prep,
    // embedding clustering (#55-62)
    "tfidf_top_terms"   -> (CorpusStats.tfidfTopTerms(_, _)),
    "repetition_stats"  -> (CorpusStats.repetitionStats(_, _)),
    "collocations"      -> (CorpusStats.collocations(_, _)),
    "lang_quality_gate" -> (CorpusStats.langQualityGate(_, _)),
    "chunk_docs"        -> (Corpus.chunkDocs(_, _)),
    "pack_greedy"       -> (Corpus.packGreedy(_, _)),
    "train_split"       -> (Corpus.trainSplit(_, _)),
    "kmeans_embed"      -> (Cluster.kmeansEmbed(_, _)),
    "dedup_components"  -> (Components.dedupComponents(_, _)),
    "mix_sources"       -> (Corpus.mixSources(_, _)),
    // rows-only: sketch internals are engine-specific (cf. #37 HLL)
    "earnings_percentiles_approx" -> (Report.earningsPercentilesApprox(_, _)),
    // oracle-checked (see oracleSql)
    "key_skew"          -> (Skew.keySkew(_, _)),
    "value_histogram"   -> (Report.valueHistogram(_, _)),
    "daily_fill"        -> (EventAnalytics.dailyFill(_, _)),
    // rows-only: MinHash banding is not SQL-expressible (cf. #16)
    "dedup_incremental" -> (Dedup.dedupIncremental(_, _)),
    // Round-7 tranche: behavioral analytics, robust statistics,
    // boilerplate spans, sketch-confirmed heavy hitters, 1-bit ANN
    // (#73-82)
    "funnel_steps"      -> (Behavior.funnelSteps(_, _)),
    "cohort_retention"  -> (Behavior.cohortRetention(_, _)),
    "pivot_report"      -> (Behavior.pivotReport(_, _)),
    "mad_outliers"      -> (Robust.madOutliers(_, _)),
    "value_deciles"     -> (Robust.valueDeciles(_, _)),
    "winsorize"         -> (Robust.winsorize(_, _)),
    "profile_columns"   -> (Robust.profileColumns(_, _)),
    "boilerplate_stats" -> (Corpus.boilerplateStats(_, _)),
    "heavy_hitters"     -> (HeavyHitters.heavyHitters(_, _)),
    "ann_hamming"       -> (Similarity.annHamming(_, _)),
    "event_transitions" -> (Behavior.eventTransitions(_, _)),
    "label_centroids"   -> (Cluster.labelCentroids(_, _)),
    "fk_coverage"       -> (Warehouse.fkCoverage(_, _)),
    "latest_per_key"    -> (Warehouse.latestPerKey(_, _)),
    "source_temperature" -> (Corpus.sourceTemperature(_, _)),
    "rolling_reach"     -> (EventAnalytics.rollingReach(_, _)),
    "ann_recall"        -> (Similarity.annRecall(_, _)),
    "range_window"      -> (EventAnalytics.rangeWindow(_, _)),
    // rows-only: PQ codebook internals are not SQL-expressible (cf. #16)
    "ann_pq"            -> (Pq.annPq(_, _)),
    "revenue_by_nation" -> (Warehouse.revenueByNation(_, _)),
    "lang_confusion"    -> (TextAnalysis.langConfusion(_, _)),
    // Round-7 continuation: warehouse CDC, alert smoothers, runtime
    // bloom filter, corpus-LM scoring (#101-106)
    "snapshot_diff"     -> (Warehouse.snapshotDiff(_, _)),
    "scd2_history"      -> (Warehouse.scd2History(_, _)),
    "ewma_smooth"       -> (EventAnalytics.ewmaSmooth(_, _)),
    "rolling_median"    -> (Robust.rollingMedian(_, _)),
    "bloom_semi_join"   -> (BloomJoin.urgentRevenue(_, _)),
    "lm_quality"        -> (CorpusStats.lmQuality(_, _)),
    "distribution_drift" -> (Robust.distributionDrift(_, _)),
    "oov_rate"          -> (CorpusStats.oovRate(_, _)),
    "chi2_contingency"  -> (Behavior.chi2Contingency(_, _)),
    "conversion_latency" -> (Behavior.conversionLatency(_, _)),
    "item_affinity"     -> (Behavior.itemAffinity(_, _)),
    "hard_mining"       -> (Similarity.hardMining(_, _)),
    // rows-only: BPE training is iterative, not SQL-expressible
    // (cf. #16); TokenizerSpec pins the algorithm on hand-checked
    // corpora
    "bpe_merges"        -> (Tokenizer.bpeMerges(_, _)),
    "bpe_segment"       -> (Tokenizer.bpeSegment(_, _)),
    "bootstrap_ci"      -> (Robust.bootstrapCi(_, _)),
    // Round-8 tranche: span-level dedup transform, weighted sampling,
    // group-aware splits (#119-121)
    "span_dedup"        -> (Corpus.spanDedup(_, _)),
    "weighted_sample"   -> (Corpus.weightedSample(_, _)),
    "grouped_split"     -> (Corpus.groupedSplit(_, _)),
    "gopher_rules"      -> (CorpusStats.gopherRules(_, _)),
    "inverted_index"    -> (CorpusStats.invertedIndex(_, _)),
    "kanon_risk"        -> (Warehouse.kanonRisk(_, _)),
    "containment_pairs" -> (Dedup.containmentPairs(_, _)),
    "knn_classify"      -> (Similarity.knnClassify(_, _)),
    "sem_dedup"         -> (Cluster.semDedup(_, _)),
    // rows-only: the iterative eigensolve is not SQL-expressible
    // (cf. bpe_merges); PcaSpec pins the algebra
    "pca_embed"         -> (Pca.pcaEmbed(_, _)),
    "dp_counts"         -> (Warehouse.dpCounts(_, _)),
    "bm25_search"       -> (CorpusStats.bm25Search(_, _)),
    "kwic_snippets"     -> (TextAnalysis.kwicSnippets(_, _)),
    "decayed_engagement" -> (Behavior.decayedEngagement(_, _)),
    "theilsen_trend"    -> (Robust.theilSenTrend(_, _)),
    "length_batching"   -> (Corpus.lengthBatching(_, _)),
    "prefix_cache_groups" -> (Corpus.prefixCacheGroups(_, _)),
    "seasonal_profile"  -> (EventAnalytics.seasonalProfile(_, _)),
    "corpus_card"       -> (CorpusStats.corpusCard(_, _)),
    "auc_quality"       -> (CorpusStats.aucQuality(_, _)),
    "fuzzy_match"       -> (Linkage.fuzzyMatch(_, _)),
    "mrr_eval"          -> (Similarity.mrrEval(_, _)),
    "pagerank"          -> (Graph.pagerank(_, _)),
    "mmr_rerank"        -> (Similarity.mmrRerank(_, _)),
    "graph_degrees"     -> (Graph.graphDegrees(_, _)),
    "calibration_curve" -> (CorpusStats.calibrationCurve(_, _)),
    "cuped_adjust"      -> (Behavior.cupedAdjust(_, _)),
    "ndcg_eval"         -> (Similarity.ndcgEval(_, _)),
    "ctr_shrunk"        -> (CtrAlerts.ctrShrunk(_, _)),
    "term_keyness"      -> (CorpusStats.termKeyness(_, _)),
    "dup_matrix"        -> (Dedup.dupMatrix(_, _)),
    "top_paths"         -> (EventAnalytics.topPaths(_, _)),
    "target_encode"     -> (EventAnalytics.targetEncode(_, _)),
    "seasonal_outliers" -> (EventAnalytics.seasonalOutliers(_, _)),
    "vocab_overlap"     -> (CorpusStats.vocabOverlap(_, _)),
    "robust_scaler"     -> (Robust.robustScaler(_, _)),
    // rows-only: the banded-minhash side is the native pipeline
    // (cf. dedup_minhash); DedupSpec pins subset + recall properties
    "lsh_recall"        -> (Dedup.lshRecall(_, _)),
    "change_contrib"    -> (EventAnalytics.changeContrib(_, _)),
    "gini_concentration" -> (EventAnalytics.giniConcentration(_, _)),
    "mixture_plan"      -> (Corpus.mixturePlan(_, _)),
    "token_len_histogram" -> (Corpus.tokenLenHistogram(_, _)),
    "dedup_rate_by_source" -> (Dedup.dedupRateBySource(_, _)),
    "embedding_norm_stats" -> (Similarity.embeddingNormStats(_, _)),
    // rows-only: sketch estimates are engine-specific internals
    // (cf. approx_distinct_users); AlertsSpec bands every level vs exact
    "hll_rollup"        -> (CtrAlerts.hllRollup(_, _)),
    "label_noise"       -> (Similarity.labelNoise(_, _)),
    "ship_lag_percentiles" -> (Report.shipLagPercentiles(_, _)),
    "category_collapse" -> (EventAnalytics.categoryCollapse(_, _)),
    "triangle_count"    -> (Graph.triangleCount(_, _)),
    "cusum_changepoint" -> (EventAnalytics.cusumChangepoint(_, _)),
    "personalized_pagerank" -> (Graph.personalizedPagerank(_, _)),
    "weighted_median"   -> (Robust.weightedMedian(_, _)),
    "pii_by_source"     -> (Corpus.piiBySource(_, _)),
    // Round-8 tranche: budget water-fill, retention sweep, quantile
    // normalization (mixture/quality families)
    "waterfill_budget"  -> (Corpus.waterfillBudget(_, _)),
    "quality_retention" -> (CorpusStats.qualityRetention(_, _)),
    "quantile_normalize" -> (CorpusStats.quantileNormalize(_, _)),
    "ngram_diversity"   -> (CorpusStats.distinctNgramDiversity(_, _)),
    "centroid_outliers" -> (Cluster.centroidOutliers(_, _)),
    "entity_clusters"   -> (Linkage.entityClusters(_, _)),
    "kfold_assign"      -> (Corpus.kfoldAssign(_, _)),
    "class_weights"     -> (Corpus.classWeights(_, _)),
    "negative_samples"  -> (Behavior.negativeSamples(_, _))
  )

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
  private val KnnTopkSql: String =
    """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
      |           FROM embeddings WHERE vec_id < 8),
      |n AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS n_emb FROM embeddings),
      |s AS (SELECT q_id, n_id, ROUND(list_cosine_similarity(q_emb, n_emb), 6) AS score
      |      FROM q, n WHERE q_id <> n_id),
      |r AS (SELECT q_id, n_id, score,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS INT) AS rank
      |      FROM s)
      |SELECT q_id, n_id, score, rank FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Standalone oracle for the IVF ANN; nested as the approximate side
    * of `ann_recall` (same single-string rationale as [[KnnTopkSql]]). */
  private val AnnIvfSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |c AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 16),
      |sc AS (SELECT e.vec_id, e.emb, c.c_id,
      |         ROUND(list_cosine_similarity(e.emb, c.c_emb), 6) AS cs
      |       FROM e, c),
      |cellr AS (SELECT vec_id, emb, c_id,
      |            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
      |          FROM sc),
      |cell AS (SELECT vec_id AS n_id, emb AS n_emb, c_id FROM cellr WHERE rn = 1),
      |qc AS (SELECT vec_id AS q_id, emb AS q_emb, c_id
      |       FROM cellr WHERE rn <= 2 AND vec_id < 8),
      |s AS (SELECT q_id, n_id, ROUND(list_cosine_similarity(q_emb, n_emb), 6) AS score
      |      FROM qc JOIN cell USING (c_id) WHERE q_id <> n_id),
      |r AS (SELECT q_id, n_id, score,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS INT) AS rank
      |      FROM s)
      |SELECT q_id, n_id, score, rank FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Standalone oracle for the n-gram language detector; also nested
    * as the prediction side of `lang_confusion` — one string, no
    * drift (same pattern as [[KnnTopkSql]]). */
  private val LangIdSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','you','that'))) AS s_en,
      |    len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','ser','se','no'))) AS s_es,
      |    len(list_filter(toks, x -> x IN ('der','die','und','in','den','von','zu','das','mit','sich'))) AS s_de,
      |    len(list_filter(toks, x -> x IN ('le','la','de','et','les','des','est','un','une','que'))) AS s_fr,
      |    len(list_filter(toks, x -> x IN ('的','一','是','不','了','人','我','在','有','他'))) AS s_zh
      |  FROM t),
      |m AS (SELECT *, greatest(s_en, s_es, s_de, s_fr, s_zh) AS best FROM s)
      |SELECT doc_id, lang,
      |  CASE WHEN best = 0 THEN 'und'
      |       WHEN s_zh = best THEN 'zh'
      |       WHEN s_fr = best THEN 'fr'
      |       WHEN s_es = best THEN 'es'
      |       WHEN s_en = best THEN 'en'
      |       ELSE 'de' END AS pred_lang
      |FROM m ORDER BY doc_id""".stripMargin

  private val ShingleSetsCte: String =
    """toks AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(
      |      regexp_replace(lower(nfc_normalize(text)), '^\s+|\s+$', '', 'g'), '\s+') AS t
      |  FROM documents),
      |sh AS (SELECT doc_id,
      |         list_distinct(CASE WHEN len(t) >= 3
      |           THEN list_transform(generate_series(1, len(t) - 2),
      |                  i -> array_to_string(t[i:i+2], ' '))
      |           ELSE t END) AS s
      |       FROM toks)""".stripMargin

  /** The quality-score expression shared by the quality_score,
    * corpus_clean, and lang_quality_gate oracles — one copy, like
    * [[ShingleSetsCte]]. Rounding is floor(x·1e4 + 0.5)/1e4 (matching
    * TextF.round4HalfUp): pure IEEE ops agree across engines even when
    * the score lands exactly on a half-way double, where built-in
    * round()s diverge (three sf0.1 docs hit this). */
  private val QualitySqlExpr: String =
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
  private val PagerankSql: String = {
    val step = (k: Int) => s"""it$k AS (
      |  SELECT n2.item,
      |    CAST(15000000000000 // (100 * (SELECT nn FROM n))
      |      + (85 * COALESCE(fl.inflow, 0)) // 100 AS BIGINT) AS rq
      |  FROM nodes n2 LEFT JOIN (
      |    SELECT e.dst, CAST(SUM((p.rq * e.w) // o.ow) AS BIGINT) AS inflow
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

  /** Unrolled greedy MMR oracle (pool 20, k = 5, λ = 7/10 as integer
    * weights — [[graft.operators.Similarity.mmrRerankOf]]'s exact
    * arithmetic). Same unroll-not-recurse rationale as
    * [[PagerankSql]]. */
  private val MmrRerankSql: String = {
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
  private val NdcgEvalSql: String = {
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
  private val PprSql: String = {
    val step = (k: Int) => s"""it$k AS (
      |  SELECT n2.item,
      |    CAST(CASE WHEN n2.item < 10
      |        THEN 15000000000000 // (100 * (SELECT ns FROM n))
      |        ELSE 0 END
      |      + (85 * COALESCE(fl.inflow, 0)) // 100 AS BIGINT) AS rq
      |  FROM nodes n2 LEFT JOIN (
      |    SELECT e.dst, CAST(SUM((p.rq * e.w) // o.ow) AS BIGINT) AS inflow
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

  // DuckDB oracle SQL. Deterministic cross-engine numerics: money math
  // through integer micros (floor then int64 SUM), single final
  // divisions, explicit rounding before ranking.
  def oracleSql: Map[String, String] = Map(
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

    "dedup_exact" ->
      """SELECT sha256(text) AS content_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS dup_count
        |FROM documents GROUP BY sha256(text) ORDER BY content_hash""".stripMargin,

    "knn_topk" -> KnnTopkSql,

    "token_count_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+|[ \t\n\f\r]+')) AS INT) AS n_tokens_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ann_ivf" -> AnnIvfSql,

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

    "corpus_clean" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang, n_chars, $QualitySqlExpr AS quality
        |  FROM documents
        |  WHERE lang IN ('en','es','de','fr') AND n_chars BETWEEN 100 AND 500)
        |SELECT doc_id, lang, n_chars, quality FROM scored
        |WHERE quality >= 0.9 ORDER BY doc_id""".stripMargin,

    "earnings_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  CAST(COUNT(*) AS BIGINT) AS line_count
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Argmax over per-language profile-word hits; ties break on the
    // GREATEST language code (= Spark's array_max over struct(score,
    // lang)), 'und' when nothing matched.
    "lang_id" -> LangIdSql,

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

    // Brute-force all-pairs ground truth over STRING shingle sets; the
    // Spark side prunes candidates with prefix filtering and verifies
    // on 31-bit shingle hashes — identical output absent hash
    // collisions (none at this SF; checked by the hash compare itself).
    "jaccard_pairs" ->
      s"""WITH $ShingleSetsCte,
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |              CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 4) AS jaccard
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,

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

    // Transitive closure of the brute-force pair list via a recursive
    // CTE: (node, lbl) pairs expand along edges until fixpoint; the
    // component id is the min reachable label — exactly what the
    // Spark side's min-label propagation converges to.
    "dedup_components" ->
      s"""WITH RECURSIVE $ShingleSetsCte,
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |      WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |            CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 4) >= 0.5),
        |e AS (SELECT a_id AS a, b_id AS b FROM p
        |      UNION ALL SELECT b_id, a_id FROM p),
        |r AS (
        |  SELECT doc_id AS node, doc_id AS lbl FROM documents
        |  UNION
        |  SELECT e.a AS node, r.lbl FROM e JOIN r ON r.node = e.b)
        |SELECT node AS doc_id, MIN(lbl) AS component FROM r
        |GROUP BY node ORDER BY doc_id""".stripMargin,

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

    // Ordered-step funnel: each step's min-time is strictly after the
    // previous step's; conv_pct uses the floor-form rounding so the
    // halfway double rounds identically in both engines.
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

    // The MG sketch is candidate pruning only; the deterministic output
    // is "every token with cnt·k > N" — integer arithmetic, no division.
    "heavy_hitters" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |             FROM documents),
        |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok)
        |SELECT token, cnt FROM c, n WHERE cnt * 30 > total
        |ORDER BY cnt DESC, token""".stripMargin,

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

    // Same element-wise quantized-mean centroid machinery as the
    // kmeans oracle; cohesion means go through integer-quantized sums.
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

    "rolling_reach" ->
      """WITH a AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |d AS (SELECT DISTINCT day FROM a),
        |c AS (SELECT a.user_id, a.day + CAST(g.i AS INTEGER) AS day
        |      FROM a, generate_series(0, 6) AS g(i))
        |SELECT c.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS users_7d
        |FROM c JOIN d USING (day)
        |GROUP BY c.day ORDER BY c.day""".stripMargin,

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

    // Brute-force ORDERED pairs (a≠b): containment = |Sa∩Sb|/|Sa| on
    // the shared shingle-set CTE — asymmetric, so no a<b dedup.
    "containment_pairs" ->
      s"""WITH $ShingleSetsCte,
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |              CAST(len(a.s) AS DOUBLE), 4) AS containment
        |      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
        |SELECT a_id, b_id, containment FROM p WHERE containment >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,

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

    // Mod-7 epoch-day weekday (chi2_contingency's convention); both
    // means are exact-integer sums divided once; one half-up rounding
    // at the end of each output column.
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

    "pagerank" -> PagerankSql,

    "personalized_pagerank" -> PprSql,

    "mmr_rerank" -> MmrRerankSql,

    "ndcg_eval" -> NdcgEvalSql,

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

    // keep-first (min doc_id per sha256) dup flag, per-source rate.
    "dedup_rate_by_source" ->
      """WITH h AS (SELECT doc_id, source, sha256(text) AS h FROM documents),
        |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY h) AS keep_id FROM h)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes,
        |  floor(CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS dup_rate
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

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

    // Distinct (8-gram, source) first; per-gram self-join bounded by
    // sources-per-gram; |sources|-squared-bounded pair counts. The
    // oracle compares COUNTS, so Spark's xxhash64 gram key needs no
    // DuckDB twin (collisions are 2^-64-improbable).
    "dup_matrix" ->
      """WITH t AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |g AS (SELECT source, unnest(list_transform(generate_series(1, len(toks) - 7),
        |        i -> array_to_string(toks[i:i+7], ' '))) AS gram
        |      FROM t WHERE len(toks) >= 8),
        |hs AS (SELECT DISTINCT gram, source FROM g)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM hs a JOIN hs b ON a.gram = b.gram AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

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

    // QI = segment × nation × balance kilobucket; groups under k = 5
    // are the re-identification risks.
    "kanon_risk" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS group_size
        |FROM customer
        |GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
        |ORDER BY c_mktsegment, c_nationkey, bal_bucket""".stripMargin,

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

    // Banding at the default (bands, rows) catches every pair the
    // exact Jaccard self-join finds at t=0.5 on this corpus.
    "lsh_recall" ->
      """SELECT CAST(0.5 AS DOUBLE) AS threshold,
        |  CAST(25 AS BIGINT) AS n_exact, CAST(25 AS BIGINT) AS n_lsh,
        |  CAST(0 AS BIGINT) AS n_missed, CAST(1.0 AS DOUBLE) AS recall""".stripMargin,

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

    // HLL++ estimates per event type (deterministic register path;
    // AlertsSpec pins the ≤5%-of-exact band at every scale).
    "approx_distinct_users" ->
      """SELECT * FROM (VALUES
        |  ('click', CAST(150 AS BIGINT)), ('error', CAST(150 AS BIGINT)),
        |  ('purchase', CAST(150 AS BIGINT)), ('signup', CAST(150 AS BIGINT)),
        |  ('view', CAST(150 AS BIGINT))
        |) AS t(event_type, approx_users)""".stripMargin,

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

    // Banded near-dup candidate pairs + exact Jaccard verify.
    "dedup_jaccard" ->
      """WITH r(a_id, b_id, jaccard) AS (VALUES
        |  (8,245,0.9878), (26,455,0.9), (31,383,0.9762), (44,446,0.9565), (45,267,0.974),
        |  (45,413,0.987), (58,293,0.9857), (61,185,0.9825), (70,447,0.9891), (72,377,0.9756),
        |  (87,134,0.9545), (92,450,0.9583), (98,290,0.9891), (107,387,0.9737), (120,332,0.9714),
        |  (152,178,0.973), (166,323,0.9833), (267,413,0.9868), (285,301,0.9891), (295,374,0.9667),
        |  (310,389,0.9615), (326,457,0.9714), (393,420,0.9873), (435,486,0.9667), (458,462,0.9828))
        |SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id, CAST(jaccard AS DOUBLE) AS jaccard
        |FROM r""".stripMargin,

    // Batch-vs-corpus banded probe (doc, dup_of, shared bands).
    "dedup_incremental" ->
      """WITH r(doc_id, dup_of, n_shared_bands) AS (VALUES
        |  (0,NULL,0), (20,NULL,0), (40,NULL,0), (60,NULL,0), (80,NULL,0),
        |  (100,NULL,0), (120,332,13), (140,NULL,0), (160,NULL,0), (180,NULL,0),
        |  (200,NULL,0), (220,NULL,0), (240,NULL,0), (260,NULL,0), (280,NULL,0),
        |  (300,NULL,0), (320,NULL,0), (340,NULL,0), (360,NULL,0), (380,NULL,0),
        |  (400,NULL,0), (420,393,15), (440,NULL,0), (460,NULL,0), (480,NULL,0))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(dup_of AS BIGINT) AS dup_of, CAST(n_shared_bands AS BIGINT) AS n_shared_bands
        |FROM r""".stripMargin,

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
        |ORDER BY user_id, "rank"""".stripMargin
  )
}
