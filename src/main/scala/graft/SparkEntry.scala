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
    // the 100 TB default: same audit on a 1-in-8 doc-hash sample
    "lsh_recall_sampled" -> (Dedup.lshRecallSampled(_, _)),
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
    "negative_samples"  -> (Behavior.negativeSamples(_, _)),
    "ab_test"           -> (Behavior.abTest(_, _)),
    "rfm_segments"      -> (Behavior.rfmSegments(_, _)),
    "bounce_rate"       -> (EventAnalytics.bounceRate(_, _)),
    // Round-8 final tranche: survival/ACF/split (time-series &
    // experimentation), RA link prediction, matryoshka audit,
    // zone-map audit, count-min calibration
    "churn_lifetable"   -> (Behavior.churnLifetable(_, _)),
    "acf_daily"         -> (EventAnalytics.acfDaily(_, _)),
    "temporal_split"    -> (EventAnalytics.temporalSplit(_, _)),
    "link_predict"      -> (Graph.linkPredict(_, _)),
    "matryoshka_energy" -> (Similarity.matryoshkaEnergy(_, _)),
    "zonemap_audit"     -> (Warehouse.zonemapAudit(_, _)),
    "countmin_err"      -> (HeavyHitters.countMinErr(_, _)),
    "funnel_windowed"   -> (Behavior.funnelWindowed(_, _)),
    "incremental_rollup" -> (Warehouse.incrementalRollup(_, _)),
    "dedup_cascade"     -> (Dedup.dedupCascade(_, _))
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

  /** `src` parametrizes the document set: "documents" for the whole
    * corpus, a prior CTE name for staged pipelines (dedup_cascade
    * shingles only exact-dedup survivors). */
  private def shingleSetsCteOn(src: String): String =
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

  private val ShingleSetsCte: String = shingleSetsCteOn("documents")

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

    // The registered scale path: same audit on the deterministic
    // xxhash64(doc_id) mod 2 == 0 subcorpus — 7 of the 25 true pairs
    // survive the 1/s² pair sampling at this corpus size, all banded.
    "lsh_recall_sampled" ->
      """SELECT CAST(0.5 AS DOUBLE) AS threshold,
        |  CAST(7 AS BIGINT) AS n_exact, CAST(7 AS BIGINT) AS n_lsh,
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

    // Count-min calibration: the oracle rebuilds the CMS cells exactly
    // (cell = Σ counts of tokens sharing the md5-chunk bucket) and
    // reads the same min-over-rows estimate.
    "countmin_err" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |             FROM documents),
        |cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY token),
        |hb AS (SELECT token, c, r.r,
        |         CAST(('0x' || substring(md5(token), 1 + 8 * r.r, 8)) AS BIGINT)
        |           % 1024 AS bucket
        |       FROM cnt, (VALUES (0),(1),(2),(3)) r(r)),
        |cells AS (SELECT r, bucket, CAST(SUM(c) AS BIGINT) AS cell
        |          FROM hb GROUP BY r, bucket),
        |top AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 20),
        |est AS (SELECT t.token, t.c, CAST(MIN(cells.cell) AS BIGINT) AS est
        |        FROM top t JOIN hb ON hb.token = t.token
        |        JOIN cells ON cells.r = hb.r AND cells.bucket = hb.bucket
        |        GROUP BY 1, 2)
        |SELECT token, c AS exact_cnt, est AS est_cnt, est - c AS overestimate
        |FROM est ORDER BY exact_cnt DESC, token""".stripMargin,

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

    // Staged funnel: exact keep-first (GROUP BY text ≡ the content
    // hash), then the recursive component closure on survivors only.
    "dedup_cascade" ->
      ("""WITH RECURSIVE surv AS (
        |  SELECT d.* FROM documents d
        |  JOIN (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text) k
        |    USING (doc_id)),
        |""".stripMargin + shingleSetsCteOn("surv") + """,
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |      WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |            CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 4) >= 0.5),
        |e AS (SELECT a_id AS a, b_id AS b FROM p
        |      UNION ALL SELECT b_id, a_id FROM p),
        |r AS (
        |  SELECT doc_id AS node, doc_id AS lbl FROM surv
        |  UNION
        |  SELECT e.a AS node, r.lbl FROM e JOIN r ON r.node = e.b),
        |comp AS (SELECT node, MIN(lbl) AS component FROM r GROUP BY node),
        |n AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n0,
        |        (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n1,
        |        (SELECT CAST(COUNT(DISTINCT component) AS BIGINT) FROM comp) AS n2)
        |SELECT * FROM (
        |  SELECT '1_exact' AS stage, CAST(1 AS INT) AS ord, n0 AS n_in,
        |    n0 - n1 AS n_removed, n1 AS n_out FROM n
        |  UNION ALL SELECT '2_jaccard', 2, n1, n1 - n2, n2 FROM n
        |  UNION ALL SELECT '3_total', 3, n0, n0 - n2, n2 FROM n)
        |ORDER BY ord""".stripMargin),

    // ---- Pinned-contract oracles, large-frame tier -------------------
    // The remaining seven rows-only queries are deterministic end to
    // end (hash pipelines, seeded hyperplanes, pinned eigensigns,
    // fixed sketch paths, synthetic stub payloads); their
    // verification-scale outputs are pinned below, generated from a
    // verified dump (regenerate the same way if an op's contract
    // deliberately changes). With these, every registered query is
    // value-checked — no rows-only gate remains.
    // MinHash+LSH banding clusters (xxhash pipeline, fully deterministic).
    "dedup_minhash" ->
      """WITH r(doc_id, cluster_id) AS (VALUES
        |  (0,0), (1,1), (2,2), (3,3), (4,4), (5,5), (6,6), (7,7), (8,8), (9,9),
        |  (10,10), (11,11), (12,12), (13,13), (14,14), (15,15), (16,16), (17,17), (18,18), (19,19),
        |  (20,20), (21,21), (22,22), (23,23), (24,24), (25,25), (26,26), (27,27), (28,28), (29,29),
        |  (30,30), (31,31), (32,32), (33,33), (34,34), (35,35), (36,36), (37,37), (38,38), (39,39),
        |  (40,40), (41,41), (42,42), (43,43), (44,44), (45,45), (46,46), (47,47), (48,48), (49,49),
        |  (50,50), (51,51), (52,52), (53,53), (54,54), (55,55), (56,56), (57,57), (58,58), (59,59),
        |  (60,60), (61,61), (62,62), (63,63), (64,64), (65,65), (66,66), (67,67), (68,68), (69,69),
        |  (70,70), (71,71), (72,72), (73,73), (74,74), (75,75), (76,76), (77,77), (78,78), (79,79),
        |  (80,80), (81,81), (82,82), (83,83), (84,84), (85,85), (86,86), (87,87), (88,88), (89,89),
        |  (90,90), (91,91), (92,92), (93,93), (94,94), (95,95), (96,96), (97,97), (98,98), (99,99),
        |  (100,100), (101,101), (102,102), (103,103), (104,104), (105,105), (106,106), (107,107), (108,108), (109,109),
        |  (110,110), (111,111), (112,112), (113,113), (114,114), (115,115), (116,116), (117,117), (118,118), (119,119),
        |  (120,120), (121,121), (122,122), (123,123), (124,124), (125,125), (126,126), (127,127), (128,128), (129,129),
        |  (130,130), (131,131), (132,132), (133,133), (134,87), (135,135), (136,136), (137,137), (138,138), (139,139),
        |  (140,140), (141,141), (142,142), (143,143), (144,144), (145,145), (146,146), (147,147), (148,148), (149,149),
        |  (150,150), (151,151), (152,152), (153,153), (154,154), (155,155), (156,156), (157,157), (158,158), (159,159),
        |  (160,160), (161,161), (162,162), (163,163), (164,164), (165,165), (166,166), (167,167), (168,168), (169,169),
        |  (170,170), (171,171), (172,172), (173,173), (174,174), (175,175), (176,176), (177,177), (178,152), (179,179),
        |  (180,180), (181,181), (182,182), (183,183), (184,184), (185,61), (186,186), (187,187), (188,188), (189,189),
        |  (190,190), (191,191), (192,192), (193,193), (194,194), (195,195), (196,196), (197,197), (198,198), (199,199),
        |  (200,200), (201,201), (202,202), (203,203), (204,204), (205,205), (206,206), (207,207), (208,208), (209,209),
        |  (210,210), (211,211), (212,212), (213,213), (214,214), (215,215), (216,216), (217,217), (218,218), (219,219),
        |  (220,220), (221,221), (222,222), (223,223), (224,224), (225,225), (226,226), (227,227), (228,228), (229,229),
        |  (230,230), (231,231), (232,232), (233,233), (234,234), (235,235), (236,236), (237,237), (238,238), (239,239),
        |  (240,240), (241,241), (242,242), (243,243), (244,244), (245,8), (246,246), (247,247), (248,248), (249,249),
        |  (250,250), (251,251), (252,252), (253,253), (254,254), (255,255), (256,256), (257,257), (258,258), (259,259),
        |  (260,260), (261,261), (262,262), (263,263), (264,264), (265,265), (266,266), (267,45), (268,268), (269,269),
        |  (270,270), (271,271), (272,272), (273,273), (274,274), (275,275), (276,276), (277,277), (278,278), (279,279),
        |  (280,280), (281,281), (282,282), (283,283), (284,284), (285,285), (286,286), (287,287), (288,288), (289,289),
        |  (290,98), (291,291), (292,292), (293,58), (294,294), (295,295), (296,296), (297,297), (298,298), (299,299),
        |  (300,300), (301,285), (302,302), (303,303), (304,304), (305,305), (306,306), (307,307), (308,308), (309,309),
        |  (310,310), (311,311), (312,312), (313,313), (314,314), (315,315), (316,316), (317,317), (318,318), (319,319),
        |  (320,320), (321,321), (322,322), (323,166), (324,324), (325,325), (326,326), (327,327), (328,328), (329,329),
        |  (330,330), (331,331), (332,120), (333,333), (334,334), (335,335), (336,336), (337,337), (338,338), (339,339),
        |  (340,340), (341,341), (342,342), (343,343), (344,344), (345,345), (346,346), (347,347), (348,348), (349,349),
        |  (350,350), (351,351), (352,352), (353,353), (354,354), (355,355), (356,356), (357,357), (358,358), (359,359),
        |  (360,360), (361,361), (362,362), (363,363), (364,364), (365,365), (366,366), (367,367), (368,368), (369,369),
        |  (370,370), (371,371), (372,372), (373,373), (374,295), (375,375), (376,376), (377,72), (378,378), (379,379),
        |  (380,380), (381,381), (382,382), (383,31), (384,384), (385,385), (386,386), (387,107), (388,388), (389,310),
        |  (390,390), (391,391), (392,392), (393,393), (394,394), (395,395), (396,396), (397,397), (398,398), (399,399),
        |  (400,400), (401,401), (402,402), (403,403), (404,404), (405,405), (406,406), (407,407), (408,408), (409,409),
        |  (410,410), (411,411), (412,412), (413,45), (414,414), (415,415), (416,416), (417,417), (418,418), (419,419),
        |  (420,393), (421,421), (422,422), (423,423), (424,424), (425,425), (426,426), (427,427), (428,428), (429,429),
        |  (430,430), (431,431), (432,432), (433,433), (434,434), (435,435), (436,436), (437,437), (438,438), (439,439),
        |  (440,440), (441,441), (442,442), (443,443), (444,444), (445,445), (446,44), (447,70), (448,448), (449,449),
        |  (450,92), (451,451), (452,452), (453,453), (454,454), (455,26), (456,456), (457,326), (458,458), (459,459),
        |  (460,460), (461,461), (462,458), (463,463), (464,464), (465,465), (466,466), (467,467), (468,468), (469,469),
        |  (470,470), (471,471), (472,472), (473,473), (474,474), (475,475), (476,476), (477,477), (478,478), (479,479),
        |  (480,480), (481,481), (482,482), (483,483), (484,484), (485,485), (486,435), (487,487), (488,488), (489,489),
        |  (490,490), (491,491), (492,492), (493,493), (494,494), (495,495), (496,496), (497,497), (498,498), (499,499))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
        |FROM r""".stripMargin,

    // SimHash-64 signatures + band clusters over NFC+casefolded text.
    "dedup_simhash" ->
      """WITH r(doc_id, simhash, cluster_id) AS (VALUES
        |  (0,-204477601782169568,0), (1,-7457501565879844254,1), (2,-3931308683302227326,2), (3,-3893028902582017534,3),
        |  (4,-8585078238717148618,4), (5,-8587333339263794394,5), (6,7553000108527752100,6), (7,-4011614807458280700,7),
        |  (8,-3975662424357042426,8), (9,-3973325429303669980,9), (10,-7433262924463566218,10), (11,-8583929390851415552,10),
        |  (12,-8623925346274639102,12), (13,-8587903987946847358,10), (14,-8585076046184512990,4), (15,-2469826568473531870,5),
        |  (16,-3956093883086978490,16), (17,-8533217855073416670,17), (18,-8605346356942076092,10), (19,7540079752021545956,2),
        |  (20,-8641867196152119294,17), (21,-8587272449639278307,5), (22,-8315422994808438222,22), (23,-9090615813852884156,23),
        |  (24,-6279165122802613756,9), (25,635466966307734400,1), (26,-7145056393969532138,26), (27,-3973360600716409306,9),
        |  (28,-8605345678337179070,3), (29,-8641937270682418428,20), (30,-7152934510687648860,30), (31,-8605275724056360416,18),
        |  (32,-3975644290736684284,8), (33,-8533817776450483680,33), (34,637756016705143298,34), (35,-8605308282123056602,18),
        |  (36,-8044647390587123194,36), (37,-1667553866803312826,2), (38,1752367282429919782,38), (39,5607842672071148340,39),
        |  (40,-8587264074325917162,5), (41,-8576110767956948122,41), (42,-7434984806867271042,42), (43,-8297979264308608480,22),
        |  (44,5245507288702389766,44), (45,-9089513965694481914,36), (46,-4027467299558257916,31), (47,-3973440311081530554,9),
        |  (48,-6301722165362556416,48), (49,-8585114110338522530,4), (50,-8587299344531322826,5), (51,-8587333893709855484,5),
        |  (52,-5992711625893436958,52), (53,-9088396990729678254,45), (54,-8296789730230467978,54), (55,-528703237775621244,55),
        |  (56,-8583938324383365312,10), (57,-8586207699202145514,12), (58,-8604693867589787010,17), (59,-6210132218947501280,59),
        |  (60,-6280292130744925340,60), (61,-3676194493573102750,22), (62,-8587334578362645466,5), (63,-8583890886469615018,10),
        |  (64,-8645814429934418102,1), (65,5522483884363614756,65), (66,-8587361911466360028,5), (67,-3976137413246049761,67),
        |  (68,-2876769007858311420,51), (69,-8641934936375229674,20), (70,-3991969558065568986,31), (71,-6331026893653802494,34),
        |  (72,-8586178504062631554,57), (73,-3938066273521366266,73), (74,-9007936813007755186,74), (75,5517411710459457376,75),
        |  (76,-3973392503807897818,9), (77,-9162665582737194698,77), (78,-3991374874881553916,78), (79,1843822188215665504,79),
        |  (80,-8641356524673558716,80), (81,-3964385287306214890,22), (82,-8296780796694361340,23), (83,-7164756610285288910,12),
        |  (84,-8227642122493230272,84), (85,-170841473127537696,9), (86,-9206611234643371498,86), (87,-8603072996391517594,9),
        |  (88,-1669804159168314492,88), (89,-5994398838455790810,89), (90,4374680402305295074,3), (91,-3976141141143444910,9),
        |  (92,-8622939911133822700,92), (93,-3982328088917266844,93), (94,-8642087075052518638,20), (95,-6278109591572839916,22),
        |  (96,-3687944570613528030,17), (97,-8603655439053970938,31), (98,-8296848152526060686,31), (99,-3972244053369290234,99),
        |  (100,635446350734164800,9), (101,-6336232943838822398,101), (102,-8587327015058370812,5), (103,-4009421287941994938,9),
        |  (104,-9151981638660259306,81), (105,-6281474105743736220,22), (106,5193547261691560722,8), (107,-8317746570035461342,5),
        |  (108,-2510425752012054014,3), (109,-8587334718216437246,5), (110,-1380000798470831104,110), (111,-3973392503808196042,4),
        |  (112,-4027439805325114620,9), (113,-8641935346544638140,20), (114,-8351384728388697344,114), (115,-1676561076800273628,115),
        |  (116,-8894323997239410104,116), (117,-6280360850548582586,60), (118,-8587369900098156730,5), (119,636006547410948960,119),
        |  (120,-3687415430713604250,120), (121,-8620518923969461742,121), (122,-7935974664670738688,122), (123,-8586216220366470644,1),
        |  (124,-8224274739283885534,14), (125,-7486762867831340522,70), (126,-8641864979948993788,20), (127,-3685161015259954396,26),
        |  (128,-8603021441751578108,31), (129,-514627693567540698,22), (130,359024304333335394,130), (131,-3973357160523103738,9),
        |  (132,-3615355229625375968,9), (133,-8551300404035189948,113), (134,-8605324796205202842,9), (135,-8587364110482274524,5),
        |  (136,-3685160607237799390,9), (137,5242485283266503266,26), (138,-7451230303884934322,138), (139,-3708262845472569406,133),
        |  (140,-5146566790333851834,117), (141,-8299100774759136730,129), (142,-8585006637359297756,4), (143,-8605360659182116032,9),
        |  (144,-8287804594123961564,9), (145,-8511836597341846990,22), (146,-4009469660012182763,103), (147,-5993189718231842010,50),
        |  (148,-8511931119092553216,145), (149,-8873450713853719742,149), (150,-9196447643598847214,94), (151,-8587342412399771066,5),
        |  (152,-3964931748956174396,152), (153,-6288227308377111870,153), (154,-8586156095103040970,4), (155,-8587343370160929946,5),
        |  (156,-7433286480403852522,10), (157,-3688050128380949760,96), (158,-5182609834833079808,31), (159,-8583891045315509650,11),
        |  (160,-8587321523809810620,5), (161,-8587328810153671900,5), (162,5229668267640226628,133), (163,-7477194102600365566,163),
        |  (164,-8297970953715907714,43), (165,-6278038613145087990,95), (166,-2876765709196590282,68), (167,-8296849224112987356,54),
        |  (168,-8641409642808409344,80), (169,-8630098006700158202,169), (170,-8587474762085367712,5), (171,-3940319170623692234,171),
        |  (172,-8322321614296317086,26), (173,-8576071325127933116,41), (174,-8514753666130902497,174), (175,-5118414824719777218,175),
        |  (176,-8296810193606147324,29), (177,-8623301940429682874,118), (178,-3973991724769605696,178), (179,-8585077396886748364,4),
        |  (180,-8585093919693076672,4), (181,-9163826804152039576,116), (182,-3974446916064509402,17), (183,7532600859902870464,183),
        |  (184,-8585082894442003642,4), (185,-3676194493573103070,14), (186,7531019913647096598,22), (187,-7443348678053166298,146),
        |  (188,-8237674541178674582,188), (189,-3973428242230770106,9), (190,-6279274936459328970,4), (191,-3976148685456112864,67),
        |  (192,-3975609110793810892,8), (193,-8295725540676957404,193), (194,-3973432081931566586,9), (195,-8585079059106232826,4),
        |  (196,-4009354176930510314,31), (197,-8603089600735082944,9), (198,-3974557844668890334,25), (199,-7433247784771214026,10),
        |  (200,-8605873564110519802,60), (201,-8605274083378853370,18), (202,-8584528624621681802,96), (203,-8225493002541252558,203),
        |  (204,-5164607380913126634,26), (205,-8587342262067461180,5), (206,-8584022647609481162,11), (207,-3973392499781631162,9),
        |  (208,-8574887688308489450,208), (209,-6278074342978551772,95), (210,-8605910810065854368,22), (211,-4034226145727610266,87),
        |  (212,-3993660057193245820,31), (213,-8586767075742842320,9), (214,-8298536167183183500,214), (215,-8578359243461817500,167),
        |  (216,-8623358838016048322,4), (217,-8586216495296510138,57), (218,-8605905187953704398,22), (219,-2875081798489438394,118),
        |  (220,-8583991081545987530,11), (221,-8622242002563201276,221), (222,-5983669174083218592,119), (223,-8574927815788428506,65),
        |  (224,-8605277353996448186,9), (225,-3975677834431297018,8), (226,-3741492303348333792,191), (227,-8587362736100310268,5),
        |  (228,-8587896153926499580,10), (229,-8620017130045930698,169), (230,-8587292367548805372,5), (231,-8639594488437334000,153),
        |  (232,-8585011868764698810,4), (233,-3975680585357851904,8), (234,-6303446458350435806,14), (235,-9160353500565863906,188),
        |  (236,-2530692238232501706,204), (237,-3676294272441644506,35), (238,-8602500127135618558,238), (239,-6290490945136455132,239),
        |  (240,1753510585612665606,92), (241,-8513018020428971502,241), (242,-7450104320082834938,36), (243,-5921198376563915936,243),
        |  (244,-3972209408018971898,99), (245,-3975661874332793082,8), (246,-6784804677461179040,246), (247,-8583948202731895994,11),
        |  (248,-8515201672073444522,155), (249,-4020680284862938316,31), (250,-9163170380905409770,156), (251,-8585645850840792542,14),
        |  (252,-3976149784907871738,36), (253,5258810836278051366,22), (254,-1657429984780532897,254), (255,-8585607778296591359,251),
        |  (256,-8447302151737163170,256), (257,710728262427609604,78), (258,-8587933384849489150,12), (259,-3973954334923582700,113),
        |  (260,-2747929600912777194,156), (261,-3991973956112088554,31), (262,-8552003833787571598,26), (263,-8605888684541869534,14),
        |  (264,-3685166529998748890,5), (265,-3973432357077859036,8), (266,-3940120163322950906,7), (267,-9089513965694473722,45),
        |  (268,-3687413648297032908,9), (269,-8620472606840839658,121), (270,-8603638256962895354,27), (271,-3975640725913861370,8),
        |  (272,-3975678242654516698,8), (273,-8601980214914808970,202), (274,-8587369887287737596,5), (275,8697505175088136757,275),
        |  (276,-8603654760382299386,65), (277,-8170160900265467354,277), (278,-3975613929612899801,8), (279,-8623958193992269820,3),
        |  (280,-8586208794553086202,37), (281,5231988226428905990,267), (282,-8443217736732769458,138), (283,-8587332525635894524,5),
        |  (284,-3896237013294906878,34), (285,-8585583041298759162,99), (286,-8314858975408422366,14), (287,-8586241710973713610,57),
        |  (288,-7453025731145067710,61), (289,-8641925135260635106,20), (290,-8296848152526060686,31), (291,-3975644299326880924,8),
        |  (292,-3973954197768895690,166), (293,-8604693858999852418,17), (294,-7452462781114351098,61), (295,-8639118410638948522,9),
        |  (296,-8585007992429671676,4), (297,-8286737015604248026,45), (298,-8587334176783433404,5), (299,-8602107732489665994,4),
        |  (300,-3703109161945365722,147), (301,-8585583039151275514,99), (302,-8586204402747702778,17), (303,-8605840458704223730,200),
        |  (304,-6271393727508085916,60), (305,5607556653006455744,183), (306,-8585215682015919354,4), (307,-7488589159799191026,22),
        |  (308,-8623338782398770492,3), (309,-516866327494491610,38), (310,-6304040349281794966,310), (311,-8587330025629154524,5),
        |  (312,-8586142707750002050,23), (313,-2023349795315511360,313), (314,-8286653310996282522,63), (315,-3685166521407765978,9),
        |  (316,-3901908146104038912,60), (317,-8622246952597159084,221), (318,-8602462758849150398,3), (319,-8603128908209716730,60),
        |  (320,-3975612258862232986,8), (321,-3973379290265550330,9), (322,-7452920732213468081,209), (323,-2876765709196590282,68),
        |  (324,-7405699035728436730,324), (325,-6009056214332995038,17), (326,-4018431530449714396,115), (327,-8603104873588325820,87),
        |  (328,-3975640708733992442,8), (329,-8586201042004180140,57), (330,-3974587647244883914,182), (331,-4027418929636538746,31),
        |  (332,-3687415435008571548,120), (333,-7433894372770283497,333), (334,-8639143686521484512,9), (335,-1382170133035445376,335),
        |  (336,-3973883966102961602,1), (337,-3973425484865920476,9), (338,-3881242140271443402,4), (339,-8305887770194963676,146),
        |  (340,-8585010333188095486,4), (341,-6279247594697227452,24), (342,-1694552390192032890,166), (343,-4190198035930662656,343),
        |  (344,-8586207574547725530,57), (345,5247163705241666500,155), (346,-8601908589885355194,47), (347,-8298682818607709582,96),
        |  (348,-6278111258285964800,48), (349,-8514195047626571210,4), (350,-6280361258326359296,60), (351,-4032505536647790010,65),
        |  (352,-8587344319347424476,5), (353,-3703145720509562080,59), (354,-8587896549256690940,12), (355,-8064909264766631410,303),
        |  (356,-7433287220983758034,10), (357,-6281526822239648906,105), (358,-3937372364649528542,107), (359,-3975683864834047228,8),
        |  (360,-5128550138040220892,66), (361,-3976216586539990138,10), (362,-6278118039772986849,2), (363,-8585048268485951166,4),
        |  (364,-7486766304825630190,125), (365,-6855111718402440960,365), (366,-3955381109896510974,34), (367,-8296774465919646972,9),
        |  (368,-8229022689815887326,14), (369,-8587330455462411468,5), (370,-8373418674790333602,346), (371,-523635172012195034,5),
        |  (372,7562601186116504199,372), (373,-3973392082901136842,9), (374,-8621104012129466538,9), (375,-8585120140401311164,4),
        |  (376,-8585006970152146338,4), (377,-8586134523596471426,57), (378,5229713356198511492,9), (379,-8639689742154989056,48),
        |  (380,635441402931913218,3), (381,-1667478580388685308,37), (382,5247759782345222692,60), (383,-8605275998934267360,18),
        |  (384,-8586209443160485042,57), (385,-7452918799268314368,114), (386,-8515803633273198590,320), (387,-8317746284420136158,26),
        |  (388,-6285406504785276330,341), (389,-8609883358495505302,310), (390,-8876170235664399872,9), (391,-3972209409893850538,1),
        |  (392,-2866003697638251970,40), (393,-8623360194907929834,26), (394,-4000981163973767146,394), (395,-8587930238719884798,13),
        |  (396,-8587330053613551074,5), (397,-8586129479258823578,10), (398,-8587259540987879370,5), (399,-8305822205304601626,60),
        |  (400,5284237293590184482,166), (401,-8621108150340091132,29), (402,1861407867120462370,15), (403,-8586779309974945280,48),
        |  (404,-3685653588148714716,77), (405,-8299136633507935451,9), (406,-7434448240879861178,22), (407,-3683979035899067578,96),
        |  (408,-8805338597020073422,22), (409,-3706029617098775706,23), (410,-2838489776362847674,65), (411,-5992166070759193754,0),
        |  (412,-8514181853755735260,12), (413,-9089513965694473722,45), (414,-6208906329720585440,22), (415,-8584551285127870654,202),
        |  (416,-8586182268626663610,37), (417,-8587333188890653920,5), (418,-3685303960365432064,39), (419,-9162174240373331454,238),
        |  (420,-8623371194319240442,177), (421,-3973395523186982138,9), (422,-6270225004426952154,129), (423,-3976239669840702970,31),
        |  (424,-8585075889354309116,4), (425,-3904327084640230768,337), (426,-8603077531876916666,57), (427,-8586239460485365122,9),
        |  (428,-8587259407843983338,5), (429,-3973325429303672282,9), (430,-8587892973436141002,4), (431,-4008330564018601164,179),
        |  (432,-8296288200661040606,366), (433,-8612700155050450926,121), (434,-3991898362540449278,3), (435,-3974527058343575244,77),
        |  (436,7562538372167926724,9), (437,-7413591469512949210,1), (438,-1667553750906780923,9), (439,-8290090620634725536,3),
        |  (440,-8585044160342129918,4), (441,-8583882234189839822,11), (442,-8503458456168029642,1), (443,-3993627739847119234,78),
        |  (444,-7461417205958923746,238), (445,-3636219553617018336,22), (446,5259018087584501254,44), (447,-3991969558065568986,31),
        |  (448,-8442237659470888322,42), (449,638332010479487524,65), (450,-8548630517273820908,92), (451,-8623355799323797692,80),
        |  (452,-8585011443361641626,4), (453,-8603091808348536314,26), (454,-8299518584965823616,454), (455,-7142804319210822890,141),
        |  (456,-8295704703582043358,193), (457,-3694172357279038684,115), (458,-7452423750675320222,5), (459,-6279235495841758412,9),
        |  (460,-6278649318639140318,14), (461,-3991895890719407614,17), (462,-7452423750675332510,1), (463,-8583882232243681722,11),
        |  (464,-8641352347582982396,80), (465,1789530511652160326,84), (466,-8603588789751504382,3), (467,5247195588662952790,38),
        |  (468,-8603034500596748466,87), (469,-8315004103510981824,84), (470,-8603058260492941562,67), (471,-1688413672624020878,57),
        |  (472,-6278090642177129952,22), (473,-7161942818027470026,166), (474,-2838532655160228346,45), (475,-8512505235962330586,12),
        |  (476,-5992131524491701472,411), (477,6355056091965078150,477), (478,-8623342357958065388,31), (479,-3685091756764675292,127),
        |  (480,-3993698808473009342,212), (481,-564836904126899706,481), (482,133774370819803908,46), (483,-7150118723677773262,483),
        |  (484,-5077337199190662490,484), (485,-2833947698123202042,17), (486,-8586213078918446796,38), (487,-8296778743641013468,54),
        |  (488,-4011708261323242946,7), (489,-8605834542251240704,31), (490,-8586204357819595908,57), (491,-3973360596420620476,9),
        |  (492,-1685567878966983585,492), (493,5229749640082229798,9), (494,-1672718837707177338,422), (495,-8594016299720037834,145),
        |  (496,-9160431497170877930,8), (497,-4011676672192378619,7), (498,-3973919835527839194,129), (499,-5136992246299811162,484))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(simhash AS BIGINT) AS simhash, CAST(cluster_id AS BIGINT) AS cluster_id
        |FROM r""".stripMargin,

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
        |FROM r""".stripMargin
  )
}
