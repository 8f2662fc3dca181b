package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextF
import graft.sources.Tables

/** Text-analysis family over `documents`: token counting, per-group
  * stats, quality scoring, fingerprinting, language ID. All map-side
  * expression work + one aggregation shuffle — the 100 TB shape.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a")

  /** Token counts per source (whitespace tokenization). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum(TextF.tokenCount(col("text"))).as("total_tokens"),
        max(TextF.tokenCount(col("text"))).as("max_tokens"))
      .orderBy("source")

  /** Per-language corpus stats. Ratios are single divisions of exact
    * integer sums — reproducible across engines and partitionings. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum("n_chars").as("total_chars"),
        sum(TextF.tokenCount(col("text"))).as("total_tokens"))
      .select(col("lang"), col("docs"), col("total_chars"), col("total_tokens"),
        round(col("total_chars").cast("double") / col("docs").cast("double"), 4)
          .as("avg_chars"),
        round(col("total_tokens").cast("double") / col("docs").cast("double"), 4)
          .as("avg_tokens"))
      .orderBy("lang")

  /** Per-document quality score (length/punct/stopword heuristics). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextF.qualityScore(col("text"), Stopwords).as("quality"))
      .orderBy("doc_id")

  /** Rolling polynomial document fingerprint (SQL-expressible variant;
    * the xxhash64 [[TextF.contentFingerprint]] is the production key). */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextF.rollingFingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Common-word profiles for the language-ID heuristic (public
    * most-frequent-words lists, truncated). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "que"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"))

  /** Language-ID over a text column: argmax of per-language common-word
    * hit counts (ties break on language code; "und" when no profile
    * matches). N-gram-free word heuristic — the Spark plumbing (argmax
    * via max over (score, lang) structs) is the deliverable. */
  def langIdCol(text: Column): Column = {
    val toks = TextF.tokens(lower(text))
    val scored = array(LangProfiles.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Predicted vs labeled language per document. The synthetic corpus
    * shares one vocabulary across labels, so accuracy is only
    * meaningful on real text (see LangIdSpec); this query exercises the
    * distributed plumbing. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), langIdCol(col("text")).as("pred_lang"))
      .orderBy("doc_id")
}
