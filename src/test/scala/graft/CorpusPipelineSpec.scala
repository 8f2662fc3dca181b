package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusReleasePipeline

/** End-to-end corpus-release orchestration: every stage is a certified
  * operator; these cases pin the COMPOSITION — the funnel arithmetic,
  * the artifacts, and the rerun no-op contract. */
class CorpusPipelineSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def docsDf(rows: (Long, String, String, String)*): DataFrame =
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val base = (1 to 20).map(i => s"w$i").mkString(" ")

  /** bench holdout + exact dup + near dup + contaminated + survivors
    * across three sources whose md5 buckets split train/val/test. */
  private def corpus = docsDf(
    (100L, "alpha bravo charlie delta echo foxtrot golf hotel india",
      "en", "bench"),
    (1L, base, "en", "web"),
    (2L, base, "en", "web"), // exact duplicate of 1
    (3L, base + " extraword", "en", "web"), // near-dup of 1
    (4L, "alpha bravo charlie delta echo foxtrot golf hotel unique tail",
      "en", "web"), // shares the bench 8-gram
    (5L, "five completely original tokens nothing shared anywhere", "en", "web"),
    (6L, "wiki body with its own tokens entirely", "en", "wiki"),
    (7L, "another unrelated body of test tokens", "en", "s2"),
    (8L, "unsupported language body", "zh", "s2"))

  test("release pipeline: the funnel counts each stage's removals exactly") {
    val out = Files.createTempDirectory("graft-release").toString
    val r = CorpusReleasePipeline.runOf(corpus, out, benchSource = "bench")
    val funnel = r.funnel.map(s => s.stage -> ((s.n_in, s.n_removed, s.n_out)))
      .toMap
    // clean: 9 in, bench holdout + the zh doc out
    assert(funnel("1_clean") == ((9L, 2L, 7L)), s"$funnel")
    // dedup: {1,2,3} collapse to one representative
    assert(funnel("2_dedup") == ((7L, 2L, 5L)), s"$funnel")
    // decontaminate: doc 4 carries the bench 8-gram
    assert(funnel("3_decontaminate") == ((5L, 1L, 4L)), s"$funnel")
    // mixture: the default budget dwarfs the corpus — everyone funded
    assert(funnel("4_mixture") == ((4L, 0L, 4L)), s"$funnel")
    assert(funnel("5_total") == ((9L, 5L, 4L)), s"$funnel")
    // group-aware split: web→train (rep of {1,2,3} + doc 5),
    // wiki→val, s2→test
    assert(r.splitCounts == Map("train" -> 2L, "val" -> 1L, "test" -> 1L),
      s"${r.splitCounts}")
    // both train docs fit one 256-token sequence of source `web`
    assert(r.nPackedSeqs == 1L, s"${r.nPackedSeqs}")
  }

  test("release pipeline: artifacts land and agree with the funnel") {
    val out = Files.createTempDirectory("graft-release").toString
    val r = CorpusReleasePipeline.runOf(corpus, out, benchSource = "bench")
    val release = spark.read.parquet(s"$out/release")
    assert(release.count() == 4L)
    assert(release.columns.toSet == Set("doc_id", "lang", "source", "split"))
    // the bench source and the contaminated doc never leak out
    assert(release.filter(col("source") === "bench").isEmpty)
    assert(release.filter(col("doc_id").isin(4L, 8L, 100L)).isEmpty)
    val packed = spark.read.parquet(s"$out/packed")
    assert(packed.select("doc_id").distinct().count() == 2L)
    val manifest = spark.read.json(r.manifestPath)
    assert(manifest.count() == 5L, "five funnel stages in the manifest")
    assert(manifest.filter(col("stage") === "5_total")
      .select("n_out").head().getLong(0) == 4L)
  }

  test("release pipeline: re-running the release is a no-op") {
    val out = Files.createTempDirectory("graft-release").toString
    val r1 = CorpusReleasePipeline.runOf(corpus, out, benchSource = "bench")
    val release1 = spark.read.parquet(s"$out/release").collect().toSet
    val packed1 = spark.read.parquet(s"$out/packed").collect().toSet
    val manifest1 = spark.read.json(r1.manifestPath)
      .orderBy("ord").collect().toSeq
    val r2 = CorpusReleasePipeline.runOf(corpus, out, benchSource = "bench")
    assert(r1.funnel == r2.funnel, "funnel counts are run-invariant")
    assert(r1.splitCounts == r2.splitCounts && r1.nPackedSeqs == r2.nPackedSeqs)
    assert(spark.read.parquet(s"$out/release").collect().toSet == release1,
      "the release artifact is byte-for-byte the same rows")
    assert(spark.read.parquet(s"$out/packed").collect().toSet == packed1)
    assert(spark.read.json(r2.manifestPath).orderBy("ord").collect().toSeq
      == manifest1, "the manifest is reproduced row-identical")
  }

  test("release pipeline: an empty corpus flows through as the zero funnel") {
    val out = Files.createTempDirectory("graft-release").toString
    val r = CorpusReleasePipeline.runOf(
      docsDf(), out)
    r.funnel.foreach { s =>
      assert(s.n_in == 0L && s.n_out == 0L, s"zero everywhere: $s")
    }
    assert(r.splitCounts.isEmpty && r.nPackedSeqs == 0L)
  }

  test("release pipeline: a tight token budget cuts the mixture stage only") {
    val out = Files.createTempDirectory("graft-release").toString
    // budget of 8 tokens against ~32 surviving: waterfill assigns each
    // source a fraction < 1 and the content-ranked prefix applies it
    val r = CorpusReleasePipeline.runOf(corpus, out, benchSource = "bench",
      budgetTokens = 8L)
    val funnel = r.funnel.map(s => s.stage -> s).toMap
    assert(funnel("3_decontaminate").n_out == 4L)
    val kept = funnel("4_mixture").n_out
    assert(kept >= 1L && kept < 4L,
      s"the budget must cut somewhere yet ceil() keeps ≥1 per source: $funnel")
    assert(funnel("5_total").n_out == kept)
  }
}
