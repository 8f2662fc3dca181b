package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, Dedup}
import graft.sources.Tables

/** The graft.scale.approx contract: every sketch swap must (a) agree
  * with its exact twin within a stated band on the sf0.01 corpus, and
  * (b) actually produce the cheaper plan shape it promises — fixed
  * state for the distinct/percentile swaps, and for the dup matrix
  * the DISAPPEARANCE of the per-gram equi-join. */
class ScaleApproxSpec extends AnyFunSuite with SparkFixture {
  private val Dir = "/root/testdata/sf0.01"
  private def docs = Tables.documents(spark, Dir)

  test("ngram diversity: HLL distinct tracks exact within the 2% rsd band") {
    val exact = CorpusStats.distinctNgramDiversityOf(docs).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val approx = CorpusStats.distinctNgramDiversityOf(docs, approx = true)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (total, dExact)) =>
      val (aTotal, dApprox) = approx(k)
      assert(aTotal == total, s"$k: total_ngrams must be exact either way")
      val relErr = math.abs(dApprox - dExact).toDouble / dExact
      assert(relErr <= 0.06, // 3× the 2% rsd ≈ a 3-sigma band
        s"$k: approx distinct $dApprox strayed ${relErr * 100}%% from exact $dExact")
    }
  }

  test("dup matrix: sketch inclusion-exclusion tracks exact, union-relative") {
    val exact = Dedup.dupMatrixOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val approx = Dedup.dupMatrixOf(docs, approx = true).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // Inclusion-exclusion error is rsd·|A∪B| (NOT intersection-
    // relative): compute each pair's union from exact per-source
    // distinct gram counts and band at ~3 sigma of the 0.2% lgK=18
    // rsd, floored for integer-rounding noise.
    val perSrc = docs
      .select(col("source"),
        explode(graft.functions.TextF.strictShingles(col("text"), 8)).as("g"))
      .select(col("source"), xxhash64(col("g")).as("h")).distinct()
      .groupBy("source").agg(count(lit(1)).as("n_grams")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def slack(k: (String, String), inter: Long): Long =
      math.max(6L, (0.006 * (perSrc(k._1) + perSrc(k._2) - inter)).toLong)
    exact.foreach { case (k, nExact) =>
      val nApprox = approx.getOrElse(k, 0L)
      assert(math.abs(nApprox - nExact) <= slack(k, nExact),
        s"$k: sketch estimate $nApprox vs exact $nExact " +
          s"(union-relative slack ${slack(k, nExact)})")
    }
    // No hallucinated heavy pairs: anything the sketch path emits that
    // the exact matrix lacks must sit at the pair's noise floor.
    approx.foreach { case (k, n) =>
      if (!exact.contains(k))
        assert(n <= slack(k, 0L), s"$k: phantom shared mass $n")
    }
  }

  test("quantile normalize: sketch grid maps every doc within 0.05 of exact") {
    val exact = CorpusStats.quantileNormalizeOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val approx = CorpusStats.quantileNormalizeOf(docs, approx = true).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(approx.keySet == exact.keySet)
    val worst = exact.keys.map(k => math.abs(approx(k) - exact(k))).max
    assert(worst <= 0.05,
      s"worst per-doc |q_norm(sketch) - q_norm(exact)| = $worst > 0.05")
  }

  test("plan: the sketch dup matrix carries NO per-gram equi-join") {
    def equiJoins(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: BroadcastHashJoinExec => j
    }
    val exactPlan = Dedup.dupMatrixOf(docs).queryExecution.sparkPlan
    val sketchPlan = Dedup.dupMatrixOf(docs, approx = true)
      .queryExecution.sparkPlan
    assert(equiJoins(exactPlan).nonEmpty,
      "control: the exact path equi-joins on the gram hash")
    assert(equiJoins(sketchPlan).isEmpty,
      s"sketch path must not equi-join grams:\n$sketchPlan")
    assert(sketchPlan.toString.contains("hll_union"),
      "sketch path must pair sketches via hll_union")
  }

  test("flag: registered wrappers read graft.scale.approx from the session") {
    spark.conf.set(Scale.ApproxKey, "true")
    try {
      val analyzed = Seq(
        Dedup.dupMatrix(spark, Dir),
        CorpusStats.distinctNgramDiversity(spark, Dir),
        CorpusStats.quantileNormalize(spark, Dir))
        .map(_.queryExecution.analyzed.toString)
      // (the sketch AGGREGATE hides behind the localCheckpoint's
      // LogicalRDD — the pairing stage is the visible witness)
      assert(analyzed(0).contains("hll_union"))
      assert(analyzed(1).contains("approx_count_distinct"))
      assert(analyzed(2).contains("approx_percentile"))
    } finally spark.conf.unset(Scale.ApproxKey)
    // default stays the exact verification contract
    assert(!Dedup.dupMatrix(spark, Dir)
      .queryExecution.analyzed.toString.contains("hll_union"))
  }
}
