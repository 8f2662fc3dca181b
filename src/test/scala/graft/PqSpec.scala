package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq
import graft.sources.Tables

class PqSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, Sf)
  private lazy val codebook = Pq.trainCodebooks(emb).cache()

  test("codebooks: every subspace carries at most K centroids of the right width") {
    val rows = codebook.collect()
    val bySub = rows.groupBy(_.getInt(0))
    assert(bySub.keySet == (0 until Pq.Subspaces).toSet)
    bySub.foreach { case (s, cs) =>
      assert(cs.length <= Pq.K && cs.nonEmpty, s"subspace $s: ${cs.length} centroids")
      cs.foreach(r => assert(r.getSeq[Double](2).length == Pq.SubDim))
    }
  }

  test("encode: every vector gets one in-range code per subspace; training is deterministic") {
    val codes = Pq.encode(emb, codebook)
    val n = emb.count()
    assert(codes.count() == n * Pq.Subspaces)
    val bad = codes.filter(col("code") < 0 || col("code") >= Pq.K).count()
    assert(bad == 0)
    // re-training from scratch reproduces the exact codebook (no RNG)
    val again = Pq.trainCodebooks(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val first = codebook.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(again == first, "codebook training must be run-to-run deterministic")
  }

  test("quantization shrinks reconstruction error vs a 1-centroid codebook") {
    val codes = Pq.encode(emb, codebook)
    val pqErr = codes.agg(sum("qerr")).head().getDouble(0)
    // baseline: quantizing everything to the global mean costs exactly
    // the total variance; 16 centroids per subspace must land well
    // under it (3/4 bound — the enforced contract)
    val subs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(explode(col("e")).as("v"))
    val variance = subs.agg(sum(col("v") * col("v")).as("ss"),
        sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("ss") - col("s") * col("s") / col("n")).head().getDouble(0)
    assert(pqErr < variance * 0.75,
      s"PQ reconstruction error $pqErr should be well under the variance $variance")
  }

  test("two-stage search: ADC shortlist + exact re-rank, recall against exact L2") {
    val queries = emb.filter(col("vec_id") < 8)
    val codes = Pq.encode(emb, codebook)
    val adcOnly = Pq.search(queries, codes, codebook, excludeSelf = true).collect()
    val byQAdc = adcOnly.groupBy(_.getLong(0))
    assert(byQAdc.keySet == (0L until 8L).toSet)
    byQAdc.values.foreach { rows =>
      assert(rows.length == Pq.TopK)
      val adcs = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(adcs.toSeq == adcs.sorted.toSeq, "rank order must follow ADC distance")
    }
    // exact L2 ground truth, computed driver-side on the tiny test SF
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def recallOf(rows: Map[Long, Set[Long]]): Double = (0L until 8L).map { q =>
      val exact = vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(vecs(q), vecs(n)), n)).take(Pq.TopK).toSet
      exact.intersect(rows(q)).size.toDouble / Pq.TopK
    }.sum / 8
    val adcRecall = recallOf(byQAdc.view.mapValues(_.map(_.getLong(1)).toSet).toMap)
    val reranked = Pq.searchRerank(queries, emb, codes, codebook, excludeSelf = true).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rerankRecall = recallOf(reranked)
    assert(adcRecall > 0.15, s"raw ADC recall collapsed: $adcRecall")
    assert(rerankRecall >= adcRecall,
      s"re-rank must not lose recall ($rerankRecall vs $adcRecall)")
    assert(rerankRecall >= 0.5,
      s"two-stage recall@10 vs exact L2 was $rerankRecall — shortlist too weak")
  }
}
