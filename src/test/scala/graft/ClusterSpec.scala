package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cluster

class ClusterSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("label centroids: identical members cohere at 1.0, orthogonal at ~0.71") {
    val emb = Seq(
      (1L, 0, Array(1f, 0f, 0f, 0f)),
      (2L, 0, Array(2f, 0f, 0f, 0f)), // same direction → cos 1 to centroid
      (3L, 1, Array(1f, 0f, 0f, 0f)),
      (4L, 1, Array(0f, 1f, 0f, 0f))) // orthogonal pair → cos 1/√2 each
      .toDF("vec_id", "label", "embedding")
    val out = Cluster.labelCentroidsOf(emb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(0) == ((2L, 1.0, 1.0)))
    assert(out(1)._1 == 2L)
    assert(out(1)._2 == 0.7071) // avg over quantized sums, floor-form 4 dp
    assert(out(1)._3 == 0.707107) // min of 6-dp rounded member cosines
  }

  test("label centroids: a singleton label coheres perfectly with itself") {
    val emb = Seq((1L, 7, Array(0.3f, -0.2f, 0.9f, 0.1f)))
      .toDF("vec_id", "label", "embedding")
    val out = Cluster.labelCentroidsOf(emb).collect().head
    assert(out.getLong(1) == 1L)
    // centroid = the vector itself up to 1e-6 quantization → cos ≈ 1
    assert(out.getDouble(2) >= 0.9999)
  }
}
