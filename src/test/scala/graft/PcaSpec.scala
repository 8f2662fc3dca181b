package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("pc1 recovers the dominant direction of a line-plus-noise cloud") {
    // points t·(0.6, 0.8, 0, 0) + tiny orthogonal jitter: pc1 must align
    // with (0.6, 0.8) and carry nearly all the variance.
    val rnd = new scala.util.Random(3)
    val rows = (0L until 200L).map { i =>
      val t = (i.toDouble / 100.0) - 1.0
      val eps = (rnd.nextDouble() - 0.5) * 0.01
      (i, Array(0.6f * t.toFloat + (0.8 * eps).toFloat,
        0.8f * t.toFloat - (0.6 * eps).toFloat, 0.0f, 0.0f), 0)
    }
    val out = Pca.pcaEmbedOf(rows.toDF("vec_id", "embedding", "label"), d = 4)
      .collect()
    assert(out.length == 200)
    val pc1 = out.map(_.getDouble(2))
    val pc2 = out.map(_.getDouble(3))
    def variance(xs: Array[Double]) = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    assert(variance(pc1) > 100 * variance(pc2),
      "the line direction dominates the jitter direction")
    // pc1 of the point at t=1 is ±|t| ≈ 1 (projection onto the unit line)
    val extreme = out.maxBy(r => math.abs(r.getDouble(2))).getDouble(2)
    assert(math.abs(math.abs(extreme) - 1.0) < 0.05, s"got $extreme")
  }

  test("driver eigensolve: orthonormal components, descending variance") {
    // hand covariance with known eigenstructure: diag(4, 1, 0.25)
    // rotated is overkill — diagonal already exercises the deflation.
    val cov = Array(
      Array(4.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 0.25))
    val (v1, l1, v2, l2) = Pca.top2(cov)
    assert(math.abs(l1 - 4.0) < 1e-9 && math.abs(l2 - 1.0) < 1e-9)
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) < 1e-9)
    // sign pinned: the dominant coordinate is positive
    assert(v1(0) > 0 && v2(1) > 0)
  }

  test("projection is centered: column means of pc1/pc2 are ~0") {
    val rows = (0L until 64L).map { i =>
      (i, Array.tabulate(4)(j => ((i * 7 + j * 13) % 11).toFloat / 11f), 0)
    }
    val out = Pca.pcaEmbedOf(rows.toDF("vec_id", "embedding", "label"), d = 4)
      .collect()
    val m1 = out.map(_.getDouble(2)).sum / out.length
    val m2 = out.map(_.getDouble(3)).sum / out.length
    assert(math.abs(m1) < 1e-3 && math.abs(m2) < 1e-3, s"means $m1 / $m2")
  }
}
