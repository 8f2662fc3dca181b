package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("extractFeatures: stub decoder is deterministic with the declared shape") {
    val payloads = Seq(
      (1L, Array[Byte](3, 7, 40, 41, 42)),
      (2L, Array[Byte]()),
      (3L, "hello world".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val a = Multimodal.extractFeatures(spark, payloads).collect().sortBy(_.getLong(0))
    val b = Multimodal.extractFeatures(spark, payloads).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "decoder must be deterministic")

    val r1 = a(0)
    assert(r1.getInt(1) == 4 && r1.getInt(2) == 8, "width/height from leading bytes +1")
    assert(r1.getInt(3) == 5)
    assert(r1.getSeq[Float](4).length == 8, "fixed-length feature vector")
    val r2 = a(1)
    assert(r2.getInt(1) == 0 && r2.getInt(2) == 0 && r2.getInt(3) == 0)
  }

  test("multimodalFeatures runs partition-parallel over the documents table") {
    val out = Multimodal.multimodalFeatures(spark, Sf)
    assert(out.columns.toSeq == Seq("doc_id", "width", "height", "n_bytes", "features"))
    val n = out.count()
    assert(n == graft.sources.Tables.documents(spark, Sf).count())
  }
}
