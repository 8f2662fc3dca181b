package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CtrAlerts
import graft.sources.Tables

class AlertsSpec extends AnyFunSuite with SparkFixture {

  test("approx percentiles land within the sketch's rank-error band of exact") {
    import graft.operators.Report
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = asMap(Report.earningsPercentilesApprox(spark, Sf).collect())
    val exact = asMap(Report.earningsPercentiles(spark, Sf).collect())
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e50, e90, e99)) =>
      val (a50, a90, a99) = approx(k)
      // accuracy=10000 → rank error 1e-4; on this value distribution a
      // 1% relative band is generous and still catches a broken sketch
      Seq((a50, e50, "p50"), (a90, e90, "p90"), (a99, e99, "p99")).foreach {
        case (a, e, tag) =>
          assert(math.abs(a - e) / e <= 0.01, s"$k $tag: approx $a vs exact $e")
      }
    }
  }

  test("value histogram partitions every row into clamped equal-width bins") {
    import graft.operators.Report
    val rows = Report.valueHistogram(spark, Sf).collect()
    val total = Tables.events(spark, Sf).count()
    assert(rows.map(_.getLong(2)).sum == total,
      "bin counts must partition the table")
    val buckets = rows.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 20), s"buckets clamped to [0,20): ${buckets.toSeq}")
    assert(buckets.distinct.length == buckets.length)
    // bucket_lo is monotone in bucket
    val los = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    assert(los.zip(los.drop(1)).forall { case (a, b) => a < b })
  }

  test("value histogram honors a non-default bin count (incl. the max-value clamp)") {
    import spark.implicits._
    // values 0..6 over 7 bins of width 6/7: value 6 must clamp into
    // bin 6, one value per bin
    val out = graft.operators.Report.valueHistogramOf(
      (0 to 6).map(_.toDouble).toDF("value"), bins = 7).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == (0L to 6L).map(_ -> 1L).toMap, s"got $out")
    // degenerate single-value input → everything in bin 0
    val deg = graft.operators.Report.valueHistogramOf(
      Seq(3.0, 3.0, 3.0).toDF("value"), bins = 5).collect()
    assert(deg.length == 1 && deg.head.getLong(0) == 0L && deg.head.getLong(2) == 3L)
  }

  test("approx_count_distinct estimate lands within 5% of exact per group") {
    val approx = CtrAlerts.approxDistinctUsers(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, Sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }
}
