package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CtrAlerts
import graft.sources.Tables

class AlertsSpec extends AnyFunSuite with SparkFixture {

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
