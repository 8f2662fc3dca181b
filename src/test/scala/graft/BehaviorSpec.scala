package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

class BehaviorSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def eventsDf(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex.map { case ((u, et, t), i) => (i.toLong, u, et, t) }
      .toDF("event_id", "user_id", "event_type", "t")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("t")).as("ts"), lit(1.0).as("value"))

  test("funnel: steps must be strictly ordered in time per user") {
    val ev = eventsDf(
      // u1 completes the full funnel in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:01:00"),
      (1L, "purchase", "2024-01-01 10:02:00"),
      // u2 clicked BEFORE the first view → click step not reached
      (2L, "click", "2024-01-02 09:00:00"),
      (2L, "view", "2024-01-02 10:00:00"),
      // u3 views only
      (3L, "view", "2024-01-03 08:00:00"))
    val out = Behavior.funnelStepsOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("view", 3L, 100.0), ("click", 1L, 33.33), ("purchase", 1L, 33.33)))
  }

  test("funnel: an event at exactly the prior step's time does not advance") {
    val ev = eventsDf(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00")) // same micro → not strictly after
    val out = Behavior.funnelStepsOf(ev).collect().map(r => r.getLong(2))
    assert(out.toSeq == Seq(1L, 0L, 0L))
  }

  test("funnel: zero step-1 events pin conv_pct to 0.0, not NaN") {
    val ev = eventsDf((1L, "click", "2024-01-01 10:00:00"))
    val out = Behavior.funnelStepsOf(ev).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0L, 0.0), (0L, 0.0), (0L, 0.0)))
  }

  test("cohort retention: offset 0 is the cohort day, beyond maxOffset drops") {
    val ev = eventsDf(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 10:00:00"), // offset 1
      (1L, "view", "2024-01-02 11:00:00"), // same (user, day) → one activity
      (1L, "view", "2024-01-20 10:00:00"), // offset 19 > 7 → dropped
      (2L, "view", "2024-01-02 10:00:00"))
    val out = Behavior.cohortRetentionOf(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-02", 0, 1L)))
  }

  test("event transitions: per-user ordering, cross-user boundaries don't pair") {
    val ev = eventsDf(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:01:00"),
      (1L, "click", "2024-01-01 10:02:00"),
      // user 2's first event must NOT pair with user 1's last
      (2L, "purchase", "2024-01-01 10:03:00"),
      (2L, "view", "2024-01-01 10:04:00"))
    val out = Behavior.eventTransitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("click", "click", 1L, 1.0),
      ("purchase", "view", 1L, 1.0),
      ("view", "click", 1L, 1.0)))
  }

  test("event transitions: probabilities normalize per source type") {
    val ev = eventsDf(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:01:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:01:00"),
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "purchase", "2024-01-01 10:01:00"))
    val out = Behavior.eventTransitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("view", "click")) == 0.6667)
    assert(out(("view", "purchase")) == 0.3333)
  }

  test("pivot: absent event types fill 0.0 and sums are exact") {
    val ev = Seq(
      (1L, "click", "2024-01-01 10:00:00", 1.25),
      (2L, "click", "2024-01-01 11:00:00", 2.25),
      (3L, "view", "2024-01-01 12:00:00", 0.5))
      .toDF("user_id", "event_type", "t", "value")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("t")).as("ts"), col("value"))
    val row = Behavior.pivotReportOf(ev).collect().head
    assert(row.getAs[Double]("click") == 3.5)
    assert(row.getAs[Double]("view") == 0.5)
    assert(row.getAs[Double]("purchase") == 0.0)
    assert(row.getAs[Double]("error") == 0.0)
    assert(row.getAs[Double]("signup") == 0.0)
  }
}
