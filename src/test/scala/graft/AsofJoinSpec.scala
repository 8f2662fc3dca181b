package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("asofJoin attaches the most recent right row at or before each left row") {
    val clicks = Seq(
      (1L, 100L, 1001L), // after views 10,50,60 -> latest is 53
      (1L, 55L, 1002L),  // between 50 and 60 -> 52
      (1L, 50L, 1003L),  // exactly at view ts 50 -> 52 (<= semantics)
      (1L, 5L, 1004L),   // before any view -> null
      (2L, 100L, 2001L)  // user with no views at all -> null
    ).toDF("user_id", "ts_ns", "click_id")
    val views = Seq(
      (1L, 10L, 51L),
      (1L, 50L, 52L),
      (1L, 60L, 53L)
    ).toDF("user_id", "ts_ns", "view_id")

    val got = AsofJoin.asofJoin(clicks, views, "user_id", "ts_ns", Seq("view_id"))
      .select("click_id", "view_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(got == Map(
      1001L -> Some(53L), 1002L -> Some(52L), 1003L -> Some(52L),
      1004L -> None, 2001L -> None))
  }

  test("a matched right row with a NULL payload yields NULL, not an older value") {
    val clicks = Seq((1L, 100L, 9001L)).toDF("user_id", "ts_ns", "click_id")
    val views = Seq(
      (1L, 10L, Some(51L)),
      (1L, 80L, None) // nearest prior view exists but its value is NULL
    ).toDF("user_id", "ts_ns", "view_id")
    val got = AsofJoin.asofJoin(clicks, views, "user_id", "ts_ns", Seq("view_id"))
      .select("click_id", "view_id").head()
    assert(got.getLong(0) == 9001L && got.isNullAt(1),
      "carrying raw columns would skip the NULL and wrongly attribute view 51")
  }

  test("name collisions with reserved or left-side columns are rejected up front") {
    val left = Seq((1L, 10L, "x")).toDF("user_id", "ts_ns", "payload")
    val right = Seq((1L, 5L, "y")).toDF("user_id", "ts_ns", "payload")
    // valueCol also exists on the left -> duplicate output names
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofJoin(left, right, "user_id", "ts_ns", Seq("payload")))
      .getMessage.contains("alias one side"))
    // a reserved internal name on an input would be clobbered
    val poisoned = left.withColumnRenamed("payload", "__side")
    assert(intercept[IllegalArgumentException](
      AsofJoin.asofJoin(poisoned, right, "user_id", "ts_ns", Seq("payload")))
      .getMessage.contains("__side"))
  }

  test("clickAttribution over the real events table: attributed view precedes its click") {
    val out = AsofJoin.clickAttribution(spark, Sf)
    val ev = graft.sources.Tables.events(spark, Sf)
      .select($"event_id", $"ts_ns").as[(Long, Long)].collect().toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(2)).foreach { r =>
      val (clickTs, viewTs) = (ev(r.getLong(0)), ev(r.getLong(2)))
      assert(viewTs <= clickTs, s"view ${r.getLong(2)} after click ${r.getLong(0)}")
    }
  }

  test("asofNearest: |delta| wins either direction, ties backward then smallest id") {
    val left = Seq(
      (1L, 100L, 10L), // views at 97 (d=-3) and 102 (d=+2): forward wins
      (1L, 200L, 11L), // views at 195 (d=-5) and 205 (d=+5): TIE -> backward
      (1L, 97L, 12L),  // view exactly AT 97: d=0 backward
      (2L, 50L, 13L),  // keyless-views user: NULL match survives
      (3L, 70L, 14L))  // two views BOTH at 70: smallest view_id wins
      .toDF("user_id", "t", "click_id")
    val right = Seq(
      (1L, 97L, 901L), (1L, 102L, 902L), (1L, 195L, 903L), (1L, 205L, 904L),
      (3L, 70L, 950L), (3L, 70L, 940L))
      .toDF("user_id", "t", "view_id")
    val out = graft.operators.AsofJoin
      .asofNearest(left, right, "user_id", "t", "view_id", Seq("view_id"))
      .collect()
      .map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4),
         if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(out(10L) == ((902L, 102L)), s"forward at |2| beats backward |3|: $out")
    assert(out(11L) == ((903L, 195L)), "equidistant tie resolves backward")
    assert(out(12L) == ((901L, 97L)), "an equal-time right row matches backward at d=0")
    assert(out(13L) == ((-1L, -1L)), "no right rows for the key -> NULL, row kept")
    assert(out(14L) == ((940L, 70L)), "equal-time right ties break to the smallest id")
  }
}
