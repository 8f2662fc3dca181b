package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Warehouse

class WarehouseSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("fk coverage: orphans counted per type, coverage floor-rounded") {
    val facts = Seq(
      (1L, "click"), (2L, "click"), (99L, "click"), // 99 unmatched
      (1L, "view"))
      .toDF("user_id", "event_type")
    val dim = Seq(1L, 2L, 3L).toDF("key")
    val out = Warehouse.fkCoverageOf(facts, dim).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("click") == ((3L, 2L, 1L, 0.6667)))
    assert(out("view") == ((1L, 1L, 0L, 1.0)))
  }

  test("fk coverage: duplicate dimension keys do not inflate match counts") {
    val facts = Seq((1L, "click")).toDF("user_id", "event_type")
    val dim = Seq(1L, 1L, 1L).toDF("key") // dirty dim with dup keys
    val out = Warehouse.fkCoverageOf(facts, dim).collect().head
    assert(out.getLong(1) == 1L && out.getLong(2) == 1L)
  }

  test("driver data upholds the latest_per_key oracle's µs-grain assumption") {
    // The Spark operator orders versions on exact ts_ns; the DuckDB
    // oracle can only see microseconds and falls back to event_id.
    // They agree iff, within every (user, microsecond), event ids are
    // ordered like the nanoseconds. Audit that invariant on the real
    // test tables so a regenerated dataset that breaks it fails HERE
    // instead of silently desyncing the correctness gate.
    import org.apache.spark.sql.expressions.Window
    val dirs = Seq(Sf, "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/events.parquet").exists())
    assert(dirs.nonEmpty, "no events fixture present at all")
    for (dir <- dirs) {
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id"))
        .withColumn("us", expr("ts_ns div 1000"))
      val w = Window.partitionBy("user_id", "us").orderBy(col("event_id"))
      val inversions = ev
        .withColumn("prev_ns", lag("ts_ns", 1).over(w))
        .filter(col("prev_ns").isNotNull && col("prev_ns") > col("ts_ns"))
        .count()
      assert(inversions == 0L,
        s"$dir has same-µs events with ids not in ns order — the " +
          "latest_per_key oracle (µs grain) would diverge from the ns-exact operator")
    }
  }

  test("latest per key: full-ns time order first, event_id only on exact ties") {
    val ev = Seq(
      (10L, 1L, "view", 1.0, 1000000000L),
      (11L, 1L, "click", 2.0, 1000000000L),    // identical ns → higher id wins
      (13L, 2L, "purchase", 4.0, 2000000200L), // higher id but 300 ns EARLIER
      (12L, 2L, "view", 3.0, 2000000500L))     // sub-µs newer must win
      .toDF("event_id", "user_id", "event_type", "value", "ts_ns")
    val out = Warehouse.latestPerKeyOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 11L, "click"), (2L, 12L, "view")),
      "a same-microsecond pair must order on exact nanoseconds, not on id")
  }
}
