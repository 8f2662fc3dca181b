package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Corpus, Dedup, EventAnalytics, Warehouse}

/** Degenerate-input audit for the round-8 tranche: empty corpora,
  * budgets that nothing can absorb, single-observation series — the
  * inputs a production pipeline feeds an operator the first day a
  * source is onboarded or a filter upstream removes everything. Each
  * case pins the DOCUMENTED degradation (zeros, NULLs, full funding),
  * never an exception or a silently-dropped report row. */
class EdgeCasesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def eventsDf(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex.map { case ((u, et, t), i) => (i.toLong, u, et, t) }
      .toDF("event_id", "user_id", "event_type", "t")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("t")).as("ts"), lit(1.0).as("value"))

  test("dedup cascade: an empty corpus still emits the 3-row zero funnel") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.dedupCascadeOf(empty).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keySet == Set("1_exact", "2_jaccard", "3_total"),
      s"funnel must keep its shape on empty input, got ${out.keySet}")
    out.foreach { case (stage, counts) =>
      assert(counts == ((0L, 0L, 0L)), s"$stage: expected zeros, got $counts")
    }
  }

  test("dedup cascade: a corpus with no duplicates passes through unreduced") {
    val unique = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "completely different words here now")).toDF("doc_id", "text")
    val out = Dedup.dedupCascadeOf(unique).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("3_total") == ((3L, 0L, 3L)), s"got $out")
  }

  test("waterfill: budget above the whole corpus fully funds everyone, surplus reported") {
    val docs = Seq(
      (1L, "a b c", "s1"),        // 3 tokens
      (2L, "d e", "s2"),          // 2 tokens
      (3L, "f g h i", "s3"))      // 4 tokens
      .toDF("doc_id", "text", "source")
    val out = Corpus.waterfillBudgetOf(docs, budget = 100L).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} must be fully funded")
      assert(r.getLong(2) == r.getLong(1), "alloc == capacity when short")
      assert(r.getDouble(4) == 1.0, "sample_frac 1.0 when fully funded")
      assert(r.getLong(5) == 100L - 9L, "surplus = budget - total corpus")
    }
  }

  test("waterfill: budget below every capacity spreads the equal water level") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" "), "s1"), // 10 tokens
      (2L, (1 to 12).map(i => s"w$i").mkString(" "), "s2"), // 12
      (3L, (1 to 14).map(i => s"w$i").mkString(" "), "s3")) // 14
      .toDF("doc_id", "text", "source")
    // budget 9 < 3·10: nobody is fully funded, λ = 9 div 3 = 3 each
    val out = Corpus.waterfillBudgetOf(docs, budget = 9L).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3), r.getLong(5))))
      .toMap
    assert(out.values.forall(v => v._1 == 3L && !v._2 && v._3 == 0L),
      s"expected uniform level 3, none full, no remainder: $out")
  }

  test("acf: a single-day series pins NULL at every lag (den = 0), never divides") {
    val ev = eventsDf(
      (1L, "click", "2024-01-05 10:00:00"),
      (2L, "click", "2024-01-05 11:00:00"))
    val out = EventAnalytics.acfDailyOf(ev).collect()
    assert(out.length == 7, "lags 1..7 must all report")
    out.foreach { r =>
      assert(r.getLong(2) == 1L, "n_days = 1")
      assert(r.isNullAt(3), s"lag ${r.getInt(1)}: ACF undefined must be NULL")
    }
  }

  test("acf: a type seen once inside a longer span gets the zero-filled grid") {
    val ev = eventsDf(
      (1L, "view", "2024-01-01 08:00:00"),
      (2L, "view", "2024-01-10 08:00:00"),
      (3L, "click", "2024-01-05 10:00:00")) // 1 observation, 10-day grid
    val out = EventAnalytics.acfDailyOf(ev).collect()
      .filter(_.getString(0) == "click")
    assert(out.length == 7)
    out.foreach { r =>
      assert(r.getLong(2) == 10L, "grid spans the corpus calendar")
      assert(!r.isNullAt(3), "zero-days make the variance positive → defined")
    }
  }

  test("windowed funnel: no purchases → zero rows at the step, funnel intact") {
    val ev = eventsDf(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:30:00"))
    val out = Behavior.funnelWindowedOf(ev).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 1L, "click" -> 1L, "purchase" -> 0L), s"got $out")
  }

  test("windowed funnel: empty input keeps the 3-step report with 0.0 conv") {
    val ev = eventsDf().limit(0)
    val out = Behavior.funnelWindowedOf(ev).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("view", "click", "purchase"))
    assert(out.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("incremental rollup: a lateMod slicing out nothing merges as identity") {
    val ev = eventsDf(
      (1L, "view", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-02 10:00:00"))
    // event_ids are 0 and 1; lateMod guards require >1, and with mod 2
    // id 0 IS late — so check both a populated and an empty delta.
    val some = Warehouse.incrementalRollupOf(ev, lateMod = 2).collect()
    assert(some.map(_.getLong(3)).sum == 1L, "id 0 lands in the delta")
    val none = Warehouse.incrementalRollupOf(
      ev.withColumn("event_id", col("event_id") * 2 + 1), lateMod = 2)
      .collect()
    assert(none.map(_.getLong(3)).sum == 0L, "empty delta: n_late all zero")
    assert(none.map(r => (r.getDate(0).toString, r.getLong(1))).toSet ==
      Set(("2024-01-01", 1L), ("2024-01-02", 1L)),
      "snapshot ⊕ empty delta ≡ snapshot")
  }
}
