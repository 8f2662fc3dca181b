package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, EventAnalytics, Graph, Robust, TextAnalysis}

/** Adversarial edge-case audit of the round-14 operator tranche — the
  * pass that caught int-width/regex/short-span bugs in every earlier
  * tranche. Each case pins either a hand-computed exact value on a
  * fixture chosen to stress the argued-but-untested property
  * (bipartite +I guard, max-normalization induction, minEvidence
  * boundary, tie-heavy series) or the DOCUMENTED degradation on
  * degenerate input (empty frames, NULL readouts) — never an
  * exception. */
class TrancheAuditSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Each (user, items…) walks its items in order, one event/second. */
  private def walks(users: (Long, Seq[Long])*): DataFrame =
    users.flatMap { case (u, items) =>
      items.zipWithIndex.map { case (k, i) => (u, i, k) }
    }.zipWithIndex.map { case ((u, i, k), id) =>
      (id.toLong, u, f"2024-01-01 00:00:$i%02d", s"""{"k": $k}""")
    }.toDF("event_id", "user_id", "s", "props")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("s")).as("ts"), col("props"))

  private def valued(rows: (String, String, Double)*): DataFrame =
    rows.zipWithIndex.map { case ((et, t, v), i) =>
      (i.toLong, i.toLong, et, t, v)
    }.toDF("event_id", "user_id", "event_type", "t", "value")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("t")).as("ts"), col("value"))

  // ---- eigenvector centrality: the +I bipartite guard and the
  // ---- global-max normalization, property-tested on the exact
  // ---- fixtures the scaladoc argues about

  /** Three users each walk leaf→center: a 3-leaf star, unit weights. */
  private def starEvents = walks(1L -> Seq(1L, 0L), 2L -> Seq(2L, 0L),
    3L -> Seq(3L, 0L))

  test("eigenvector: a star converges to the sqrt(3) ratio instead of oscillating") {
    // A star is bipartite: raw power iteration flips between
    // center-heavy and leaf-heavy states with period 2. With the +I
    // shift the dominant eigenvalue of A+I is 1+sqrt(3) and the
    // leaf/center ratio converges to 1/sqrt(3) = 0.577350…
    val out = Graph.eigenvectorCentralityOf(starEvents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 1000000L, s"argmax holds exactly 1e6: $out")
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      s"symmetric leaves must tie exactly: $out")
    assert(out(1L) >= 577340L && out(1L) <= 577360L,
      s"leaves at 1e6/sqrt(3) = 577350 within the integer dither: $out")
    // no period-2 oscillation: one more iteration moves nothing more
    // than the +-2 ppm integer dither (unguarded iteration would swing
    // leaves by ~1e5 between consecutive iterations)
    val out13 = Graph.eigenvectorCentralityOf(starEvents, iterations = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (item, rq) =>
      assert(math.abs(rq - out13(item)) <= 2L,
        s"item $item: $rq vs ${out13(item)} — oscillation survived the +I guard")
    }
  }

  test("eigenvector: a disconnected minor component decays under the GLOBAL max") {
    // star (dominant, lambda = 1+sqrt(3)) + a separate 2-node edge
    // (lambda = 2): the pair's mass shrinks by ~2/2.732 per iteration
    // and reads ~17e3 ppm after 12 — decayed scores, not missing rows.
    val ev = walks(1L -> Seq(1L, 0L), 2L -> Seq(2L, 0L), 3L -> Seq(3L, 0L),
      4L -> Seq(10L, 11L))
    val out = Graph.eigenvectorCentralityOf(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 10L, 11L),
      s"minor-component nodes must still report: $out")
    assert(out(0L) == 1000000L, "the global argmax is the star center")
    assert(out(1L) >= 577340L && out(1L) <= 577360L,
      s"the dominant component is unperturbed by the minor one: $out")
    assert(out(10L) == out(11L), s"symmetric pair must tie: $out")
    assert(out(10L) > 0L && out(10L) < 60000L,
      s"pair must decay well below the leaves, not vanish: $out")
  }

  test("eigenvector: determinism across runs on the mixed fixture") {
    val ev = walks(1L -> Seq(1L, 0L, 2L, 0L), 4L -> Seq(10L, 11L, 10L))
    val a = Graph.eigenvectorCentralityOf(ev).collect().toSeq
    val b = Graph.eigenvectorCentralityOf(ev).collect().toSeq
    assert(a == b)
  }

  // ---- hub ablation: k >= the whole node set, and the star readout

  test("hub ablation: k beyond the node count removes everything; NULL giant, no crash") {
    val out = Graph.hubAblationOf(walks(1L -> Seq(1L, 2L)), k = 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 2L,
      s"n_nodes=2, both removed, giant_before=2: $r")
    assert(r.isNullAt(3) && r.isNullAt(4),
      s"empty survivor graph reads NULL giant_after/retained_ppm: $r")
  }

  test("hub ablation: removing a star's center shatters the giant to singletons") {
    val out = Graph.hubAblationOf(starEvents, k = 1).collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 1L)
    assert(out.getLong(2) == 4L, "giant before = the whole star")
    assert(out.getLong(3) == 1L, "after: three isolated leaves, giant = 1")
    assert(out.getLong(4) == 250000L, s"retained_ppm = 1e6/4: $out")
  }

  // ---- PRF retrieval: empty feedback set, all-banned expansion,
  // ---- and the vocabulary-mismatch fix actually firing

  test("prf: a corpus with zero query matches returns the empty ranking, no crash") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    assert(CorpusStats.prfSearchOf(docs).isEmpty)
  }

  test("prf: feedback docs with only stopword/query tokens expand nothing and degrade to pass-1") {
    val docs = Seq((1L, "spark merge window the and"), (2L, "unrelated body here"))
      .toDF("doc_id", "text")
    val out = CorpusStats.prfSearchOf(docs).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L),
      s"no expansion terms exist; only the query-matching doc ranks: $out")
  }

  test("prf: the expansion term retrieves a doc the raw query cannot") {
    val docs = Seq(
      (1L, "spark merge catalyst planner"),
      (2L, "catalyst tungsten codegen"), // no query term at all
      (3L, "completely different words")).toDF("doc_id", "text")
    val got = CorpusStats.prfSearchOf(docs).collect().map(_.getLong(0)).toSet
    assert(got.contains(2L),
      s"doc 2 is reachable only through the mined expansion term: $got")
    assert(!got.contains(3L), s"doc 3 shares no term with the expanded query: $got")
  }

  // ---- Wasserstein drift: hand-computed mass, one-sided drop, zero case

  test("wasserstein: W1({1,2},{2,3}) = 1.0 exactly; one-sided types drop; identical = 0") {
    val ev = valued(
      ("click", "2024-01-10 10:00:00", 1.0), ("click", "2024-01-10 11:00:00", 2.0),
      ("click", "2024-01-20 10:00:00", 2.0), ("click", "2024-01-20 11:00:00", 3.0),
      ("view", "2024-01-10 10:00:00", 5.0), // period A only → dropped
      ("buy", "2024-01-10 10:00:00", 7.0), ("buy", "2024-01-20 10:00:00", 7.0))
    val out = Robust.wassersteinDriftOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set("click", "buy"),
      s"a type with an empty side has no drift to price: $out")
    assert(out("click") == ((2L, 2L, 1.0)), s"unit shift of every point: $out")
    assert(out("buy") == ((1L, 1L, 0.0)), s"identical distributions: $out")
  }

  // ---- Pettitt: hand-computed level shift, tie-heavy, single-day

  test("pettitt: a clean level shift lands K=16 at the boundary day, below significance") {
    // 1 event/day Jan 1-4, 3/day Jan 5-8: U_t = -4(t+1) for t<=3 then
    // -4(7-t); K = 16 at t = 3. 6K² = 1536 < 3.68888·(8³+8²) = 2124.8.
    val rows = (1 to 4).map(d => ("click", f"2024-01-0$d%d 10:00:00", 1.0)) ++
      (5 to 8).flatMap(d => (0 until 3).map(h =>
        ("click", f"2024-01-0$d%d 1$h%d:00:00", 1.0)))
    val out = EventAnalytics.pettittChangepointOf(valued(rows: _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 8L && r.getLong(2) == 16L && r.getLong(3) == 3L,
      s"t_days=8, K=16, change at idx 3: $r")
    assert(r.getDate(4).toString == "2024-01-04", s"boundary day: $r")
    assert(!r.getBoolean(5), s"K=16 on T=8 is not significant: $r")
  }

  test("pettitt: an all-tied series reads K=0 at the earliest boundary, not significant") {
    val rows = (1 to 5).map(d => ("click", f"2024-01-0$d%d 10:00:00", 1.0))
    val r = EventAnalytics.pettittChangepointOf(valued(rows: _*)).collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L && !r.getBoolean(5),
      s"ties everywhere → zero statistic, earliest argmax: $r")
  }

  test("pettitt: a single-day corpus has no boundary to test — empty output, no crash") {
    val ev = valued(("click", "2024-01-05 10:00:00", 1.0),
      ("click", "2024-01-05 11:00:00", 2.0))
    assert(EventAnalytics.pettittChangepointOf(ev).isEmpty)
  }

  // ---- runs test: tie-heavy series, n=2, and a hand-computed z

  test("runs test: a series entirely AT its median drops every sign — no row, no crash") {
    val rows = (1 to 3).map(d => ("click", f"2024-01-0$d%d 10:00:00", 5.0))
    assert(Robust.runsTestOf(valued(rows: _*)).isEmpty)
  }

  test("runs test: a 2-day series nulls z (zero variance), never divides") {
    val ev = valued(("click", "2024-01-01 10:00:00", 1.0),
      ("click", "2024-01-02 10:00:00", 2.0))
    val r = Robust.runsTestOf(ev).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L && r.getLong(3) == 1L,
      s"one sign above the lower median, the median day drops: $r")
    assert(r.isNullAt(4) && r.isNullAt(5),
      s"z and the verdict must be NULL on a degenerate series: $r")
  }

  test("runs test: hand-computed z on a 6-day series with a median tie dropped") {
    // daily totals 1,3,2,3,1,3 → lower median 2 (dropped); signs
    // -,+,+,-,+ → runs 4, n+=3, n-=2, E=3.4, Var=0.84,
    // z = 0.6/sqrt(0.84) = 0.654654… → 0.6547 on the 1e-4 grid.
    val vals = Seq(1.0, 3.0, 2.0, 3.0, 1.0, 3.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("click", f"2024-01-0${i + 1}%d 10:00:00", v)
    }
    val r = Robust.runsTestOf(valued(rows: _*)).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L && r.getLong(3) == 4L,
      s"n_pos/n_neg/runs: $r")
    assert(math.abs(r.getDouble(4) - 0.6547) < 1e-9, s"z: $r")
    assert(!r.getBoolean(5))
  }

  // ---- code-switch: the minEvidence boundary and the unmatched source

  test("code-switch: total-best == minEvidence is mixed; one foreign word is not") {
    val docs = Seq(
      ("a", "the of und"),      // en 2, de 1 → diff 1 < 2: pure enough
      ("a", "the of und die"),  // en 2, de 2 → diff 2 = minEvidence: mixed
      ("b", "zzz qqq"))         // no profile word at all
      .toDF("source", "text")
    val out = TextAnalysis.codeSwitchOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 2L && a.getLong(2) == 2L && a.getLong(3) == 1L,
      s"both matched, exactly the boundary doc is mixed: $a")
    assert(a.getLong(4) == 500000L, s"mixed share 1/2: $a")
    // purities: 2e6 div 3 = 666666 and 2e6 div 4 = 500000 → mean 583333
    assert(a.getLong(5) == 583333L, s"mean purity: $a")
    val b = out("b")
    assert(b.getLong(1) == 1L && b.getLong(2) == 0L && b.getLong(3) == 0L)
    assert(b.isNullAt(4) && b.isNullAt(5),
      s"an unmatched source reads NULL shares, never a 0-division: $b")
  }

  // ---- Mann-Kendall (plain + seasonal): degenerate series

  test("mann-kendall: a fully-tied series nulls z; a 1-day type drops its row") {
    val rows = (1 to 5).map(d => ("click", f"2024-01-0$d%d 10:00:00", 2.0)) :+
      (("view", "2024-01-03 10:00:00", 9.0)) // single day → no pair
    val out = Robust.mannKendallOf(valued(rows: _*)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("click"),
      s"a 1-day series has no pair — the type drops, it doesn't NULL: $out")
    val c = out("click")
    assert(c.getLong(2) == 0L && c.isNullAt(3) && c.isNullAt(4),
      s"fully tied → S=0, variance 0, NULL z and verdict: $c")
  }

  test("seasonal mann-kendall: a one-week series has no same-weekday pair — row drops") {
    val rows = (1 to 7).map(d => ("click", f"2024-01-0$d%d 10:00:00", d.toDouble))
    assert(Robust.seasonalMkOf(valued(rows: _*)).isEmpty,
      "7 distinct weekdays, 1 day each: zero within-stratum pairs")
    // two weeks of a strictly rising series: every stratum has its
    // pair and the trend reads through the weekly cycle
    val rows2 = (1 to 14).map(d => ("click", f"2024-01-$d%02d 10:00:00", d.toDouble))
    val r = Robust.seasonalMkOf(valued(rows2: _*)).collect().head
    assert(r.getLong(1) == 14L && r.getLong(2) == 7L && r.getLong(3) == 7L,
      s"T=14, 7 strata, S = 7 concordant pairs: $r")
  }

  // ---- SBC demand classes: the single-demand-day CV²=0 convention

  test("demand classes: single-demand-day and constant-size items read CV²=0 and class by ADI") {
    val ev = Seq(
      (1L, 1L, "purchase", "2024-01-01 10:00:00", """{"k": 1}"""),
      (2L, 2L, "purchase", "2024-01-01 11:00:00", """{"k": 1}"""),
      (3L, 3L, "purchase", "2024-01-01 10:00:00", """{"k": 2}"""),
      (4L, 4L, "purchase", "2024-01-08 10:00:00", """{"k": 2}"""))
      .toDF("event_id", "user_id", "event_type", "t", "props")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("t")).as("ts"), col("props"))
    val out = EventAnalytics.demandClassesOf(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    // span Jan 1..8 → T=8; item 1: nd=1, ADI=8 ≥ 4/3 → intermittent,
    // var = 1·4-4 = 0; item 2: nd=2 equal sizes → var = 2·2-4 = 0.
    assert(out(1L) == ((8L, 1L, 8000000L, 0L, "intermittent")), s"$out")
    assert(out(2L) == ((8L, 2L, 4000000L, 0L, "intermittent")), s"$out")
  }
}
