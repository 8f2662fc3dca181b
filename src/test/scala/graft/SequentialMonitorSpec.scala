package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SequentialMonitor

/** The shared sequential-monitor contract, tested ONCE so the four
  * monitors riding it (SPRT, Page–Hinkley, CUSUM, TOST) and any
  * future one inherit a verified latch, fold order, and timeout
  * anchor rather than re-deriving them (the class of bug StreamingSpec
  * caught when a day-close timeout was anchored on the watermark). */
class SequentialMonitorSpec extends AnyFunSuite {

  private case class Ob(t: Long, id: Long, v: Long)
  private case class St(n: Long, sum: Long, latched: Boolean)

  private def step(s: St, o: Ob): (St, Option[String]) = {
    val nxt = St(s.n + 1, s.sum + o.v, s.latched)
    if (nxt.sum >= 10L) (nxt.copy(latched = true), Some(s"fired at n=${nxt.n}"))
    else (nxt, None)
  }

  test("ordered: (event-time, tiebreak) order, whatever the arrival order") {
    val obs = Seq(Ob(5, 2, 1), Ob(1, 9, 2), Ob(5, 1, 3), Ob(3, 0, 4))
    val sorted = SequentialMonitor.ordered(obs.iterator)(o => (o.t, o.id))
    assert(sorted.map(_.v).toSeq == Seq(2, 4, 3, 1))
    // permutation-invariant: any arrival order folds identically
    obs.permutations.take(8).foreach { p =>
      assert(SequentialMonitor.ordered(p.iterator)(o => (o.t, o.id))
        .toSeq == sorted.toSeq)
    }
  }

  test("latchedFold: emits once, goes quiet, and is arrival-order invariant") {
    // sums 4,4,4,... latch crosses 10 at the third observation
    val obs = Seq(Ob(1, 1, 4), Ob(2, 1, 4), Ob(3, 1, 4), Ob(4, 1, 4))
    val (st, out) = SequentialMonitor.latchedFold(
      obs.iterator, St(0, 0, false))(o => (o.t, o.id))(_.latched)(step)
    assert(out == Vector("fired at n=3"))
    assert(st == St(3, 12, true),
      "post-latch observations must not mutate the decided statistic")
    // a later batch starting from the latched state emits nothing
    val (st2, out2) = SequentialMonitor.latchedFold(
      Seq(Ob(9, 1, 99)).iterator, st)(o => (o.t, o.id))(_.latched)(step)
    assert(out2.isEmpty && st2 == st)
    // arrival-order invariance within the batch
    obs.permutations.take(12).foreach { p =>
      val (s, o) = SequentialMonitor.latchedFold(
        p.iterator, St(0, 0, false))(o => (o.t, o.id))(_.latched)(step)
      assert((s, o) == ((st, out)))
    }
  }

  test("latchedFold emits in fold order when multiple rows fire pre-latch steps") {
    // a step that emits per observation without latching: order check
    val obs = Seq(Ob(2, 1, 20), Ob(1, 1, 10))
    val (_, out) = SequentialMonitor.latchedFold(
      obs.iterator, St(0, 0, false))(o => (o.t, o.id))(_ => false) {
      (s, o) => (s.copy(n = s.n + 1), Some(s"v=${o.v}"))
    }
    assert(out == Vector("v=10", "v=20"))
  }

  test("dayCloseTs anchors on the open day's own end, not the watermark") {
    val dayMs = 86400000L
    assert(SequentialMonitor.dayCloseTs(0L) == dayMs - 1L)
    assert(SequentialMonitor.dayCloseTs(20_000L) == 20_001L * dayMs - 1L)
    // the close instant still belongs to the open day
    assert(SequentialMonitor.dayCloseTs(7L) / dayMs == 7L)
    // and is strictly before the next day's first event
    assert(SequentialMonitor.dayCloseTs(7L) < 8L * dayMs)
  }
}
