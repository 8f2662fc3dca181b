package graft.streaming

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Croston demand-rate monitor: the stateful twin of the
  * batch `EventAnalytics.crostonBacktestOf` FOLD (SURVEY row 369) —
  * per item, the z/p intermittent-demand recursion updated as demand
  * days CLOSE, emitting the refreshed flat rate after every demand
  * day. The live replenishment signal a spare-parts planner reads,
  * where the batch twin backtests it nightly.
  *
  * Identical integer contract: demand sizes on the milli grid, both
  * SES updates arithmetic right shifts (z′ = (y+z)»1,
  * p′ = (gap·1000+p)»1), the seed p = (first-demand epoch-day offset
  * is NOT available on a stream, so the seed interval is 1000 — one
  * day — the one DOCUMENTED divergence: a stream has no "series
  * start" to measure the first interval from; after two updates the
  * halving has washed the seed to < 25% weight). Rate =
  * (z·1000) div p milli-units/day.
  *
  * A demand day closes exactly like [[StreamingCusum]]'s days: a
  * later-day purchase for the item arrives, or the event-time
  * timeout fires one watermark past the open day's end. State per
  * item is constant-size (open day partial + z/p/last) forever.
  */
object StreamingCroston {

  case class Ev(item: Long, ts: Timestamp)

  case class St(openDay: Long, openCount: Long,
                z: Long, p: Long, last: Long, first: Boolean)

  case class Rate(item: Long, day: Date, n_demand: Long, z_m: Long,
                  p_m: Long, rate_mpd: Long)

  private val DayMs = 86400000L

  /** `events` needs (event_type, ts, props); only purchases count. */
  def rates(events: DataFrame): Dataset[Rate] = {
    import events.sparkSession.implicits._
    val dayMs = DayMs

    def close(st: St, nDemandSoFar: Long): (St, Rate) = {
      val ym = st.openCount * 1000L
      val st2 =
        if (st.first) St(-1L, 0L, ym, 1000L, st.openDay, first = false)
        else {
          val z2 = (ym + st.z) >> 1
          val p2 = ((st.openDay - st.last) * 1000L + st.p) >> 1
          St(-1L, 0L, z2, p2, st.openDay, first = false)
        }
      val rate = (st2.z * 1000L) / st2.p
      (st2, Rate(0L, new Date(st.openDay * dayMs), nDemandSoFar,
        st2.z, st2.p, rate))
    }

    events.filter(col("event_type") === "purchase")
      .select(
        coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(0L))
          .as("item"),
        col("ts"))
      .as[Ev]
      .withWatermark("ts", "1 day")
      .groupByKey(_.item)
      .flatMapGroupsWithState[(St, Long), Rate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (item, evs: Iterator[Ev], state: GroupState[(St, Long)]) =>
          if (state.hasTimedOut) {
            val (st, nd) = state.get
            if (st.openDay >= 0L) {
              val (nxt, rate) = close(st, nd + 1L)
              state.update((nxt, nd + 1L))
              Iterator.single(rate.copy(item = item))
            } else Iterator.empty
          } else {
            val days = evs.map(e => Math.floorDiv(e.ts.getTime, dayMs))
              .toArray.sorted
            var (cur, nd) = state.getOption
              .getOrElse((St(-1L, 0L, 0L, 1000L, -1L, first = true), 0L))
            val out = Vector.newBuilder[Rate]
            days.foreach { d =>
              if (cur.openDay == -1L) cur = cur.copy(openDay = d, openCount = 1L)
              else if (d == cur.openDay)
                cur = cur.copy(openCount = cur.openCount + 1L)
              else if (d > cur.openDay) {
                nd += 1L
                val (nxt, rate) = close(cur, nd)
                out += rate.copy(item = item)
                cur = nxt.copy(openDay = d, openCount = 1L)
              } else
                // late below the open day: fold into the open day —
                // the watermark guarantees no CLOSED day is reachable
                cur = cur.copy(openCount = cur.openCount + 1L)
            }
            state.update((cur, nd))
            if (cur.openDay >= 0L)
              state.setTimeoutTimestamp((cur.openDay + 1L) * dayMs - 1L, "1 day")
            out.result().iterator
          }
      }
  }
}
