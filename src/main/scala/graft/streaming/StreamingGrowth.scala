package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming audience-growth gauge — the live twin of the batch
  * `user_growth` curve (SURVEY row 293): new (first-ever-seen) users
  * per event day, closed by the watermark, from which the consumer's
  * running total IS the cumulative distinct-user count.
  *
  * State honesty: exact cumulative distinct REQUIRES remembering every
  * user ever seen — the per-user boolean here is the SAME asymptotic
  * state the batch min-aggregate pays, and it deliberately has NO TTL
  * (first-seen is an unbounded-horizon fact; expiring it would
  * re-count returning users). The fixed-size alternative at 100 TB is
  * the windowed HLL reach gauge (SURVEY row 68) — reach, not growth.
  * The watermark bounds only the DAY close (the windowed count),
  * never the user memory.
  *
  * Ordering contract: within a micro-batch, the earliest event wins
  * (shuffle-order-independent minBy). ACROSS batches, a user's first
  * emission is final — an earlier-timestamped event arriving in a
  * LATER batch cannot retract the append-mode emission, so per-user
  * cross-batch disorder attributes the user to the first-arrived
  * batch's earliest day. The batch twin computes the exact min; the
  * divergence window is bounded by the source's per-user disorder
  * (measured offline by `disorder_audit`, row 243), and the
  * StreamingSpec pins both halves of this contract.
  */
object StreamingGrowth {

  case class Ev(user_id: Long, ts: Timestamp)
  case class DayNew(day: java.sql.Date, n_new_users: Long)

  /** First-ever event per user, as an append stream (the stateful
    * front half — exposed for tests). */
  def firstSeenUsers(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Boolean, Ev](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, evs: Iterator[Ev], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else if (evs.hasNext) {
            // arbitrary shuffle order → earliest by (ts, user) wins
            val first = evs.minBy(e => e.ts.getTime)
            state.update(true)
            Iterator.single(first)
          } else Iterator.empty
      }
  }

  /** New users per day, emitted when the watermark closes the day.
    * @param lateness watermark delay on event time — bounds how late a
    *                 FIRST event may arrive and still land in its day */
  def newUsersPerDay(events: DataFrame,
                     lateness: String = "1 day"): DataFrame = {
    import events.sparkSession.implicits._
    firstSeenUsers(events)
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_new_users"))
      .select(col("window.start").cast("date").as("day"),
        col("n_new_users"))
  }
}
