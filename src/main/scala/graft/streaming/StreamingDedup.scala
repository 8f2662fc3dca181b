package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-seen dedup with bounded state: emits only the first
  * occurrence of each key (e.g. a content hash) and keeps one small
  * state entry per key, reclaimed by EVENT-time timeout once the
  * watermark passes the key's first occurrence + TTL — the
  * flatMapGroupsWithState shape a 100 TB ingest dedup needs (unbounded
  * seen-sets OOM; the timeout bounds state to the chosen horizon, the
  * same trade Spark's own dropDuplicatesWithinWatermark makes).
  * Event-time — not processing-time — timeout keeps the operator
  * deterministic AND keeps the micro-batch engine from scheduling
  * empty wall-clock batches just to fire timers.
  */
object StreamingDedup {

  case class Seen(firstTs: Timestamp)
  case class Doc(key: String, ts: Timestamp, payload: String)

  /** @param stateTtl how long a key is remembered (also the lateness
    *                 bound: docs later than this are dropped by the
    *                 watermark), e.g. "1 hour" */
  def firstSeen(events: DataFrame, stateTtl: String = "1 hour"): Dataset[Doc] = {
    import events.sparkSession.implicits._
    events.select(col("key"), col("ts"), col("payload")).as[Doc]
      .withWatermark("ts", stateTtl)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Seen, Doc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, docs: Iterator[Doc], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // key already emitted within the TTL horizon
          } else if (docs.hasNext) {
            // The per-key batch iterator arrives in arbitrary shuffle
            // order — take the earliest by event time, not docs.next(),
            // with the payload as tiebreak so equal-timestamp docs pick
            // the same winner on every run.
            val first = docs.minBy(d => (d.ts.getTime, d.payload))
            state.update(Seen(first.ts))
            state.setTimeoutTimestamp(first.ts.getTime, stateTtl)
            Iterator.single(first)
          } else Iterator.empty
      }
  }
}
