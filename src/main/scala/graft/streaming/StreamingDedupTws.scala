package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import StreamingDedup.Doc

/** First-seen dedup on the transformWithState API (Spark 4's
  * arbitrary-state operator — the successor to
  * [[StreamingDedup.firstSeen]]'s flatMapGroupsWithState): the SAME
  * emit-earliest-once contract, re-expressed with a typed ValueState
  * plus an explicit EVENT-time timer that clears the key's state once
  * the watermark passes first-seen + TTL. What the new API buys at
  * scale: state lives in the RocksDB store with per-state-variable
  * schemas (no single opaque case-class blob), timers are first-class
  * (no GroupStateTimeout plumbing through the emit path), and state
  * variables can carry native TTLConfig — the timer here is explicit
  * only because eviction must align with the WATERMARK, not
  * wall-clock.
  *
  * Session requirement (documented like nanosAsLong in [[graft.Sessions]]):
  * transformWithState only runs on the RocksDB state store —
  * `spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
  * must be set on the session (the StreamingSpec does this per-query).
  */
object StreamingDedupTws {

  /** Per-key processor: remember the first-seen event time, emit only
    * that first document, clear state when the event-time timer fires. */
  class FirstSeenProcessor(ttlMs: Long)
    extends StatefulProcessor[String, Doc, Doc] {

    @transient private var seenTs: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seenTs = getHandle.getValueState[Long]("seen_ts", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Doc],
                                 timerValues: TimerValues): Iterator[Doc] = {
      if (seenTs.exists()) Iterator.empty // already emitted within TTL
      else if (rows.hasNext) {
        // shuffle order is arbitrary — earliest event time wins, with
        // the payload tiebreak (StreamingDedup's exact contract)
        val first = rows.minBy(d => (d.ts.getTime, d.payload))
        seenTs.update(first.ts.getTime)
        getHandle.registerTimer(first.ts.getTime + ttlMs)
        Iterator.single(first)
      } else Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Doc] = {
      seenTs.clear()
      Iterator.empty
    }
  }

  /** @param stateTtl how long a key is remembered; also the watermark
    *                 lateness bound (cf. [[StreamingDedup.firstSeen]]) */
  def firstSeen(events: DataFrame, stateTtl: String = "1 hour"): Dataset[Doc] = {
    import events.sparkSession.implicits._
    val ttlMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(stateTtl))
    val ms = org.apache.spark.sql.catalyst.util.IntervalUtils.getDuration(
      ttlMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    events.select(col("key"), col("ts"), col("payload")).as[Doc]
      .withWatermark("ts", stateTtl)
      .groupByKey(_.key)
      .transformWithState(new FirstSeenProcessor(ms),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
