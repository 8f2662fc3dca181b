package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming EXACT top-k per group on transformWithState's MapState —
  * the per-entry state variable the API added over
  * flatMapGroupsWithState's single-blob state: each (user → count)
  * entry is its own RocksDB key, so one event touches ONE entry
  * instead of rewriting the whole per-group map (the blob rewrite is
  * what makes a high-cardinality counter on the old API unusable).
  * Counts are exact; the Misra-Gries sketch variant for UNBOUNDED key
  * spaces is [[graft.streaming]]'s heavy-hitters udaf — this operator
  * is for dimension-bounded spaces (users-per-type here) where
  * exactness matters more than a fixed-size summary.
  *
  * Emission: every micro-batch that touches a group emits that group's
  * CURRENT top-k tagged with a monotone per-group `seq` — a changelog
  * of snapshots (Append mode cannot retract); readers take the max seq
  * per group. Ranks order by (count DESC, user_id) — deterministic
  * under shuffle order.
  *
  * Session requirement: the RocksDB state store provider
  * (cf. [[StreamingDedupTws]]).
  */
object StreamingTopK {

  case class TypedEvent(event_type: String, ts: Timestamp, user_id: Long)
  case class TopKRow(event_type: String, seq: Long, rank: Int,
                     user_id: Long, cnt: Long)

  class TopKProcessor(k: Int)
    extends StatefulProcessor[String, TypedEvent, TopKRow] {

    @transient private var counts: org.apache.spark.sql.streaming.MapState[Long, Long] = _
    @transient private var seq: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[Long, Long]("counts",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
                                 timerValues: TimerValues): Iterator[TopKRow] = {
      var touched = false
      rows.foreach { e =>
        touched = true
        val cur = if (counts.containsKey(e.user_id)) counts.getValue(e.user_id) else 0L
        counts.updateValue(e.user_id, cur + 1L)
      }
      if (!touched) Iterator.empty
      else {
        val s = (if (seq.exists()) seq.get() else 0L) + 1L
        seq.update(s)
        val top = counts.iterator().map(p => (p._1, p._2)).toArray
          .sortBy { case (u, c) => (-c, u) }
          .take(k)
        top.iterator.zipWithIndex.map { case ((u, c), i) =>
          TopKRow(key, s, i + 1, u, c)
        }
      }
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[TopKRow] =
      Iterator.empty
  }

  def topUsers(events: DataFrame, k: Int = 3): Dataset[TopKRow] = {
    require(k > 0, s"k must be positive, got $k")
    import events.sparkSession.implicits._
    events.select(col("event_type"), col("ts"), col("user_id")).as[TypedEvent]
      .groupByKey(_.event_type)
      .transformWithState(new TopKProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
