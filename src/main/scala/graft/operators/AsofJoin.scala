package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalable as-of join: for each left row, the most recent right row
  * with the same key and time <= the left row's time.
  *
  * Spark has no ASOF JOIN operator; the naive formulations are a range
  * join (O(n·m) per key after the equi-part) or a per-left-row
  * subquery. This one is the union-and-carry form: tag both sides,
  * union, ONE shuffle on the key, and a running `last(_, ignoreNulls)`
  * over (time, side) order carries the latest right payload forward
  * into each left row. Cost is a single sort-shuffle of left+right —
  * the only shape that survives 100 TB event streams (no range
  * explosion, no per-key quadratic pairing, skew handled by AQE like
  * any other sort).
  *
  * Right rows sort before left rows at equal time (`side` 0 < 1), so
  * a right row exactly at the left row's time matches, = the `<=` of
  * SQL ASOF JOIN semantics. Left rows with no prior right row keep
  * NULL (ASOF LEFT JOIN).
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry into each left row */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, time: String, valueCols: Seq[String]): DataFrame = {
    val reserved = Seq("__side", "__rv")
    val clashes = (left.columns ++ right.columns).filter(reserved.contains)
    require(clashes.isEmpty,
      s"asofJoin reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${clashes.distinct.mkString(", ")}")
    val leftCols = left.columns.filterNot(c => c == key || c == time)
    // Guard against EVERY left-side output name — key and time are
    // emitted too, so e.g. valueCols = Seq(time) would duplicate.
    val dupOut = valueCols.filter(c => c == key || c == time || leftCols.contains(c))
    require(dupOut.isEmpty,
      s"valueCols ${dupOut.mkString(", ")} also exist on the left side; " +
        "alias one side before joining so output column names stay unique")
    // Carry the right payload as ONE struct: every right row's struct
    // is non-null even when its fields are null, so last(ignoreNulls)
    // matches the nearest right ROW — carrying raw columns would skip
    // a matched row's genuinely-NULL value and attribute an older one.
    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val l = left
      .withColumn("__side", lit(1))
      .select((Seq(col(key), col(time), col("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(rvType).as("__rv")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((Seq(col(key), col(time), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__rv")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((Seq(col(key), col(time)) ++
        leftCols.map(col) ++
        valueCols.map(c => col("__rv").getField(c).as(c))): _*)
  }

  /** NEAREST as-of join (pandas merge_asof direction='nearest'): for
    * each left row, the right row minimizing |Δt| within the key —
    * ties (equidistant before/after, or equal right times) resolve
    * backward-then-smallest-id, so the match is deterministic. Two
    * union-and-carry passes over ONE key shuffle: the backward
    * candidate is [[asofJoin]]'s running carry; the forward candidate
    * is the same carry under (time DESC, side DESC) — a RUNNING frame
    * in reversed time, never the per-row-rescan UnboundedFollowing
    * frame (§6's window-frame rule). Both windows share the key
    * exchange (two sorts, one shuffle).
    *
    * @param tieCol  right-side column breaking equal-time ties
    *                (smallest wins); must be in `valueCols`'s struct
    * @return left rows + `asof_<time>` (matched right time, NULL when
    *         the key has no right rows) + `valueCols` */
  def asofNearest(left: DataFrame, right: DataFrame,
                  key: String, time: String, tieCol: String,
                  valueCols: Seq[String]): DataFrame = {
    require(valueCols.contains(tieCol),
      s"tieCol $tieCol must be carried in valueCols")
    val reserved = Seq("__side", "__tie", "__rv", "__b", "__f", "__n")
    val clashes = (left.columns ++ right.columns).filter(reserved.contains)
    require(clashes.isEmpty,
      s"asofNearest reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${clashes.distinct.mkString(", ")}")
    val leftCols = left.columns.filterNot(c => c == key || c == time)
    val dupOut = valueCols.filter(c => c == key || c == time ||
      c == s"asof_$time" || leftCols.contains(c))
    require(dupOut.isEmpty,
      s"valueCols ${dupOut.mkString(", ")} collide with left-side output " +
        "names; alias one side before joining")
    val rvType = org.apache.spark.sql.types.StructType(
      right.schema(right.schema.fieldIndex(time)) +:
        valueCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val l = left
      .withColumn("__side", lit(1))
      .select((Seq(col(key), col(time), col("__side"),
        lit(null).cast(right.schema(tieCol).dataType).as("__tie")) ++
        leftCols.map(col) :+
        lit(null).cast(rvType).as("__rv")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((Seq(col(key), col(time), col("__side"),
        col(tieCol).as("__tie")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct((col(time) +: valueCols.map(col)): _*).as("__rv")): _*)
    // Backward: right rows at EQUAL time match (side 0 < 1); among
    // equal right times the smallest tie id is processed LAST (desc
    // order) so the carry keeps it.
    val back = Window.partitionBy(key)
      .orderBy(col(time), col("__side"), col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward: strictly-after only — at equal time the DESC traversal
    // processes left (side 1) before right (side 0), so an equal-time
    // right row never enters the forward carry.
    val fwd = Window.partitionBy(key)
      .orderBy(col(time).desc, col("__side").desc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lt = col(time)
    val bt = col("__b").getField(time)
    val ft = col("__f").getField(time)
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(lt - bt <= ft - lt, col("__b"))
      .otherwise(col("__f"))
    l.unionByName(r)
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(back))
      .withColumn("__f", last(col("__rv"), ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)
      .withColumn("__n", pick)
      .select((Seq(col(key), col(time)) ++
        leftCols.map(col) :+
        col("__n").getField(time).as(s"asof_$time")) ++
        valueCols.map(c => col("__n").getField(c).as(c)): _*)
  }

  /** Click attribution (the ad-domain as-of): each click joined to the
    * user's most recent impression at or before it. */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ns"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ns"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ns"), col("event_id").as("view_id"))
    asofJoin(clicks, views, "user_id", "ts_ns", Seq("view_id"))
      .select(col("click_id"), col("user_id"), col("view_id").as("attributed_view_id"))
      .orderBy("click_id")
  }

  /** Nearest-view attribution: [[clickAttribution]] with pandas
    * merge_asof 'nearest' semantics — a click seconds BEFORE its
    * impression (clock skew, late view logging) still attributes,
    * with the signed gap exposed so the report shows which direction
    * matched. delta in µs (ns div 1000, negative = view before
    * click); NULL view (userless-view clicks) keeps the row. */
  def nearestAttribution(spark: SparkSession, dir: String): DataFrame = {
    // µs grain on BOTH sides of the |Δ| comparison: the oracle's
    // parquet view truncates ns to µs, and a nearest-tie decided by
    // sub-µs digits would break one engine's way ([[clickAttribution]]
    // only needs monotonicity, nearest needs the distances themselves
    // to agree).
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us"), col("event_id").as("view_id"))
    asofNearest(clicks, views, "user_id", "us", "view_id", Seq("view_id"))
      .select(col("click_id"), col("user_id"),
        col("view_id").as("nearest_view_id"),
        (col("asof_us") - col("us")).as("delta_us"))
      .orderBy("click_id")
  }
}
