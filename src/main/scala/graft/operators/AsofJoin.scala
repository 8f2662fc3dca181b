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
}
