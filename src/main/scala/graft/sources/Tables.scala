package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader over a scale-factor directory. Reads are plain
  * `spark.read.parquet` so Catalyst handles column pruning and filter
  * pushdown against the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark rejects by
    * default. The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Bench/Verify/test
    * fixtures all do); the loader itself never mutates session state —
    * a hidden `conf.set` here would leak into unrelated reads and hide
    * the requirement from other callers. `ts` is exposed as a
    * microsecond timestamp plus `ts_ns` (the exact long) for
    * total-order semantics. Integer `div` keeps the conversion exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
}
