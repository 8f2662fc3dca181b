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

  /** `events.ts` has shipped in two parquet encodings: TIMESTAMP(NANOS)
    * (reads as BIGINT nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which Bench/Verify/
    * test fixtures all set at build time — the loader itself never
    * mutates session state) and plain TIMESTAMP(MICROS) (reads as a
    * timestamp directly; the flag is inert). The loader dispatches on
    * the OBSERVED scan schema, not on configuration, so either vintage
    * of data — including ScaleUp rehearsal output written from either —
    * loads identically. Both paths expose the same contract: `ts` a
    * microsecond TIMESTAMP (UTC session), `ts_ns` an exact epoch-nano
    * BIGINT for total-order semantics (integer arithmetic only — no
    * float rounding on either path).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // NTZ→LTZ cast is the identity on the stored micros under the
        // UTC session timezone Sessions pins; unix_micros then recovers
        // the exact long, ×1000 = nanos (zero-padded — the file carries
        // no sub-µs digits to lose).
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
}
