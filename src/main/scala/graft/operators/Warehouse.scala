package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextF
import graft.sources.Tables

/** Warehouse-maintenance operators: referential-integrity audit and
  * changelog compaction — the recurring jobs that keep a lake usable
  * (the reference trusts its single API upstream; a many-writer lake
  * audits its own joins).
  */
object Warehouse {

  /** Foreign-key coverage audit: for each event type, how many rows
    * resolve against the customer dimension and how many are orphans.
    * One pass: the (distinct) dimension keys join in with a match
    * flag — strategy left to AQE (a dimension can outgrow any forced
    * broadcast) — then a single map-side-combinable aggregate. The
    * coverage ratio rounds floor-form so the audit is cross-engine
    * reproducible.
    */
  def fkCoverageOf(facts: DataFrame, dim: DataFrame): DataFrame = {
    val keys = dim.select(col("key")).distinct()
      .withColumn("matched", lit(1L))
    facts.join(keys, facts("user_id") === keys("key"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("matched"), lit(0L))).as("n_matched"))
      .select(col("event_type"), col("n_rows"), col("n_matched"),
        (col("n_rows") - col("n_matched")).as("n_orphans"),
        TextF.round4HalfUp(
          col("n_matched").cast("double") / col("n_rows").cast("double"))
          .as("coverage"))
      .orderBy("event_type")
  }

  def fkCoverage(spark: SparkSession, dir: String): DataFrame =
    fkCoverageOf(Tables.events(spark, dir),
      Tables.customer(spark, dir).select(col("c_custkey").as("key")))

  /** Changelog compaction (the upsert-view / SCD "current" snapshot):
    * the latest row per key by (event-time, event_id) — expressed as a
    * lexicographic max over a struct, NOT a per-key window: the
    * aggregate combines map-side, so each partition contributes one
    * candidate row per key to the shuffle, where row_number() would
    * shuffle every version of every key and sort. The unique event_id
    * tiebreak makes equal-timestamp versions deterministic.
    */
  def latestPerKeyOf(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(max(struct(col("us"), col("event_id"), col("event_type"),
        col("value"))).as("m"))
      .select(col("user_id"), col("m.us").as("us"),
        col("m.event_id").as("event_id"), col("m.event_type").as("event_type"),
        col("m.value").as("value"))
      .orderBy("user_id")

  def latestPerKey(spark: SparkSession, dir: String): DataFrame =
    latestPerKeyOf(Tables.events(spark, dir))
}
