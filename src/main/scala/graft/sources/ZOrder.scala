package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping: lay rows out so that BOTH of two filter dimensions are
  * locally clustered, and a predicate box touches only the few files
  * whose per-file min/max ranges intersect it. A single-column sort
  * prunes perfectly on that column and not at all on any other; the
  * Z-curve trades a little per-column locality for locality in both —
  * the standard layout move (Delta/Iceberg OPTIMIZE ZORDER) for a
  * 100 TB table queried by more than one selective dimension. Pure
  * write-path cost: one bounds aggregate, a per-row bit interleave,
  * one range repartition + in-partition sort.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit lane (classic magic-mask doubling — 4 shift/or/and steps,
    * all codegen'd long arithmetic, no per-bit loop).
    */
  private def spread16(v: Column): Column = {
    val s1 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two dimensions, each range-normalized to 16 bits
    * against [mn, mx] bound columns (shared edges for every row, so
    * the code is a total order independent of partitioning). Bounds
    * equal → that dimension contributes a constant 0 (degenerates to
    * a sort on the other).
    */
  def zValue(x: Column, xMn: Column, xMx: Column,
             y: Column, yMn: Column, yMx: Column): Column = {
    def norm16(v: Column, mn: Column, mx: Column): Column =
      when(mx > mn,
        least(floor((v.cast("double") - mn.cast("double")) /
          ((mx.cast("double") - mn.cast("double")) / 65536.0)), lit(65535.0))
          .cast("long"))
        .otherwise(lit(0L))
    spread16(norm16(x, xMn, xMx))
      .bitwiseOR(shiftleft(spread16(norm16(y, yMn, yMx)), 1))
  }

  /** Rewrite `df` parquet at `path`, clustered on the Z-curve of
    * (`c1`, `c2`) into `files` output files. Bounds come from one
    * aggregate broadcast to every row (1 row by construction);
    * `repartitionByRange` gives contiguous, balanced Z-ranges per
    * file (sampled range boundaries — the balance a fixed modulo
    * split would lose on skew), and the in-partition sort tightens
    * each file's min/max envelope on BOTH columns.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    files: Int = 16): Unit = {
    require(files > 0, s"files must be positive, got $files")
    val bounds = df.agg(
      min(col(c1)).as("mn1"), max(col(c1)).as("mx1"),
      min(col(c2)).as("mn2"), max(col(c2)).as("mx2"))
    df.crossJoin(broadcast(bounds)) // 1 row by construction
      .withColumn("zv", zValue(col(c1), col("mn1"), col("mx1"),
        col(c2), col("mn2"), col("mx2")))
      .repartitionByRange(files, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv", "mn1", "mx1", "mn2", "mx2")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) envelopes of two columns for a parquet
    * directory — the reader-side view of what a scan's file/row-group
    * pruning would see. The skipping DEMONSTRATION for tests and
    * layout audits; the actual pruning at query time is the parquet
    * reader's own min/max stats evaluation.
    */
  def fileEnvelopes(spark: org.apache.spark.sql.SparkSession, path: String,
                    c1: String, c2: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c1)).as("mn1"), max(col(c1)).as("mx1"),
        min(col(c2)).as("mn2"), max(col(c2)).as("mx2"))
}
