package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output sinks mirroring the reference's artifact surface:
  * CSV-with-header (save_CSV.py:141-152), JSONL (main.py:89-95),
  * append vs truncate dispositions (WRITE_APPEND — main.py:104), and
  * the idempotent delete-date-then-append load
  * (native_CTR_alerts.py:182-212) expressed Spark-natively as dynamic
  * partition overwrite on a date-partitioned parquet table — same
  * rerun-a-day-without-duplicates contract, but executed as a
  * metadata-only partition swap instead of a DELETE scan, which is the
  * only form that works at 100 TB.
  */
object Sinks {

  /** CSV with a header row, like the reference's local CSV artifact. */
  def writeCsvWithHeader(df: DataFrame, path: String,
                         append: Boolean = false): Unit =
    df.write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)

  /** Newline-delimited JSON (the GCS upload payload of main.py:93). */
  def writeJsonl(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .json(path)

  /** ORC artifact (columnar interchange with warehouses that prefer
    * ORC over parquet; pushdown-capable on re-read). */
  def writeOrc(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .orc(path)

  /** Idempotent daily load: re-running a date replaces exactly that
    * date's partition and leaves every other date untouched
    * (delete-then-append semantics of native_CTR_alerts.py:182-212).
    * `df` must contain `dateCol`; rows land under <path>/<dateCol>=…
    */
  def idempotentDailyAppend(df: DataFrame, path: String, dateCol: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy(dateCol)
      .parquet(path)

  /** Small-file compaction: rewrite the affected dates with ONE file
    * per partition. A table fed by many incremental appends (or a
    * streaming sink's micro-batches) accumulates files whose per-file
    * open/footer cost eventually dominates scans — the classic
    * small-files problem. `repartition(dateCol)` routes each date to
    * one task, so the dynamic overwrite lands exactly one file per
    * date; run it periodically over recent partitions, not the whole
    * table.
    */
  def compactDaily(df: DataFrame, path: String, dateCol: String): Unit =
    idempotentDailyAppend(df.repartition(col(dateCol)), path, dateCol)

  /** Retention expiry: drop `dateCol=<iso-date>` partitions strictly
    * older than `cutoffIso`. Pure directory-level metadata work — no
    * row is ever scanned, which is the only affordable shape at
    * 100 TB (a DELETE-scan would read the whole table to drop 1/365th
    * of it). ISO date strings compare lexicographically in date
    * order, so the cutoff is a plain string compare. Returns the
    * dropped partition values.
    */
  def dropPartitionsBefore(spark: org.apache.spark.sql.SparkSession,
                           path: String, dateCol: String,
                           cutoffIso: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$dateCol="
    val doomed = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix) &&
        s.getPath.getName.stripPrefix(prefix) < cutoffIso)
      .map(_.getPath)
    doomed.foreach(p => fs.delete(p, true))
    doomed.map(_.getName.stripPrefix(prefix)).sorted
  }
}
