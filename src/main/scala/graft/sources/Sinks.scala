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
}
