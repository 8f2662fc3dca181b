package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** The reference's nightly orchestration (main.py:111-155: fetch →
  * parse → artifact → load → alert) as one composable run over the
  * local data model: build the daily report, write the CSV/JSONL
  * artifacts, load the date-partitioned warehouse table idempotently
  * (delete-date-then-append semantics as dynamic partition overwrite),
  * and produce the CTR alert report. Re-running a day is a no-op on
  * the warehouse — the rerun contract native_CTR_alerts.py:182-212
  * implements with a DELETE + append.
  *
  * Each step is a DataFrame plan; nothing is collected to the driver.
  */
object DailyPipeline {

  /** @param reportRows rows THIS run produced (not warehouse total) */
  case class RunResult(reportRows: Long, alertGroups: Long, warehousePath: String)

  def run(spark: SparkSession, dir: String, outDir: String,
          writeCsv: Boolean = true): RunResult = {
    // One materialization feeds all three sinks — without the cache the
    // scan+filter+sort plan executes once per artifact.
    val report = Report.dailyReport(spark, dir).cache()
    try {
      val reportRows = report.count()

      // 1. artifacts (save_CSV.py:141-216 / main.py:89-95)
      if (writeCsv) {
        Sinks.writeCsvWithHeader(report, s"$outDir/csv")
        Sinks.writeJsonl(report, s"$outDir/jsonl")
      }

      // 2. idempotent warehouse load (native_CTR_alerts.py:182-212)
      val warehouse = s"$outDir/warehouse"
      Sinks.idempotentDailyAppend(report, warehouse, "date")

      // 3. the analytic + alert formatting (native_CTR_alerts.py:215-329)
      val alerts = CtrAlerts.alertReport(spark, dir)

      RunResult(reportRows, alerts.count(), warehouse)
    } finally report.unpersist()
  }
}
