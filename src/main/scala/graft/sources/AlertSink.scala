package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Row}

/** Alert delivery facade — the reference's last runtime surface
  * (native_CTR_alerts.py:310-325): the formatted CTR-spike report is
  * POSTed to a chat webhook as a JSON `{"text": ...}` payload with a
  * 10-second timeout and a status-code check (a non-200 is LOGGED and
  * swallowed, never thrown — alerting must not fail the pipeline that
  * computed the alert). This facade adds the production hardening the
  * reference leaves implicit: bounded retries with linear backoff on
  * non-200/connect-failure, and a returned [[AlertSink.Delivery]]
  * receipt so the orchestrator can count failures without parsing
  * logs.
  *
  * Deliberately DRIVER-side: the alert frame is bounded (≤ |apps|
  * rows — one text section per app), and a webhook is a rate-limited
  * human channel, not a data sink. Collecting the bounded frame and
  * posting once from the driver is the correct 100 TB shape; a
  * `df.foreach` would fan credentialed, retrying HTTP calls across
  * 1000 executors to deliver one chat message. The only data-sized
  * work (grouping lines per app) already happened in
  * [[graft.operators.CtrAlerts.alertReport]]'s aggregate.
  */
object AlertSink {

  /** Delivery receipt: last HTTP status (0 = connect failure),
    * attempts actually made, and whether a 200 landed. */
  final case class Delivery(status: Int, attempts: Int, ok: Boolean)

  /** Minimal JSON string escape for the `{"text": ...}` payload —
    * same class of characters [[graft.Verify]] escapes for the oracle
    * blob (quote, backslash, all control chars). */
  private[sources] def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** One chat message from the bounded per-app alert frame —
    * the reference's section format (native_CTR_alerts.py:318-322):
    * a bold date header, then each app's block. An EMPTY frame takes
    * the no-anomaly branch (native_CTR_alerts.py:304-309) and lists
    * the watched units instead. */
  def formatMessage(reportDate: String,
                    appReports: Seq[(String, String)],
                    watchedUnits: Seq[String] = Nil): String = {
    if (appReports.isEmpty)
      (s"*Native CTR Spike Alert for $reportDate*" +:
        "No anomalies detected for the following ad units:" +:
        watchedUnits.map(u => s"- $u")).mkString("\n")
    else
      (s"*Native CTR Spike Alert for $reportDate*" +:
        appReports.map { case (app, report) =>
          s"\nApp name: $app\n$report"
        }).mkString("\n")
  }

  /** POST `{"text": message}` to `url`: `timeoutMs` per attempt (the
    * reference's timeout=10), up to `maxAttempts` attempts on non-200
    * or connect failure with linear `backoffMs` waits between them.
    * Never throws — failure is a `Delivery(ok = false)` plus one
    * stderr line, the reference's log-and-continue contract. */
  def post(url: String, message: String, timeoutMs: Int = 10000,
           maxAttempts: Int = 3, backoffMs: Int = 100): Delivery = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs.toLong)).build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"""{"text": "${jsonEscape(message)}"}"""))
      .build()
    var attempt = 0
    var status = 0
    while (attempt < maxAttempts && status != 200) {
      if (attempt > 0 && backoffMs > 0) Thread.sleep(backoffMs.toLong * attempt)
      attempt += 1
      status =
        try client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
        catch { case _: java.io.IOException | _: InterruptedException => 0 }
    }
    val ok = status == 200
    if (!ok) System.err.println(
      s"[alert-sink] failed to post (status $status after $attempt attempts)")
    Delivery(status, attempt, ok)
  }

  /** Deliver an [[graft.operators.CtrAlerts.alertReport]] frame
    * (columns `app_name`, `alert_count`, `report`) as ONE message.
    * The frame is bounded by construction; `collect()` here is the
    * design, not a shortcut (see object doc). */
  def postAlertReport(df: DataFrame, reportDate: String, url: String,
                      watchedUnits: Seq[String] = Nil,
                      timeoutMs: Int = 10000, maxAttempts: Int = 3,
                      backoffMs: Int = 100): Delivery = {
    val apps = df.select("app_name", "report").collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))
    post(url, formatMessage(reportDate, apps, watchedUnits),
      timeoutMs, maxAttempts, backoffMs)
  }

  /** foreachBatch adapter for the streaming path: each micro-batch's
    * bounded alert frame posts one message stamped with the batch id
    * (so replayed batches are idempotent-by-text on the receiving
    * channel). Use as `.writeStream.foreachBatch(
    * AlertSink.foreachBatchPoster(url))`. */
  def foreachBatchPoster(url: String, timeoutMs: Int = 10000,
                         maxAttempts: Int = 3, backoffMs: Int = 100)
      : (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    if (!batch.isEmpty)
      postAlertReport(batch, s"batch $batchId", url,
        timeoutMs = timeoutMs, maxAttempts = maxAttempts,
        backoffMs = backoffMs)
    ()
  }
}
