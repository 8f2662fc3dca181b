package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("idempotentDailyAppend: re-running a day replaces only that day") {
    val path = tmp("graft-daily") + "/table"
    val day1 = Seq(("2026-01-01", 1L, 10.0), ("2026-01-01", 2L, 20.0)).toDF("date", "id", "v")
    val day2 = Seq(("2026-01-02", 3L, 30.0)).toDF("date", "id", "v")
    Sinks.idempotentDailyAppend(day1, path, "date")
    Sinks.idempotentDailyAppend(day2, path, "date")
    // rerun day 2 with corrected rows — must replace, not duplicate
    val day2fix = Seq(("2026-01-02", 3L, 33.0), ("2026-01-02", 4L, 40.0)).toDF("date", "id", "v")
    Sinks.idempotentDailyAppend(day2fix, path, "date")

    val back = spark.read.parquet(path)
    assert(back.count() == 4, "day-1 untouched + day-2 replaced")
    assert(back.filter(col("date") === "2026-01-01").count() == 2)
    val d2 = back.filter(col("date") === "2026-01-02")
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d2 == Map(3L -> 33.0, 4L -> 40.0), "day-2 rows must be the rerun's rows only")
  }

  test("date-partitioned table prunes partitions at the scan on read-back") {
    val path = tmp("graft-prune") + "/table"
    val df = Seq(("2026-01-01", 1L), ("2026-01-02", 2L), ("2026-01-03", 3L))
      .toDF("date", "id")
    Sinks.idempotentDailyAppend(df, path, "date")
    val back = spark.read.parquet(path).filter(col("date") === "2026-01-02")
    assert(back.collect().map(_.getAs[Long]("id")).toSeq == Seq(2L))
    val scan = back.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the date predicate must land in PartitionFilters (metadata-only
    // pruning), NOT as a data filter over a full scan — and the
    // post-execution metric proves only one partition's file was read
    assert(scan.metadata("PartitionFilters").contains("date"),
      s"partition filter missing: ${scan.metadata("PartitionFilters")}")
    assert(scan.metrics("numFiles").value == 1,
      "pruned scan must touch exactly the matching partition's file")
  }

  test("compactDaily leaves exactly one file per date partition") {
    val path = tmp("graft-compact") + "/table"
    // simulate many small incremental appends: 4 writes × 2 dates
    for (i <- 1 to 4) {
      Seq(("2026-02-01", i.toLong), ("2026-02-02", i * 10L))
        .toDF("date", "id")
        .repartition(3) // several files per append
        .write.mode("append").partitionBy("date").parquet(path)
    }
    def filesPerDay(day: String) =
      new java.io.File(s"$path/date=$day").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    assert(filesPerDay("2026-02-01") >= 4, "precondition: fragmented table")

    Sinks.compactDaily(spark.read.parquet(path), path, "date")
    assert(filesPerDay("2026-02-01") == 1 && filesPerDay("2026-02-02") == 1)
    // content survives byte-for-byte
    val back = spark.read.parquet(path)
    assert(back.count() == 8)
    assert(back.filter(col("date") === "2026-02-02")
      .agg(sum("id")).head().getLong(0) == 100L)
  }

  test("dropPartitionsBefore deletes only expired dates, touching no rows") {
    val path = tmp("graft-retention") + "/table"
    val df = Seq(("2026-01-01", 1L), ("2026-01-15", 2L), ("2026-02-01", 3L))
      .toDF("date", "id")
    Sinks.idempotentDailyAppend(df, path, "date")
    val dropped = Sinks.dropPartitionsBefore(spark, path, "date", "2026-01-20")
    assert(dropped == Seq("2026-01-01", "2026-01-15"))
    val back = spark.read.parquet(path)
    assert(back.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    // idempotent: nothing left to drop
    assert(Sinks.dropPartitionsBefore(spark, path, "date", "2026-01-20").isEmpty)
    // missing table is a no-op, not an error
    assert(Sinks.dropPartitionsBefore(spark, "/tmp/graft-no-such-table", "date", "2026-01-20").isEmpty)
  }

  test("ORC sink round-trips with schema and pushes filters on re-read") {
    val path = tmp("graft-orc") + "/out"
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    Sinks.writeOrc(df, path)
    val back = graft.sources.Readers.readOrc(spark, path)
    // names + types survive the footer; nullability widens on re-read
    // (file sources always report nullable), which is fine
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)),
      "ORC is self-describing — names and types must survive")
    assert(back.count() == 3)
    val filtered = back.filter(col("id") >= 2)
    val pushed = filtered.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("id"), s"ORC scan must push the id filter: $pushed")
    assert(filtered.count() == 2)
    // append disposition
    Sinks.writeOrc(Seq((4L, "d", 40.0)).toDF("id", "name", "v"), path, append = true)
    assert(graft.sources.Readers.readOrc(spark, path).count() == 4)
  }

  test("CSV sink writes a header row and round-trips") {
    val path = tmp("graft-csv") + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Sinks.writeCsvWithHeader(df, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val firstLines = files.toSeq.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq.headOption)
    assert(firstLines.forall(_ == "id,name"), s"headers were $firstLines")
    val back = spark.read.option("header", "true").csv(path)
    assert(back.count() == 2 && back.columns.toSeq == Seq("id", "name"))
  }

  test("JSONL sink emits one JSON object per line; append mode appends") {
    val path = tmp("graft-jsonl") + "/out"
    Sinks.writeJsonl(Seq((1L, "x")).toDF("id", "name"), path)
    Sinks.writeJsonl(Seq((2L, "y")).toDF("id", "name"), path, append = true)
    val back = spark.read.json(path)
    assert(back.count() == 2)
    val lines = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines.length == 2 && lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }

  test("BqStyleWriter: dispositions and the partition decorator match BQ load-job semantics") {
    import graft.sources.BqStyleWriter
    import graft.sources.BqStyleWriter._
    val wh = tmp("graft-bq")
    def rows(day: String, vs: Long*) =
      vs.map(v => (v, java.sql.Date.valueOf(day))).toDF("v", "day")

    // WRITE_EMPTY: first load succeeds, second refuses.
    BqStyleWriter.load(rows("2024-01-01", 1L), wh, "guarded", WriteEmpty)
    intercept[IllegalStateException] {
      BqStyleWriter.load(rows("2024-01-01", 2L), wh, "guarded", WriteEmpty)
    }

    // Partitioned WRITE_APPEND accumulates; WRITE_TRUNCATE replaces all.
    BqStyleWriter.load(rows("2024-01-01", 1L, 2L), wh, "daily",
      WriteAppend, Some("day"))
    BqStyleWriter.load(rows("2024-01-02", 3L), wh, "daily",
      WriteAppend, Some("day"))
    assert(spark.read.parquet(s"$wh/daily").count() == 3)

    // Decorator + WRITE_APPEND appends WITHIN the decorated day (real
    // BQ appends into a decorated partition; only TRUNCATE replaces).
    BqStyleWriter.load(rows("2024-01-01", 7L), wh, "daily$20240101",
      WriteAppend, Some("day"))
    def back() = spark.read.parquet(s"$wh/daily")
      .select(col("v"), col("day").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back() == Set((1L, "2024-01-01"), (2L, "2024-01-01"),
      (7L, "2024-01-01"), (3L, "2024-01-02")), s"got ${back()}")

    // Decorator + WRITE_TRUNCATE replaces exactly the decorated day,
    // other days intact (the delete-date-then-append contract).
    BqStyleWriter.load(rows("2024-01-01", 7L), wh, "daily$20240101",
      WriteTruncate, Some("day"))
    assert(back() == Set((7L, "2024-01-01"), (3L, "2024-01-02")),
      s"got ${back()}")

    // Decorator + WRITE_EMPTY errors on a non-empty partition instead
    // of silently succeeding.
    intercept[IllegalStateException] {
      BqStyleWriter.load(rows("2024-01-01", 9L), wh, "daily$20240101",
        WriteEmpty, Some("day"))
    }
    // ...but lands on a fresh one.
    BqStyleWriter.load(rows("2024-01-04", 4L), wh, "daily$20240104",
      WriteEmpty, Some("day"))
    assert(back().contains((4L, "2024-01-04")))

    // Decorated loads reject out-of-partition rows BEFORE writing —
    // including NULL partition values (BQ refuses NULL keys in a
    // decorated load; a non-null-safe compare would let them slip).
    intercept[IllegalArgumentException] {
      BqStyleWriter.load(rows("2024-01-05", 9L), wh, "daily$20240101",
        WriteAppend, Some("day"))
    }
    intercept[IllegalArgumentException] {
      BqStyleWriter.load(
        Seq((9L, null: java.sql.Date)).toDF("v", "day"),
        wh, "daily$20240101", WriteAppend, Some("day"))
    }
    assert(spark.read.parquet(s"$wh/daily").count() == 3,
      "a rejected load must leave the table untouched")
    // Decorator without a partition field is a caller bug.
    intercept[IllegalArgumentException] {
      BqStyleWriter.load(rows("2024-01-01", 1L), wh, "daily$20240101")
    }

    BqStyleWriter.load(rows("2024-01-03", 8L), wh, "daily",
      WriteTruncate, Some("day"))
    assert(spark.read.parquet(s"$wh/daily").count() == 1)
  }

  // ── AlertSink: the reference's webhook delivery, sandbox-honest ──
  // (a loopback JDK HttpServer stands in for the chat endpoint; the
  // semantics under test are the reference's: JSON {"text": ...}
  // payload, per-attempt timeout, status-check, log-don't-throw —
  // plus the bounded-retry hardening)

  private def withHttpServer(handler: com.sun.net.httpserver.HttpExchange => Int)
      (body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (ex: com.sun.net.httpserver.HttpExchange) => {
      val status = handler(ex)
      ex.sendResponseHeaders(status, -1)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/hook")
    finally server.stop(0)
  }

  test("AlertSink posts one JSON text payload per alert report and receipts 200") {
    import graft.sources.AlertSink
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withHttpServer { ex =>
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      200
    } { url =>
      val df = Seq(
        ("app_0", 2L, "- user_3 is above 25% of 7-day avg\n- user_8 is below 25% of 7-day avg"),
        ("app_1", 1L, "- user_4 is above 25% of 7-day avg"))
        .toDF("app_name", "alert_count", "report")
      val d = AlertSink.postAlertReport(df, "2024-01-07", url)
      assert(d == AlertSink.Delivery(200, 1, ok = true))
    }
    assert(bodies.size == 1, "one bounded frame = ONE chat message")
    val b = bodies.peek()
    assert(b.startsWith("""{"text": """) && b.endsWith("}"))
    assert(b.contains("*Native CTR Spike Alert for 2024-01-07*"))
    assert(b.contains("App name: app_0") && b.contains("App name: app_1"))
    assert(b.contains("user_3 is above"))
  }

  test("AlertSink empty frame takes the no-anomaly branch listing watched units") {
    import graft.sources.AlertSink
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withHttpServer { ex =>
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      200
    } { url =>
      val empty = Seq.empty[(String, Long, String)]
        .toDF("app_name", "alert_count", "report")
      val d = AlertSink.postAlertReport(empty, "2024-01-07", url,
        watchedUnits = Seq("unit_a", "unit_b"))
      assert(d.ok)
    }
    val b = bodies.peek()
    assert(b.contains("No anomalies detected") && b.contains("- unit_a") &&
      b.contains("- unit_b"))
  }

  test("AlertSink retries non-200 with bounded attempts and never throws") {
    import graft.sources.AlertSink
    // two 500s, then a 200: retry path lands
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    withHttpServer { _ => if (n.incrementAndGet() <= 2) 500 else 200 } { url =>
      val d = AlertSink.post(url, "msg", maxAttempts = 3, backoffMs = 1)
      assert(d == AlertSink.Delivery(200, 3, ok = true))
    }
    // always-500: exhausts attempts, receipts failure, does NOT throw
    withHttpServer { _ => 500 } { url =>
      val d = AlertSink.post(url, "msg", maxAttempts = 2, backoffMs = 1)
      assert(d == AlertSink.Delivery(500, 2, ok = false))
    }
    // connect failure (nothing listening): status 0, still no throw
    val dead = AlertSink.post("http://127.0.0.1:1/hook", "msg",
      timeoutMs = 300, maxAttempts = 2, backoffMs = 1)
    assert(dead == AlertSink.Delivery(0, 2, ok = false))
  }

  test("AlertSink JSON-escapes control characters and quotes in the blob") {
    import graft.sources.AlertSink
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withHttpServer { ex =>
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      200
    } { url =>
      assert(AlertSink.post(url, "line1\nsay \"hi\" \\ tab\there").ok)
    }
    val b = bodies.peek()
    assert(b.contains("""line1\nsay \"hi\" \\ tab\there"""))
    // the payload itself must parse as JSON: quick structural check
    assert(b.count(_ == '{') == 1 && b.count(_ == '}') == 1)
  }
}
