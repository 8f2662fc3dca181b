package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Readers, Sinks}

class ReadersSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("CSV writer/reader round-trip with explicit schema (no inference pass)") {
    val path = Files.createTempDirectory("graft-rt-csv").toFile.getAbsolutePath + "/t"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    Sinks.writeCsvWithHeader(df, path)
    val back = Readers.readCsvWithHeader(spark, path, Some(schema))
    assert(back.schema == schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("JSONL writer/reader round-trip") {
    val path = Files.createTempDirectory("graft-rt-json").toFile.getAbsolutePath + "/t"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    Sinks.writeJsonl(df, path)
    val back = Readers.readJsonl(spark, path, Some(schema))
    assert(back.schema == schema)
    assert(back.count() == 2)
  }

  test("Tables.events loads BOTH ts vintages to identical (ts, ts_ns) values") {
    // The driver regenerated events.parquet between rounds with a
    // changed ts encoding once already (TIMESTAMP(NANOS) → micros,
    // r9). Tables.events dispatches on the OBSERVED schema: a NANOS
    // column surfaces as BIGINT under the legacy read flag the
    // fixtures set, a micros column as TIMESTAMP. Write one dir per
    // vintage from the same logical rows and assert byte-identical
    // loader output.
    import org.apache.spark.sql.functions._
    val microsUtc = Seq(
      (1L, 1723500000123456L, 10L, "view", 1.5, "{}"),
      (2L, 1723503600999999L, 11L, "click", 2.5, "{}"))
    val base = Files.createTempDirectory("graft-events-enc").toFile.getAbsolutePath
    // vintage A: legacy NANOS vintage (reads as BIGINT nanos)
    microsUtc.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/nanos/events.parquet")
    // vintage B: current vintage, plain TIMESTAMP micros
    microsUtc.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$base/micros/events.parquet")
    def loaded(dir: String) = graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts", "ts_ns")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sortBy(_._1).toSeq
    val a = loaded(s"$base/nanos")
    val b = loaded(s"$base/micros")
    assert(a == b, s"vintages must load identically:\n$a\n$b")
    assert(a.map(_._3) == microsUtc.map(_._2 * 1000L),
      "ts_ns must be the exact epoch nanos on both paths")
    // every OTHER table of the real testdata loads through its loader
    graft.sources.Tables.all.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, Sf)
        else graft.sources.Tables(spark, Sf, t)
      assert(df.limit(1).count() == 1L, s"table $t must load and yield rows")
    }
  }
}
