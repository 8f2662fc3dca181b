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
}
