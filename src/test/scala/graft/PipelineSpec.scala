package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DailyPipeline

class PipelineSpec extends AnyFunSuite with SparkFixture {

  test("daily pipeline run is idempotent: rerunning changes nothing") {
    val out = Files.createTempDirectory("graft-pipeline").toFile.getAbsolutePath
    val r1 = DailyPipeline.run(spark, Sf, out)
    assert(r1.reportRows > 0)

    // artifacts exist with content
    assert(spark.read.option("header", "true").csv(s"$out/csv").count() == r1.reportRows)
    assert(spark.read.json(s"$out/jsonl").count() == r1.reportRows)

    // rerun the whole night: warehouse row count and content hash identical
    // bit_xor: order-independent and can't overflow (an ANSI-mode SUM
    // of 64-bit hashes does)
    def warehouseHash(): Long = spark.read.parquet(r1.warehousePath)
      .select(xxhash64(struct(col("date"), col("l_orderkey"), col("l_linenumber"))).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    val h1 = warehouseHash()
    val r2 = DailyPipeline.run(spark, Sf, out, writeCsv = false)
    assert(r2.reportRows == r1.reportRows)
    assert(spark.read.parquet(r1.warehousePath).count() == r1.reportRows,
      "rerun must not duplicate any date partition")
    assert(warehouseHash() == h1, "rerun must leave identical content")
  }
}
