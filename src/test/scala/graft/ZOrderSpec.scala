package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZOrder

class ZOrderSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("zValue matches a reference Morton interleave on 16-bit inputs") {
    def morton(x: Int, y: Int): Long =
      (0 until 16).map { b =>
        (((x >> b) & 1).toLong << (2 * b)) | (((y >> b) & 1).toLong << (2 * b + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zValue(col("x"), lit(0), lit(65535), col("y"), lit(0), lit(65535))
          .as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == morton(x, y), s"($x, $y)")
  }

  test("degenerate bounds contribute a constant, not a crash or NaN") {
    val z = Seq((5, 7)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), lit(3), lit(3), col("y"), lit(0), lit(15))
        .as("z")).collect().head.getLong(0)
    // x collapses to 0; y = 7 range-normalizes to floor(7·65536/15)
    // and lands alone in the odd bit positions
    def morton(x: Int, y: Int): Long =
      (0 until 16).map { b =>
        (((x >> b) & 1).toLong << (2 * b)) | (((y >> b) & 1).toLong << (2 * b + 1))
      }.reduce(_ | _)
    assert(z == morton(0, 7 * 65536 / 15))
  }

  test("z-ordered layout skips files on BOTH dimensions; a sort only on its own") {
    val n = 128
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).cast("int").as("x"),
      (col("id") / n).cast("int").as("y"))
    val zDir = Files.createTempDirectory("graft-zorder").toString + "/t"
    val xDir = Files.createTempDirectory("graft-xsort").toString + "/t"
    ZOrder.writeZOrdered(grid, zDir, "x", "y", files = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def overlapping(dir: String, lo1: Int, hi1: Int, lo2: Int, hi2: Int): Long =
      ZOrder.fileEnvelopes(spark, dir, "x", "y")
        .filter(col("mx1") >= lo1 && col("mn1") <= hi1 &&
          col("mx2") >= lo2 && col("mn2") <= hi2)
        .count()

    // y-only box: the x-sorted layout cannot prune AT ALL
    val zYOnly = overlapping(zDir, 0, n - 1, 0, n / 4 - 1)
    val xYOnly = overlapping(xDir, 0, n - 1, 0, n / 4 - 1)
    assert(xYOnly == 16, "an x-sorted layout has no y locality to prune with")
    assert(zYOnly <= 8, s"z-order should prune a y-only quarter-box, hit $zYOnly files")

    // both-dims quadrant box: z-order isolates it to a corner
    val zBox = overlapping(zDir, 0, n / 4 - 1, 0, n / 4 - 1)
    assert(zBox <= 4, s"a 1/16-area corner box should live in few z-files, hit $zBox")
  }
}
