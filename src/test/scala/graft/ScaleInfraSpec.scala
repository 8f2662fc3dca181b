package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Bucketed

class ScaleInfraSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("bucketed join of same-bucket-count tables plans with ZERO exchanges") {
    val wh = Files.createTempDirectory("graft-bucketed").toFile.getAbsolutePath
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 2.0)).toDF("key", "id", "v")
    val dims = (0L until 50L).map(i => (i, s"dim_$i")).toDF("key", "name")
    Bucketed.writeBucketed(facts, "b_facts", "key", 8, Some(s"$wh/b_facts"))
    Bucketed.writeBucketed(dims, "b_dims", "key", 8, Some(s"$wh/b_dims"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.bucketedJoin(spark, "b_facts", "b_dims", "key")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("saltedJoin returns exactly the plain join's rows on a skewed key distribution") {
    // 90% of rows share one hot key
    val left = ((1 to 900).map(_ => 7L) ++ (1 to 100).map(_.toLong))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "lval")
    val right = (1L to 100L).map(i => (i, s"r$i")).toDF("key", "rval") // no key 7 dup
      .union(Seq((7L, "hot")).toDF("key", "rval"))
    val plain = left.join(right, "key").select("key", "lval", "rval")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, "key", salts = 8)
      .select("key", "lval", "rval").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("keySkewOf measures the hot key and emits nothing on empty input") {
    import spark.implicits._
    // 10 rows of key 7, one row each of keys 1..5 → max=10, mean=2.5
    val df = (Seq.fill(10)(7L) ++ (1L to 5L)).toDF("k")
    val Array(row) = graft.operators.Skew.keySkewOf(df, "k").collect()
    assert(row.getLong(1) == 6L && row.getLong(2) == 15L && row.getLong(3) == 10L)
    assert(row.getString(4) == "7")
    assert(row.getDouble(6) == 4.0, s"skew factor 10/(15/6): $row")
    // empty input → zero rows, matching the oracle's shape
    assert(graft.operators.Skew.keySkewOf(
      Seq.empty[Long].toDF("k"), "k").collect().isEmpty)
  }

  test("saltedSumCount equals the direct aggregation") {
    val df = ((1 to 500).map(_ => ("hot", 1.5)) ++ Seq(("cold", 2.0), ("cold", 3.0)))
      .toDF("key", "v")
    val got = Skew.saltedSumCount(df, "key", "v", salts = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got("hot") == ((750.0, 500L)))
    assert(got("cold") == ((5.0, 2L)))
  }
}
