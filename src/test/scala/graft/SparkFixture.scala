package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local session for every suite (sbt forks a single test
  * JVM). Built with the same confs the Bench/Verify mains use —
  * notably nanosAsLong, which any `events.parquet` read requires. */
object SparkFixture {
  lazy val spark: SparkSession =
    Sessions.builder("4").appName("graft-test").getOrCreate()
}

trait SparkFixture { this: Suite =>
  lazy val spark: SparkSession = SparkFixture.spark
  /** Smallest driver-generated scale factor — correctness only. */
  val Sf = "/root/testdata/sf0.001"
}
