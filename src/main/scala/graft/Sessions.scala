package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every entry point needs. The
  * load-bearing line is `nanosAsLong`: `Tables.events` deliberately
  * does not set it (a read must not mutate session state), so any
  * session that touches events.parquet has to carry it from build
  * time — a new entry point rolling its own builder and forgetting it
  * fails at runtime.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
