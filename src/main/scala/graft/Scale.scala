package graft

import org.apache.spark.sql.SparkSession

/** The `graft.scale.approx` switch. `false` (default): exact
  * distinct counts / full-buffer percentile grids — the verification
  * contract every oracle hashes against. `true`: the documented
  * sketch swaps (HLL distinct counts, mergeable percentile sketches)
  * — the defaults a 100 TB run flips on, trading a bounded estimate
  * error for fixed-size aggregation state and, where the exact path
  * self-joins on a gram key, for eliminating that join entirely.
  * Read per query from the session conf so a pipeline can flip it at
  * runtime without re-registering anything; ScaleApproxSpec bounds
  * each swap against its exact twin on the sf0.01 corpus.
  */
object Scale {
  val ApproxKey = "graft.scale.approx"

  def approx(spark: SparkSession): Boolean =
    spark.conf.getOption(ApproxKey).exists(_.toBoolean)

  /** Build with the approx flag forced ON, restoring the session's
    * prior setting afterwards — the registered `*_approx` twins use
    * this so the 100 TB sketch path is driver-value-checked without
    * the caller owning session state. Sound because the exact/sketch
    * branch is taken at DataFrame-CONSTRUCTION time (the wrappers
    * read the conf while building the plan, not at execution). */
  def withApprox[A](spark: SparkSession)(build: => A): A = {
    val prev = spark.conf.getOption(ApproxKey)
    spark.conf.set(ApproxKey, "true")
    try build
    finally prev match {
      case Some(v) => spark.conf.set(ApproxKey, v)
      case None => spark.conf.unset(ApproxKey)
    }
  }
}
