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
}
