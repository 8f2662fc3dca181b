package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table support: pre-shuffle a table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs with no
  * exchange at all. At 100 TB the dominant cost of a fact⋈fact join is
  * the shuffle of both sides; two tables bucketed into the same count
  * on the join key sort-merge-join scan-to-scan (BucketedSpec asserts
  * the plan has zero Exchange operators).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table registered in the
    * session catalog (bucket layout lives in the catalog, so reads
    * must go through `spark.table(name)`). */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(name)
  }

  /** Join two same-bucket-count tables on their bucket key —
    * exchange-free when both were written with [[writeBucketed]]. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
