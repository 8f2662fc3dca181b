package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Input side of the artifact surface: the reference ingests API JSON
  * rows (main.py:58-87 iterates the report's JSON stream) and re-reads
  * its own CSV artifacts. Both readers take an explicit schema by
  * default — at 100 TB, schema inference is a full extra pass over the
  * data and must never run implicitly.
  */
object Readers {

  /** CSV with header row. `schema` skips inference; pass None only for
    * small ad-hoc reads (it triggers an inference scan). */
  def readCsvWithHeader(spark: SparkSession, path: String,
                        schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** Newline-delimited JSON (one object per line — the reference's
    * report-row stream shape). */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** ORC — the other columnar interchange format warehouses hand over.
    * Self-describing (schema in the footer, like parquet), so no
    * schema argument; filter pushdown and column pruning work the same
    * as the parquet path. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
