package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Variant-typed value extraction with the reference's fallback-chain
  * semantics, as pure Column expressions (codegen-friendly, no UDFs).
  *
  * The reference's AdMob report rows carry `metricValues` /
  * `dimensionValues` maps whose leaves are variant-typed JSON objects
  * (`{"integerValue": "12"}` / `{"microsValue": "3400000"}` /
  * `{"decimalValue": "7.9"}` / `{"doubleValue": 0.25}` /
  * `{"value": "..."}`). We model those payloads as JSON string columns.
  *
  * Reference: save_CSV.py:73-101 (get_int/get_float),
  * native_CTR_alerts.py:78-106 (get_int/get_float/disp).
  */
object VariantF {

  /** get_int semantics (save_CSV.py:73-87): integerValue, else
    * microsValue, else decimalValue (parsed as float then truncated
    * toward zero), else `value`, else 0.
    */
  def getIntVariant(mv: Column): Column = coalesce(
    get_json_object(mv, "$.integerValue").cast("long"),
    get_json_object(mv, "$.microsValue").cast("long"),
    // int(float(x)) in Python truncates toward zero; cast double->long
    // in Spark does too.
    get_json_object(mv, "$.decimalValue").cast("double").cast("long"),
    get_json_object(mv, "$.value").cast("double").cast("long"),
    lit(0L)
  )

  /** get_float semantics (save_CSV.py:89-101): doubleValue, else
    * decimalValue, else `value`, else 0.0. */
  def getFloatVariant(mv: Column): Column = coalesce(
    get_json_object(mv, "$.doubleValue").cast("double"),
    get_json_object(mv, "$.decimalValue").cast("double"),
    get_json_object(mv, "$.value").cast("double"),
    lit(0.0)
  )

  /** Extract a named key's variant object from a dims/metrics JSON map
    * column, e.g. `variantField(col("metricValues"), "CLICKS")`. */
  def variantField(mapJson: Column, key: String): Column =
    get_json_object(mapJson, s"$$.$key")

  /** Parse a variant payload ONCE into a typed struct. Each
    * `get_json_object` call above re-parses the JSON string (one
    * Jackson parse per extracted key per row); in a hot path parse
    * with this and run the fallback chains over struct fields —
    * materialize the struct in its own projection so it isn't inlined
    * per consumer. */
  def parseVariant(mv: Column): Column =
    from_json(mv, org.apache.spark.sql.types.StructType(
      Seq("integerValue", "microsValue", "decimalValue", "doubleValue", "value")
        .map(org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.StringType))))

  /** get_int fallback chain over a [[parseVariant]] struct. */
  def getIntFromStruct(v: Column): Column = coalesce(
    v.getField("integerValue").cast("long"),
    v.getField("microsValue").cast("long"),
    v.getField("decimalValue").cast("double").cast("long"),
    v.getField("value").cast("double").cast("long"),
    lit(0L))

  /** get_float fallback chain over a [[parseVariant]] struct. */
  def getFloatFromStruct(v: Column): Column = coalesce(
    v.getField("doubleValue").cast("double"),
    v.getField("decimalValue").cast("double"),
    v.getField("value").cast("double"),
    lit(0.0))

  /** disp() semantics (native_CTR_alerts.py:104-106): displayLabel if
    * non-empty, else value if non-empty, else "". Python `or` treats
    * empty string as falsy, hence the nullif-empty steps. */
  def displayCoalesce(displayLabel: Column, value: Column): Column =
    coalesce(nullif(displayLabel, lit("")), nullif(value, lit("")), lit(""))

  /** YYYYMMDD -> "YYYY-MM-DD" string transform (save_CSV.py:160-162).
    * Pure string slicing like the reference (no date parsing), applied
    * only when the input is 8 chars (save_network_CSV.py:150). */
  def yyyymmddToIso(raw: Column): Column =
    when(length(raw) === 8,
      concat_ws("-", substring(raw, 1, 4), substring(raw, 5, 2),
        substring(raw, 7, 2))
    ).otherwise(raw)

  /** BigQuery SAFE_DIVIDE semantics: NULL on zero/NULL divisor
    * (native_CTR_alerts.py:232). */
  def safeDivide(num: Column, den: Column): Column =
    num.cast("double") / nullif(den.cast("double"), lit(0.0))
}
