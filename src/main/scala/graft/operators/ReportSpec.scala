package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's declarative report API, compiled to a Spark plan.
  *
  * An AdMob report request is a spec — dateRange + dimensions +
  * metrics + sortConditions (main.py:121-135,
  * fetch_mediation_report.py:52-71) — that the service turns into an
  * aggregated, sorted row stream. Here the same spec shape compiles to
  * a DataFrame over the earnings model (lineitem): the date filter is
  * a scan predicate (partition-prunable at scale), dimensions become
  * GROUP BY expressions, metrics become aggregates over exact integer
  * micros, and sortConditions an ORDER BY. Catalyst then owns pushdown
  * and the aggregation strategy — the spec stays declarative end to
  * end.
  */
object ReportSpecs {

  /** @param sortConditions (column, ascending) pairs over emitted cols */
  case class ReportSpec(
      dateStart: String,
      dateEnd: String,
      dimensions: Seq[String],
      metrics: Seq[String],
      sortConditions: Seq[(String, Boolean)])

  /** Dimension registry: spec name → (output column name, expression)
    * over the lineitem earnings model (DATE/MONTH/WEEK dims of
    * main.py:127-130; APP/AD_UNIT of save_CSV.py). */
  private val dimensionExprs: Map[String, (String, Column)] = Map(
    "DATE" -> ("date" -> date_format(col("l_shipdate"), "yyyy-MM-dd")),
    "MONTH" -> ("month" -> date_format(col("l_shipdate"), "yyyy-MM")),
    "WEEK" -> ("week" -> weekofyear(col("l_shipdate"))),
    "APP" -> ("app_name" -> col("l_returnflag")),
    "AD_UNIT" -> ("ad_unit_name" -> col("l_linestatus")))

  /** Metric registry: spec name → (output column name, aggregate). */
  private val metricExprs: Map[String, (String, Column)] = Map(
    "ESTIMATED_EARNINGS" ->
      ("estimated_earnings_micros" -> sum(Report.earningsMicros)),
    "MATCHED_REQUESTS" -> ("matched_requests" -> count(lit(1))),
    "QUANTITY" -> ("quantity" -> sum(col("l_quantity"))))

  def run(spark: SparkSession, dir: String, spec: ReportSpec): DataFrame = {
    // Validate the spec up front with field-level messages — like the
    // reference API does — instead of dying deep in plan construction.
    require(spec.metrics.nonEmpty, "report spec needs at least one metric")
    spec.dimensions.foreach(d => require(dimensionExprs.contains(d),
      s"unknown dimension '$d' (known: ${dimensionExprs.keys.mkString(", ")})"))
    spec.metrics.foreach(m => require(metricExprs.contains(m),
      s"unknown metric '$m' (known: ${metricExprs.keys.mkString(", ")})"))
    val outNames = spec.dimensions.map(dimensionExprs(_)._1) ++
      spec.metrics.map(metricExprs(_)._1)
    val dupNames = outNames.diff(outNames.distinct).distinct
    require(dupNames.isEmpty, // registries are extensible; don't assume disjoint
      s"spec emits duplicate output column(s): ${dupNames.mkString(", ")}")
    val outCols = outNames.toSet
    spec.sortConditions.foreach { case (c, _) => require(outCols.contains(c),
      s"sort column '$c' is not an emitted column (${outCols.mkString(", ")})") }
    val dims = spec.dimensions.map(d => dimensionExprs(d) match {
      case (name, e) => e.as(name)
    })
    val mets = spec.metrics.map(m => metricExprs(m) match {
      case (name, e) => e.as(name)
    })
    val base = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_date(lit(spec.dateStart)) &&
        col("l_shipdate") < date_add(to_date(lit(spec.dateEnd)), 1))
    val grouped = base.groupBy(dims: _*).agg(mets.head, mets.tail: _*)
    if (spec.sortConditions.isEmpty) grouped // unsorted report, like the API
    else grouped.orderBy(spec.sortConditions.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }: _*)
  }

  /** The registered demo spec: Q1-1996 daily earnings per app, DATE
    * ascending — the shape main.py submits every night. */
  def reportSpecDemo(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, ReportSpec(
      dateStart = "1996-01-01", dateEnd = "1996-03-31",
      dimensions = Seq("DATE", "APP"),
      metrics = Seq("ESTIMATED_EARNINGS", "MATCHED_REQUESTS"),
      sortConditions = Seq("date" -> true, "app_name" -> true)))
}
