package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VariantF.safeDivide
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
  *
  * The vocabulary covers BOTH reference pipelines in full: the
  * network/mediation nightly spec's 10 dimensions (main.py:127-130)
  * and the mediation fetcher's dims (fetch_mediation_report.py:53-60),
  * plus every metric either submits — including the four DERIVED
  * ratio metrics (IMPRESSION_CTR, IMPRESSION_RPM, MATCH_RATE,
  * SHOW_RATE; fetch_mediation_report.py adds OBSERVED_ECPM), which
  * compile to POST-aggregation expressions: the compiler first
  * aggregates every base metric a derived one needs (whether or not
  * it was requested), then projects the ratio — so a ratio is always
  * the ratio OF THE GROUP'S SUMS, never an average of per-row ratios.
  *
  * Earnings-model mapping (the sandbox stand-in for AdMob's columns,
  * one place so every consumer agrees): APP=l_returnflag,
  * AD_UNIT=l_linestatus, AD_SOURCE=src_(l_partkey mod 5),
  * AD_SOURCE_INSTANCE=inst_(l_partkey mod 20) (instances refine
  * sources 4:1, like real mediation stacks), MEDIATION_GROUP=
  * mg_(l_suppkey mod 4), APP_VERSION_NAME=v+l_linenumber,
  * COUNTRY=the supplier's nation (broadcast supplier⋈nation, joined
  * only when requested);
  * AD_REQUESTS=Σl_quantity, MATCHED_REQUESTS=line count,
  * IMPRESSIONS=discounted-line count, CLICKS=discounted lines with
  * l_quantity ≤ 2 (⊆ impressions, so CTR ≤ 1).
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
    * over the lineitem earnings model (main.py:127-130,
    * fetch_mediation_report.py:53-60, save_CSV.py). COUNTRY reads the
    * `__country` column the conditional supplier⋈nation broadcast
    * join provides. */
  private val dimensionExprs: Map[String, (String, Column)] = Map(
    "DATE" -> ("date" -> date_format(col("l_shipdate"), "yyyy-MM-dd")),
    "MONTH" -> ("month" -> date_format(col("l_shipdate"), "yyyy-MM")),
    "WEEK" -> ("week" -> weekofyear(col("l_shipdate"))),
    "APP" -> ("app_name" -> col("l_returnflag")),
    "AD_UNIT" -> ("ad_unit_name" -> col("l_linestatus")),
    "AD_SOURCE" ->
      ("ad_source" -> concat(lit("src_"), (col("l_partkey") % 5).cast("string"))),
    "AD_SOURCE_INSTANCE" ->
      ("ad_source_instance" -> concat(lit("inst_"), (col("l_partkey") % 20).cast("string"))),
    "MEDIATION_GROUP" ->
      ("mediation_group" -> concat(lit("mg_"), (col("l_suppkey") % 4).cast("string"))),
    "APP_VERSION_NAME" ->
      ("app_version_name" -> concat(lit("v"), col("l_linenumber").cast("string"))),
    "COUNTRY" -> ("country" -> col("__country")))

  /** Base metric registry: spec name → (output column name, aggregate).
    * All integer-exact (micros / counts) so groups re-aggregate
    * associatively and the oracle hashes bit-for-bit. */
  private val metricExprs: Map[String, (String, Column)] = Map(
    "ESTIMATED_EARNINGS" ->
      ("estimated_earnings_micros" -> sum(Report.earningsMicros)),
    "MATCHED_REQUESTS" -> ("matched_requests" -> count(lit(1))),
    "QUANTITY" -> ("quantity" -> sum(col("l_quantity"))),
    "AD_REQUESTS" ->
      ("ad_requests" -> sum(col("l_quantity").cast("long"))),
    "IMPRESSIONS" ->
      ("impressions" -> sum(when(col("l_discount") > 0, 1L).otherwise(0L))),
    "CLICKS" ->
      ("clicks" -> sum(when(col("l_discount") > 0 && col("l_quantity") <= 2,
        1L).otherwise(0L))))

  /** Derived ratio metrics: spec name → (output column name, base
    * metrics the ratio needs, post-aggregation expression over those
    * base OUTPUT columns). SAFE_DIVIDE semantics (NULL on a zero
    * denominator — the API's behavior), 6-dp half-up like the CTR
    * family; OBSERVED_ECPM stays on the exact integer micro grid
    * (micros × 1000 div impressions — AdMob returns it in micros). */
  private val derivedExprs: Map[String, (String, Seq[String], Column)] = Map(
    "IMPRESSION_CTR" -> (("impression_ctr", Seq("CLICKS", "IMPRESSIONS"),
      round(safeDivide(col("clicks"), col("impressions")), 6))),
    "IMPRESSION_RPM" -> (("impression_rpm",
      Seq("ESTIMATED_EARNINGS", "IMPRESSIONS"),
      round(safeDivide(col("estimated_earnings_micros").cast("double") / 1000.0,
        col("impressions")), 6))),
    "MATCH_RATE" -> (("match_rate", Seq("MATCHED_REQUESTS", "AD_REQUESTS"),
      round(safeDivide(col("matched_requests"), col("ad_requests")), 6))),
    "SHOW_RATE" -> (("show_rate", Seq("IMPRESSIONS", "MATCHED_REQUESTS"),
      round(safeDivide(col("impressions"), col("matched_requests")), 6))),
    "OBSERVED_ECPM" -> (("observed_ecpm_micros",
      Seq("ESTIMATED_EARNINGS", "IMPRESSIONS"),
      expr("""CAST(CASE WHEN impressions > 0
             |  THEN (estimated_earnings_micros * 1000) div impressions
             |  END AS BIGINT)""".stripMargin))))

  def run(spark: SparkSession, dir: String, spec: ReportSpec): DataFrame = {
    // Validate the spec up front with field-level messages — like the
    // reference API does — instead of dying deep in plan construction.
    require(spec.metrics.nonEmpty, "report spec needs at least one metric")
    spec.dimensions.foreach(d => require(dimensionExprs.contains(d),
      s"unknown dimension '$d' (known: ${dimensionExprs.keys.toSeq.sorted.mkString(", ")})"))
    spec.metrics.foreach(m => require(
      metricExprs.contains(m) || derivedExprs.contains(m),
      s"unknown metric '$m' (known: ${(metricExprs.keys ++ derivedExprs.keys).toSeq.sorted.mkString(", ")})"))
    val outNames = spec.dimensions.map(dimensionExprs(_)._1) ++
      spec.metrics.map(m => metricExprs.get(m).map(_._1)
        .getOrElse(derivedExprs(m)._1))
    val dupNames = outNames.diff(outNames.distinct).distinct
    require(dupNames.isEmpty, // registries are extensible; don't assume disjoint
      s"spec emits duplicate output column(s): ${dupNames.mkString(", ")}")
    val outCols = outNames.toSet
    spec.sortConditions.foreach { case (c, _) => require(outCols.contains(c),
      s"sort column '$c' is not an emitted column (${outCols.mkString(", ")})") }
    val dims = spec.dimensions.map(d => dimensionExprs(d) match {
      case (name, e) => e.as(name)
    })
    // Aggregate every base metric that is requested directly OR that
    // a requested derived ratio depends on; the final projection then
    // keeps only the spec's columns, in the spec's order.
    val baseNeeded = (spec.metrics.filter(metricExprs.contains) ++
      spec.metrics.flatMap(m => derivedExprs.get(m).map(_._2).getOrElse(Nil)))
      .distinct
    val aggs = baseNeeded.map(m => metricExprs(m) match {
      case (name, e) => e.as(name)
    })
    val lineitem = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_date(lit(spec.dateStart)) &&
        col("l_shipdate") < date_add(to_date(lit(spec.dateEnd)), 1))
    // COUNTRY = the supplier's nation: a two-hop dimension lookup
    // (supplier → nation), both dims broadcast-small at any fact
    // scale; joined only when the spec asks for it so every other
    // report stays a pure scan+aggregate.
    val base =
      if (!spec.dimensions.contains("COUNTRY")) lineitem
      else {
        val countryOfSupplier = Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))
          .join(Tables.nation(spark, dir)
            .select(col("n_nationkey"), col("n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("__country"))
        lineitem.join(broadcast(countryOfSupplier),
          col("l_suppkey") === col("s_suppkey"))
      }
    val grouped = base.groupBy(dims: _*).agg(aggs.head, aggs.tail: _*)
    val metricCols = spec.metrics.map { m =>
      metricExprs.get(m) match {
        case Some((name, _)) => col(name)
        case None => derivedExprs(m) match {
          case (name, _, e) => e.as(name)
        }
      }
    }
    val projected = grouped.select(
      spec.dimensions.map(d => col(dimensionExprs(d)._1)) ++ metricCols: _*)
    if (spec.sortConditions.isEmpty) projected // unsorted report, like the API
    else projected.orderBy(spec.sortConditions.map { case (c, asc) =>
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

  /** fetch_mediation_report.py:52-71 replayed VERBATIM — same seven
    * dimensions, same eight metrics (three of them derived ratios),
    * same DATE-ascending sort — over one report day, the reference's
    * "yesterday" single-day dateRange. */
  def reportSpecMediation(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, ReportSpec(
      dateStart = "1996-03-15", dateEnd = "1996-03-15",
      dimensions = Seq("DATE", "APP", "AD_UNIT", "AD_SOURCE",
        "AD_SOURCE_INSTANCE", "MEDIATION_GROUP", "COUNTRY"),
      metrics = Seq("AD_REQUESTS", "CLICKS", "ESTIMATED_EARNINGS",
        "IMPRESSIONS", "IMPRESSION_CTR", "MATCHED_REQUESTS", "MATCH_RATE",
        "OBSERVED_ECPM"),
      sortConditions = Seq("date" -> true)))

  /** main.py:121-135 replayed VERBATIM — the nightly network/mediation
    * spec's ten dimensions and eight metrics (four derived ratios),
    * DATE ascending, over one report day. */
  def reportSpecNetwork(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, ReportSpec(
      dateStart = "1996-03-15", dateEnd = "1996-03-15",
      dimensions = Seq("DATE", "MONTH", "WEEK", "AD_SOURCE",
        "AD_SOURCE_INSTANCE", "AD_UNIT", "APP", "MEDIATION_GROUP",
        "COUNTRY", "APP_VERSION_NAME"),
      metrics = Seq("AD_REQUESTS", "CLICKS", "ESTIMATED_EARNINGS",
        "IMPRESSIONS", "IMPRESSION_CTR", "IMPRESSION_RPM", "MATCH_RATE",
        "SHOW_RATE"),
      sortConditions = Seq("date" -> true)))
}
