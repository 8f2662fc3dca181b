package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReportSpecs
import graft.operators.ReportSpecs.ReportSpec

class ReportSpecSpec extends AnyFunSuite with SparkFixture {

  private def spec(dims: Seq[String] = Seq("DATE"),
                   mets: Seq[String] = Seq("ESTIMATED_EARNINGS"),
                   sort: Seq[(String, Boolean)] = Seq("date" -> true)) =
    ReportSpec("1996-01-01", "1996-01-31", dims, mets, sort)

  test("invalid specs fail fast with field-level messages") {
    assert(intercept[IllegalArgumentException](
      ReportSpecs.run(spark, Sf, spec(mets = Seq.empty)))
      .getMessage.contains("at least one metric"))
    assert(intercept[IllegalArgumentException](
      ReportSpecs.run(spark, Sf, spec(dims = Seq("PLATFORM"))))
      .getMessage.contains("unknown dimension 'PLATFORM'"))
    assert(intercept[IllegalArgumentException](
      ReportSpecs.run(spark, Sf, spec(mets = Seq("TAPS"))))
      .getMessage.contains("unknown metric 'TAPS'"))
    assert(intercept[IllegalArgumentException](
      ReportSpecs.run(spark, Sf, spec(sort = Seq("app_name" -> true))))
      .getMessage.contains("not an emitted column"))
  }

  test("derived ratio metrics aggregate their base deps without emitting them") {
    // IMPRESSION_CTR alone: clicks+impressions aggregate internally,
    // only the ratio is emitted, and it's the ratio OF THE SUMS.
    val out = ReportSpecs.run(spark, Sf, spec(
      dims = Seq("APP"), mets = Seq("IMPRESSION_CTR"), sort = Seq.empty))
    assert(out.columns.toSeq == Seq("app_name", "impression_ctr"))
    val both = ReportSpecs.run(spark, Sf, spec(
      dims = Seq("APP"),
      mets = Seq("CLICKS", "IMPRESSIONS", "IMPRESSION_CTR"),
      sort = Seq.empty)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    both.values.foreach { case (c, i, ctr) =>
      val expect = if (i == 0) -1.0
        else math.round(c.toDouble / i * 1e6) / 1e6
      assert(math.abs(ctr - expect) < 1e-9, s"ctr of sums: $c/$i vs $ctr")
    }
  }

  test("COUNTRY joins the supplier nation only when requested") {
    val without = ReportSpecs.run(spark, Sf, spec(sort = Seq.empty))
    assert(!without.queryExecution.sparkPlan.toString.contains("Join"),
      "no COUNTRY → pure scan+aggregate, no join")
    val withC = ReportSpecs.run(spark, Sf, spec(
      dims = Seq("COUNTRY"), sort = Seq.empty))
    assert(withC.columns.toSeq == Seq("country", "estimated_earnings_micros"))
    assert(withC.count() > 0)
  }

  test("both reference nightly specs replay verbatim through the compiler") {
    val med = ReportSpecs.reportSpecMediation(spark, Sf)
    assert(med.columns.toSeq == Seq("date", "app_name", "ad_unit_name",
      "ad_source", "ad_source_instance", "mediation_group", "country",
      "ad_requests", "clicks", "estimated_earnings_micros", "impressions",
      "impression_ctr", "matched_requests", "match_rate",
      "observed_ecpm_micros"))
    assert(med.count() > 0)
    val net = ReportSpecs.reportSpecNetwork(spark, Sf)
    assert(net.columns.toSeq == Seq("date", "month", "week", "ad_source",
      "ad_source_instance", "ad_unit_name", "app_name", "mediation_group",
      "country", "app_version_name", "ad_requests", "clicks",
      "estimated_earnings_micros", "impressions", "impression_ctr",
      "impression_rpm", "match_rate", "show_rate"))
    assert(net.count() > 0)
  }

  test("an empty sortConditions list yields an unsorted report, not an error") {
    val out = ReportSpecs.run(spark, Sf, spec(sort = Seq.empty))
    assert(out.columns.toSeq == Seq("date", "estimated_earnings_micros"))
    assert(out.count() > 0)
  }

  test("the demo spec compiles to the Q1-1996 daily-earnings-per-app report") {
    val rows = ReportSpecs.reportSpecDemo(spark, Sf)
    assert(rows.columns.toSeq ==
      Seq("date", "app_name", "estimated_earnings_micros", "matched_requests"))
    val dates = rows.select("date").collect().map(_.getString(0))
    assert(dates.nonEmpty && dates.forall(d => d >= "1996-01-01" && d <= "1996-03-31"))
    assert(dates.toSeq == dates.sorted.toSeq, "DATE ascending per the spec")
  }
}
