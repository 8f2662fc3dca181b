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
      ReportSpecs.run(spark, Sf, spec(mets = Seq("CLICKS"))))
      .getMessage.contains("unknown metric 'CLICKS'"))
    assert(intercept[IllegalArgumentException](
      ReportSpecs.run(spark, Sf, spec(sort = Seq("app_name" -> true))))
      .getMessage.contains("not an emitted column"))
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
