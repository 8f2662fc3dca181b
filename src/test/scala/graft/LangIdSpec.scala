package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class LangIdSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("identifies the language of natural sentences by profile-word hits") {
    val samples = Seq(
      ("en", "the cat sat on a mat and it is happy that you came"),
      ("es", "el perro que vive en la casa no se quiere mover de un sitio"),
      ("de", "der hund und die katze sind in den garten von dem haus gelaufen"),
      ("fr", "le chien et la chatte sont dans les jardins de une grande maison"),
      ("zh", "我 在 有 他 的 家 是 不 了 人"))
    val got = samples.toDF("expected", "text")
      .select(col("expected"), TextAnalysis.langIdCol(col("text")).as("pred"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("no profile hit yields 'und'") {
    val got = Seq("zzz qqq xxx", "")
      .toDF("text").select(TextAnalysis.langIdCol(col("text"))).collect()
    assert(got.forall(_.getString(0) == "und"))
  }

  test("per-language counters saturate instead of overflowing into the next lane") {
    // >4095 hits of an en profile word: a packed add would carry into
    // the es lane and flip the prediction
    val long = ("the " * 5000) + "words here"
    val pred = Seq(long).toDF("text")
      .select(TextAnalysis.langIdCol(col("text"))).head().getString(0)
    assert(pred == "en")
  }

  test("two-projection split (langScores → langPred) equals the single-column form") {
    val df = graft.sources.Tables.documents(spark, Sf).limit(100)
    val split = df
      .select(col("doc_id"), TextAnalysis.langScores(col("text")).as("packed"))
      .select(col("doc_id"), TextAnalysis.langPred(col("packed")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = df
      .select(col("doc_id"), TextAnalysis.langIdCol(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split == direct)
  }
}
