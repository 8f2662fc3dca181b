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

  test("cohen kappa: perfect agreement 1, marginal-matching 0, single-class NULL") {
    // s1: detector agrees on both classes → po 1, pe 0.5, κ = 1.
    // s2: truth split en/es but every text reads en → po 0.5; row
    //     marginals (2,2) × col marginals (4,0) → pe 0.5 → κ = 0 (the
    //     marginal-matching coin gets the same accuracy).
    // s3: one class on both sides → pe = 1 → κ NULL, not a blow-up.
    val docs = Seq(
      ("s1", "en", "the of and"), ("s1", "es", "el la de"),
      ("s2", "en", "the of"), ("s2", "en", "the and"),
      ("s2", "es", "the is"), ("s2", "es", "the you"),
      ("s3", "en", "the of"), ("s3", "en", "the and"))
      .toDF("source", "lang", "text")
    val got = TextAnalysis.cohenKappaOf(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(got("s1") == ((2L, 1.0, 0.5, 1.0)), s"s1: ${got("s1")}")
    assert(got("s2") == ((4L, 0.5, 0.5, 0.0)), s"s2: ${got("s2")}")
    val (n3, po3, pe3, k3) = got("s3")
    assert(n3 == 2L && po3 == 1.0 && pe3 == 1.0 && k3.isNaN,
      s"s3 single-class must NULL kappa: ${got("s3")}")
  }
}
