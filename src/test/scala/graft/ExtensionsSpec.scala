package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("registered SQL functions evaluate like the Column API") {
    GraftFunctions.register(spark)
    val c = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D, 0.0D), array(2.0D, 4.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val sig = spark.sql(
      "SELECT minhash_sig(array(17L, 123456L, 999L)) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == graft.operators.Dedup.NumHashes)
    // spot-check one permutation against the published constants
    val (a, b) = graft.operators.Dedup.perm.head
    val expected0 = Seq(17L, 123456L, 999L).map(h => (h * a + b) % graft.operators.Dedup.P).min
    assert(sig.head == expected0)
  }

  test("minhash_sig of an empty array is NULL (empty docs route to singleton clusters)") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT minhash_sig(array()::ARRAY<BIGINT>) AS s").head()
    assert(r.isNullAt(0))
  }

  test("minhash_sig skips NULL elements like array_min; all-NULL input is NULL") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT minhash_sig(array(17L, CAST(NULL AS BIGINT))) AS a,
        |       minhash_sig(array(17L)) AS b,
        |       minhash_sig(array(CAST(NULL AS BIGINT))) AS c""".stripMargin).head()
    assert(rows.getSeq[Long](0) == rows.getSeq[Long](1),
      "a NULL element must not contribute a bogus hash")
    assert(rows.isNullAt(2))
  }
}
