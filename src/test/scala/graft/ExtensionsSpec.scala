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

  test("text-pipeline SQL functions expose the library's exact semantics") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT normalize_text('CAFÉ  Latte') AS n,
        |       sorted_intersect_size(array(1L, 3L, 9L), array(3L, 7L, 9L)) AS i,
        |       simhash64('alpha beta gamma') AS h,
        |       size(shingle_hashes('a b c d')) AS s,
        |       char_ngram_hashes('aaaa') AS g""".stripMargin).head()
    assert(r.getString(0) == "café  latte")
    assert(r.getInt(1) == 2)
    assert(r.getLong(2) ==
      graft.operators.Dedup.simhashOf(Array("alpha", "beta", "gamma")))
    // 4 tokens, width-3 shingles → 2 distinct shingles
    assert(r.getInt(3) == 2)
    // occurrence-preserving: "aaaa" has TWO identical trigram windows
    val g = r.getSeq[Long](4)
    assert(g.length == 2 && g.distinct.length == 1)
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

  test("sign_pack_bits: SQL path packs like the operator and rejects bad args") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT sign_pack_bits(array(1.0f, -1.0f, 0.0f, 2.0f), 0) AS h0,
        |       sign_pack_bits(CAST(NULL AS ARRAY<FLOAT>), 0) AS hn""".stripMargin).head()
    assert(r.getLong(0) == 9L) // bits 0 and 3: strict > 0 only
    assert(r.isNullAt(1))
    // offset past the array end packs 0 (missing dims are sign 0)
    assert(spark.sql("SELECT sign_pack_bits(array(1.0f), 32) AS h").head().getLong(0) == 0L)
    val err = intercept[Exception](
      spark.sql("SELECT sign_pack_bits(array(1.0f), array(1))").collect())
    assert(err.getMessage.contains("integer literal"),
      s"non-literal 'from' must fail with the builder's message, got: ${err.getMessage}")
    val arity = intercept[Exception](
      spark.sql("SELECT sign_pack_bits(array(1.0f))").collect())
    assert(arity.getMessage.contains("2 arguments"),
      s"wrong arity must fail with the builder's message, got: ${arity.getMessage}")
  }
}
