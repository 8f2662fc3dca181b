package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

class LinkageSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def partsDf(names: String*): DataFrame =
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")

  test("fuzzy match pairs close names within a block, once, with counts") {
    val out = Linkage.fuzzyMatchOf(partsDf(
      "red bolt", "rod bolt", "red bolt", // dup spelling → n_parts 2
      "green anvil"))                     // lone block → no pair
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("red bolt", "rod bolt", 1, 2L, 1L)),
      s"one unordered pair, dictionary counts carried: ${out.toSeq}")
  }

  test("fuzzy match never crosses blocks even for tiny edit distances") {
    val out = Linkage.fuzzyMatchOf(partsDf("red bolt", "red bolts"))
      .collect()
    assert(out.isEmpty,
      "'bolt' vs 'bolts' are different blocks — the documented blocking trade")
  }

  test("fuzzy match respects the distance threshold") {
    assert(Linkage.fuzzyMatchOf(partsDf("red gear", "big gear")).isEmpty,
      "distance-3 pair must not match at maxDist 2")
    assert(Linkage.fuzzyMatchOf(partsDf("red gear", "big gear"), maxDist = 3)
      .count() == 1)
  }
}
