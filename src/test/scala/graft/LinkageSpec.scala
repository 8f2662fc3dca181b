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
  test("entity clusters close the transitive chain fuzzy pairs leave open") {
    // aaaa ~ aabb (dist 2) ~ bbbb (dist 2), but aaaa vs bbbb is dist 4:
    // only the closure puts all three in one entity. zzzz sits alone.
    val out = Linkage.entityClustersOf(partsDf(
      "aaaa corp", "aabb corp", "bbbb corp", "zzzz metal")).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("aaaa corp")._1 == "aaaa corp")
    assert(out("aabb corp")._1 == "aaaa corp")
    assert(out("bbbb corp")._1 == "aaaa corp",
      s"transitive member must join the cluster: $out")
    assert(out("aaaa corp")._2 == 3L && out("bbbb corp")._2 == 3L)
    assert(out("zzzz metal") == (("zzzz metal", 1L, 1L)), "singletons included")
  }
}
