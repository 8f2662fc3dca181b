package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CountMin, HeavyHitters, MisraGries}

class HeavyHittersSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def sketch(k: Int, tokens: Seq[String]): mutable.HashMap[String, Long] = {
    val mg = new MisraGries(k)
    tokens.foldLeft(mg.zero)(mg.reduce)
  }

  test("MG is exact while the buffer has room") {
    val s = sketch(10, Seq("a", "b", "a", "c", "a", "b"))
    assert(s.toMap == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("MG guarantee: items above N/k survive any partitioned merge order") {
    // 60 tokens: 'hot' ×24 (40% > N/k for k=5), filler spread wide
    val stream = Seq.fill(24)("hot") ++
      (0 until 36).map(i => s"f${i % 12}")
    val mg = new MisraGries(5)
    // fold in three different partition layouts and merge orders
    val layouts = Seq(
      stream.grouped(10).toSeq,
      stream.reverse.grouped(7).toSeq,
      stream.sorted.grouped(20).toSeq)
    for (parts <- layouts) {
      val bufs = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
      val merged = bufs.reduce(mg.merge)
      assert(merged.size <= 5)
      assert(merged.contains("hot"),
        s"true-frequency 24/60 item must survive; got ${merged.keys}")
      // MG estimate never exceeds the true count
      assert(merged("hot") <= 24L)
    }
  }

  test("heavy hitters end-to-end: exactly the tokens above N/k, exact counts") {
    val docs = Seq(
      (1L, "a a a a b c"),
      (2L, "a a b d e f")).toDF("doc_id", "text")
    // N = 12, k = 3 → keep cnt > 4: only 'a' (6)
    val out = HeavyHitters.heavyHittersOf(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 6L)))
  }

  test("heavy hitters: capacity smaller than the vocabulary still finds the majority") {
    val docs = Seq((1L, (Seq.fill(30)("top") ++ (0 until 25).map(i => s"w$i")).mkString(" ")))
      .toDF("doc_id", "text")
    // 55 tokens, k = 4 → threshold 13.75; vocabulary 26 > capacity 4
    val out = HeavyHitters.heavyHittersOf(docs, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("top", 30L)))
  }

  test("md5Hex renders the canonical lower-case digest") {
    assert(CountMin.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
    assert(CountMin.md5Hex("") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("count-min: estimates never undercount and exact heads stay exact") {
    val docs = Seq(
      (1L, (Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
        (0 until 50).map(i => s"tail$i")).mkString(" ")))
      .toDF("doc_id", "text")
    // width 16 forces heavy collision traffic on the tail
    val out = HeavyHitters.countMinErrOf(docs, width = 16, topK = 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(3) >= 0L), "CMS never underestimates")
    val byTok = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTok("alpha") == 40L && byTok("beta") == 25L)
    assert(out.head.getString(0) == "alpha", "exact counts drive the ranking")
  }

  test("count-min: cells are partitioning-invariant (merge is a plain sum)") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"w${i % 7} w${i % 11} shared")).toDF("doc_id", "text")
    val one = HeavyHitters.countMinErrOf(docs.repartition(1), width = 32)
      .collect().map(_.toSeq).toSeq
    val many = HeavyHitters.countMinErrOf(docs.repartition(7), width = 32)
      .collect().map(_.toSeq).toSeq
    assert(one == many)
  }
}
