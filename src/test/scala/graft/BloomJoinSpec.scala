package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("bloom pre-filter has no false negatives: every true match survives") {
    val keys = (1L to 50L).toDF("k")
    val facts = (1L to 500L).map(i => (i, i % 100)).toDF("fact_id", "fk")
    val kept = BloomJoin.preFilter(facts, keys, "fk", "k")
      .select("fk").as[Long].collect().toSet
    assert((1L to 50L).toSet.subsetOf(kept),
      "a Bloom filter may over-keep (false positives) but must never drop a match")
  }

  test("bloom pre-filter actually prunes a disjoint fact side") {
    val keys = (1L to 100L).toDF("k")
    val facts = (100000L to 101000L).toDF("fk") // disjoint from keys
    val kept = BloomJoin.preFilter(facts, keys, "fk", "k").count()
    // 2^17 bits / 100 keys ≈ 1310 bits per key: the false-positive
    // rate is ~(500/2^17)^5 ≈ 1e-12 — any survivor here means the
    // probe isn't reading the bits the build wrote.
    assert(kept == 0, s"expected full pruning of disjoint keys, kept $kept")
  }

  test("bloom filter is one row of fixed-size words, never collected wholesale") {
    val bloom = BloomJoin.bloomFilterOf((1L to 1000L).toDF("k"), "k")
    val rows = bloom.collect()
    assert(rows.length == 1)
    val words = rows.head.getMap[Int, Long](0)
    assert(words.size <= (1 << 17) / 64,
      "the sparse word map can never exceed the fixed bitset size")
  }

  test("urgent revenue equals the plain exact semi-join (bloom is invisible)") {
    val lineitem = Seq(
      (1L, "A", 100.0, 0.1), (1L, "B", 200.0, 0.0),
      (2L, "A", 50.0, 0.5), (3L, "A", 10.0, 0.0))
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val orders = Seq(
      (1L, "1-URGENT"), (2L, "5-LOW"), (3L, "1-URGENT"))
      .toDF("o_orderkey", "o_orderpriority")
    val out = BloomJoin.urgentRevenueOf(lineitem, orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // order 2 is not urgent: flag A keeps rows (1,A,90) and (3,A,10)
    assert(out("A") == ((2L, 100.0)))
    assert(out("B") == ((1L, 200.0)))
  }

  test("bloom build rejects a bit count that is not a multiple of 64") {
    intercept[IllegalArgumentException] {
      BloomJoin.bloomFilterOf(Seq(1L).toDF("k"), "k", bits = 100)
    }
  }

  test("bloom fpr audit: zero false negatives, exact fill and ppm algebra") {
    // 3 urgent keys, 7 known non-members.
    val orders = ((1 to 3).map(k => (k.toLong, "1-URGENT")) ++
      (4 to 10).map(k => (k.toLong, "3-MEDIUM")))
      .toDF("o_orderkey", "o_orderpriority")
    val r = graft.operators.BloomJoin.bloomFprOf(orders, bits = 256, hashes = 3)
      .collect().head
    assert(r.getInt(0) == 256 && r.getInt(1) == 3)
    assert(r.getLong(2) == 3L, "n_keys")
    val setBits = r.getLong(3)
    assert(setBits > 0 && setBits <= 9L, "3 keys x 3 hashes, minus collisions")
    assert(r.getLong(4) == setBits * 1000000L / 256L, "fill ppm")
    assert(r.getLong(5) == 7L, "n_negatives")
    assert(r.getLong(7) == r.getLong(6) * 1000000L / 7L, "fpr ppm")
    // Zero false negatives is the Bloom contract: every member probes true.
    val members = orders.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("l_orderkey"), lit("x").as("pad"))
    val kept = graft.operators.BloomJoin.preFilter(
      members, orders.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey"), "l_orderkey", "o_orderkey",
      bits = 256, hashes = 3)
    assert(kept.count() == 3L, "no member may be filtered out")
  }

  test("bloom fpr audit: a saturated filter reports full fill and all-FP") {
    // 1 bit-word worth of space vs 200 keys: fill -> ~100%, every
    // non-member probes true — the degradation mode the audit exists
    // to surface.
    val orders = ((1 to 200).map(k => (k.toLong, "1-URGENT")) ++
      (201 to 220).map(k => (k.toLong, "3-MEDIUM")))
      .toDF("o_orderkey", "o_orderpriority")
    val r = graft.operators.BloomJoin.bloomFprOf(orders, bits = 64, hashes = 2)
      .collect().head
    assert(r.getLong(4) > 900000L, s"fill ~saturated: ${r.getLong(4)} ppm")
    assert(r.getLong(7) > 900000L, s"nearly every negative collides: $r")
  }
}
