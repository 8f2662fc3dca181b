package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tokenizer

class TokenizerSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("bpe learns the frequency-ordered merges of a hand-checked corpus") {
    // words: "ab"×3, "ac"×1 → pair stats: (a,b)=3, (a,c)=1
    val out = Tokenizer.bpeMergesOf(docs("ab ab", "ab ac"), merges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "a", "b", "ab", 3L),  // most frequent pair merges first
      (2, "a", "c", "ac", 1L))) // then the leftover pair
  }

  test("bpe composes merged symbols in later rounds") {
    // "abc"×4: round 1 merges (a,b)=4 over (b,c)=4? tie → (a,b) wins
    // lexicographically; round 2 must see the MERGED symbol ("ab","c")
    val out = Tokenizer.bpeMergesOf(docs("abc abc", "abc abc"), merges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(("a", "b", "ab"), ("ab", "c", "abc")),
      "round 2 pairs must be built from round 1's merged symbols")
  }

  test("bpe counts overlapping pairs and merges greedily left-to-right") {
    // "aaa": pairs (a,a)×2 per word → count 2; after the merge the word
    // is [aa, a] (greedy from the left), so round 2's top pair is (aa, a)
    val out = Tokenizer.bpeMergesOf(docs("aaa"), merges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq == Seq(("a", "a", 2L), ("aa", "a", 1L)))
  }

  test("bpe stops early when every word is a single symbol") {
    val out = Tokenizer.bpeMergesOf(docs("ab ab"), merges = 10).collect()
    assert(out.length == 1, "one merge exhausts a single-pair vocabulary")
  }

  test("segmenting replays rules in rank order and reports fertility") {
    // rules: (a,b)->ab then (ab,c)->abc. "abc" folds to ONE subword
    // only if rule 2 sees rule 1's output; "abd" stops at [ab, d].
    val out = Tokenizer.bpeSegmentOf(
      docs("abc abd", "xy"), Seq(("a", "b"), ("ab", "c"))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) == ((2L, 3L, 1.5)), "abc -> [abc], abd -> [ab, d]")
    assert(out(1L) == ((1L, 2L, 2.0)), "xy has no applicable rule -> [x, y]")
  }

  test("segmenting with zero rules is character-level") {
    val out = Tokenizer.bpeSegmentOf(docs("abc"), Seq.empty).collect().head
    assert(out.getLong(1) == 1L && out.getLong(2) == 3L)
  }

  test("train-then-segment compresses the corpus it trained on") {
    // "ab" dominates: after training, every "ab" word is one subword
    val seg = Tokenizer.bpeSegmentOf(docs("ab ab ab ab", "ab cd"),
      Seq(("a", "b"))) // the rule bpeMergesOf learns first on this corpus
    val fert = seg.collect().map(_.getDouble(3))
    assert(fert.forall(_ <= 2.0) && fert.exists(_ == 1.0))
  }
}
