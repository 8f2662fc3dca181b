package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextF
import graft.sources.Tables

/** Misra-Gries frequent-items sketch as a typed [[Aggregator]]: a
  * fixed-size (≤ k entries) mergeable summary with the classic
  * guarantee that every item of frequency > N/k is present in the
  * summary after ANY merge order (Misra & Gries '82; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS'12). Estimates
  * themselves are merge-order dependent, so the operator treats the
  * sketch only as a CANDIDATE SET and confirms with a second exact
  * pass — the output (all tokens with cnt·k > N) is deterministic and
  * oracle-checkable.
  *
  * 100 TB shape: pass 1 is a single fixed-size sketch per partition
  * merged map-side (the whole shuffle is ≤ k entries per partition);
  * pass 2 groups only rows matching the ≤ k broadcast candidates, so
  * the exact count never shuffles the full vocabulary the way
  * [[Corpus.vocabDfOf]] must.
  */
class MisraGries(k: Int) extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(k > 1, s"capacity must be > 1, got $k")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
    b.get(a) match {
      case Some(c) => b(a) = c + 1
      case None if b.size < k => b(a) = 1L
      case None =>
        // decrement-all; drop zeros (the classic k-sized MG step).
        // Iterate a SNAPSHOT: updating a mutable.HashMap's values
        // inside its own foreach corrupts the traversal (observed:
        // most entries silently skipped), so mutate only after copying
        // the entry set out.
        for ((t, c) <- b.toArray)
          if (c == 1) b.remove(t) else b(t) = c - 1
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1(t) = b1.getOrElse(t, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything, keep > 0
      // (Agarwal et al. merge rule); snapshot first — see reduce.
      val m = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      for ((t, c) <- b1.toArray)
        if (c - m <= 0) b1.remove(t) else b1(t) = c - m
    }
    b1
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {

  /** Tokens with frequency strictly above N/k, found with a
    * sketch-then-confirm plan: MG candidates (plus the exact total) in
    * one pass, then an exact count restricted to the ≤ k broadcast
    * candidates. The threshold compares as `cnt · k > N` — pure
    * integer arithmetic, no division to disagree across engines.
    */
  def heavyHittersOf(docs: DataFrame, k: Int = 30): DataFrame = {
    val toks = docs.select(explode(TextF.tokens(col("text"))).as("token"))
    val sketch = udaf(new MisraGries(k), Encoders.STRING)
    val pass1 = toks.agg(sketch(col("token")).as("sketch"),
      count(lit(1)).as("total"))
    val cand = pass1.select(explode(map_keys(col("sketch"))).as("token"),
      col("total"))
    toks.join(broadcast(cand), "token")
      .groupBy("token", "total")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > col("total"))
      .select(col("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHittersOf(Tables.documents(spark, dir))
}
