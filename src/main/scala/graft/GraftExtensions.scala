package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.operators.Dedup
import graft.plans.{CharNgramHashes, CosineSimilarity, L2Squared, MinHashSignature, NormalizeText, ShingleHashes, SignPackBits, SimHash64, SortedIntersectSize}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works like any built-in.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard plugin path — [[GraftExtensions]] is a pure
  *    `SparkSessionExtensions => Unit`);
  *  - [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftFunctions {

  /** (identifier, info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` takes. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinHashSignature(children.head, Dedup.perm.map(_._1), Dedup.perm.map(_._2), Dedup.P)),
    (FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[Expression]) => NormalizeText(children.head)),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      // Same shingle width / modulus as the dedup pipeline, over
      // normalized text — SQL users get the library's exact semantics.
      (children: Seq[Expression]) =>
        ShingleHashes(NormalizeText(children.head), 3, Dedup.P)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (FunctionIdentifier("char_ngram_hashes"),
      new ExpressionInfo(classOf[CharNgramHashes].getName, "char_ngram_hashes"),
      // Trigram width, matching the corpus-LM scorer; occurrence-
      // preserving (NOT deduplicated), unlike shingle_hashes.
      (children: Seq[Expression]) => CharNgramHashes(children.head, 3)),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => SortedIntersectSize(children(0), children(1))),
    (FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_sq"),
      (children: Seq[Expression]) => L2Squared(children(0), children(1))),
    (FunctionIdentifier("sign_pack_bits"),
      new ExpressionInfo(classOf[SignPackBits].getName, "sign_pack_bits"),
      // sign_pack_bits(embedding, from): 32 sign bits starting at
      // 0-based element `from`, packed little-endian into a BIGINT.
      // `from` shapes the expression itself, so it must be a literal
      // integer — reject anything else at resolution time with a
      // message, not a deep eval() crash.
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"sign_pack_bits(array<float>, from) takes 2 arguments, got ${children.length}")
        val from = children(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
            if lit.value.isInstanceOf[Number] =>
            val v = lit.value.asInstanceOf[Number].longValue()
            require(v >= 0 && v <= Int.MaxValue,
              s"sign_pack_bits 'from' out of range: $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"sign_pack_bits 'from' must be an integer literal, got: ${other.sql}")
        }
        SignPackBits(children(0), from)
      }))

  /** Register on a live session. `sessionState`/`functionRegistry` are
    * Scala-`private[sql]` but bytecode-public (same situation as
    * [[graft.plans.ColumnBridge]]); bound reflectively, driver-side
    * only, zero per-row cost. */
  def register(spark: SparkSession): Unit = {
    val ss = spark.getClass.getMethod("sessionState").invoke(spark)
    val fr = ss.getClass.getMethod("functionRegistry").invoke(ss)
    val m = fr.getClass.getMethods.find(m =>
      m.getName == "registerFunction" && m.getParameterCount == 3 &&
        m.getParameterTypes()(1) == classOf[ExpressionInfo])
      .getOrElse(sys.error("no (FunctionIdentifier, ExpressionInfo, builder) registerFunction found"))
    descriptors.foreach { case (id, inf, builder) => m.invoke(fr, id, inf, builder) }
  }
}
