package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC + casefold normalization as a native expression: the
  * canonicalization pass a corpus dedup runs before shingling, so
  * "Café" typed with a precomposed é, "Café" typed with a
  * combining accent, and "CAFÉ" all hash to the same shingles.
  *
  * NFC (canonical composition) folds combining-mark encodings to one
  * canonical form; lowercasing uses the SIMPLE per-codepoint Unicode
  * mapping (locale-free, no Turkish-I trap, and identical to the
  * utf8proc mapping the DuckDB oracle's `lower()` applies — see
  * [[NormalizeText.normalize]]). A Scala UDF would do the same work
  * but drop the pipeline out of whole-stage codegen; this stays one
  * scalar call per row, like the engine's other native expressions.
  */
case class NormalizeText(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  /** Public so generated code can call it through the reference obj. */
  def normalize(u: UTF8String): UTF8String =
    UTF8String.fromString(NormalizeText.normalize(u.toString))

  override protected def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normalizeText", this, classOf[NormalizeText].getName)
    defineCodeGen(ctx, ev, c => s"$self.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def normalize(s: String): String = {
    // Skip the (allocating) normalizer for already-NFC text — the
    // overwhelmingly common case for real corpora.
    val nfc = if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)
    // SIMPLE (per-codepoint) case mapping, not String.toLowerCase:
    // the full algorithm applies context rules (word-final Greek Σ → ς)
    // and 1:N expansions (İ → i + combining dot) that utf8proc-based
    // engines (the DuckDB oracle's lower()) do not — the normalized
    // text must compare equal across engines, like every other
    // cross-checked numeric in this library.
    var i = 0
    var changed = false
    while (i < nfc.length && !changed) {
      val cp = nfc.codePointAt(i)
      if (Character.toLowerCase(cp) != cp) changed = true
      else i += Character.charCount(cp)
    }
    if (!changed) nfc
    else {
      val sb = new java.lang.StringBuilder(nfc.length)
      var j = 0
      while (j < nfc.length) {
        val cp = nfc.codePointAt(j)
        sb.appendCodePoint(Character.toLowerCase(cp))
        j += Character.charCount(cp)
      }
      sb.toString
    }
  }
}
