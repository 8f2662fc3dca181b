package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Counting-only BPE pre-tokenizer: returns how many tokens
  * `TextF.BpeTokenPattern` would extract, WITHOUT materializing them.
  *
  * `size(regexp_extract_all(text, pattern, 0))` builds a UTF8String
  * per token plus the array holding them just to take its length —
  * allocation per token across the whole corpus. At 100 TB the count
  * is the only thing anyone reads (corpus costing, fertility, dataset
  * cards), so this expression walks the text once in generated code
  * and allocates nothing.
  *
  * The scanner replicates the regex exactly. The pattern's four
  * alternatives (` ?\p{L}+`, ` ?\p{N}+`, ` ?[^ \t\n\f\r\p{L}\p{N}]+`,
  * `[ \t\n\f\r]+`) are first-char-disjoint once one character of
  * lookahead resolves a leading space, so leftmost-greedy alternation
  * reduces to a single-pass decision per token start:
  *
  *  - letter → letter run; digit-class → digit run
  *  - ' ' followed by letter / digit-class / other-symbol → the space
  *    joins that run (the " ?" prefix); ' ' followed by whitespace or
  *    end of input → whitespace run (alternative 4)
  *  - tab/LF/FF/CR → whitespace run
  *  - anything else (incl. vertical tab, excluded from the explicit
  *    whitespace class for RE2/Java parity — see BpeTokenPattern's
  *    scaladoc) → other-symbol run
  *
  * \p{L} = Character.isLetter (Lu/Ll/Lt/Lm/Lo); \p{N} = general
  * categories Nd/Nl/No — Character.isDigit covers only Nd, so the
  * digit class goes through getType. Both are codepoint properties:
  * the scan iterates codepoints, not chars, so supplementary-plane
  * letters (e.g. Deseret) count as one letter, exactly as the regex
  * sees them. Equivalence to the regex is property-tested in
  * TextAnalysisSpec over unicode-heavy generated strings.
  */
case class BpeTokenCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  // The explicit whitespace class [ \t\n\f\r] — NOT \s (no VT).
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  private def isNum(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** Public so generated code can call it through the reference obj. */
  def countTokens(u: UTF8String): Int = {
    val s = u.toString
    val len = s.length
    var i = 0
    var count = 0
    while (i < len) {
      var cp = s.codePointAt(i)
      // A leading ' ' attaches to a following letter/digit/symbol run;
      // before whitespace or end-of-input it starts a whitespace run.
      if (cp == ' ' && i + 1 < len && !isWs(s.charAt(i + 1))) {
        i += 1
        cp = s.codePointAt(i)
      }
      if (Character.isLetter(cp)) {
        while (i < len && Character.isLetter({ cp = s.codePointAt(i); cp }))
          i += Character.charCount(cp)
      } else if (isNum(cp)) {
        while (i < len && isNum({ cp = s.codePointAt(i); cp }))
          i += Character.charCount(cp)
      } else if (isWs(s.charAt(i))) {
        while (i < len && isWs(s.charAt(i))) i += 1
      } else {
        // other-symbol run: anything outside [ \t\n\f\r], \p{L}, \p{N}
        while (i < len && !isWs(s.charAt(i)) && {
          cp = s.codePointAt(i); !Character.isLetter(cp) && !isNum(cp)
        }) i += Character.charCount(cp)
      }
      count += 1
    }
    count
  }

  override protected def nullSafeEval(input: Any): Any =
    countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeTokenCount", this, classOf[BpeTokenCount].getName)
    defineCodeGen(ctx, ev, c => s"$self.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
