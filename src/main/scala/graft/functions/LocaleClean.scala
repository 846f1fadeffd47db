package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd locale-numeric cleanup: one compiled pass replaces the
  * `translate → regexp_replace(lookahead) → translate` chain behind
  * [[Exprs.localeNumeric]] (reference semantics: istat_utils.py:39-45,
  * pandas `errors="coerce"` after European-locale normalization).
  *
  * Bit-equivalence contract with the Column formulation it replaces
  * (pinned on adversarial + randomized corpora by [[graft.LocaleCleanSpec]]):
  *
  *  1. strip exactly Java `\s` (`[ \t\n\x0B\f\r]`) plus NBSP (U+00A0) —
  *     what `translate(s, " \t\n\f\r ", "")` removes;
  *  2. on the stripped text, drop every `.` matched by
  *     `\.(?=\d{3}(\D|$))` — a dot followed by exactly-3-then-no-more
  *     ASCII digits (a thousands separator), where `\d` is ASCII-only
  *     (Java default, no UNICODE_CHARACTER_CLASS) and the lookahead is
  *     zero-width so the scan resumes right after the dot;
  *  3. then map `,` → `.` (decimal comma). Order matters: a `,` must not
  *     be swapped before the thousands pass or "1,234" would lose its
  *     decimal point. The swap cannot create a new thousands match
  *     because the lookahead only inspects digit-ness, which `,` and `.`
  *     share (both non-digits).
  *
  * The caller still finishes with `try_cast("double")` — Spark's own cast
  * owns number parsing (exponents, infinities, null-on-malformed under
  * ANSI), this expression only canonicalizes the locale.
  *
  * Why native: the regex pass rebuilt the row string through a full
  * automaton with backtracking lookahead; at sf10 (6M rows) that constant
  * dominated b04 (53 s in the r10 sweep) exactly like the regex chains
  * TextScanStats killed for t01/t23. All relevant chars are BMP singletons,
  * so the scan is a plain char loop inside WholeStageCodegen.
  *
  * Null string → null, matching the Column chain on null input.
  */
case class LocaleClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_locale_clean expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_locale_clean"

  override protected def nullSafeEval(input: Any): Any =
    LocaleClean.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LocaleClean.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LocaleClean {

  @inline private def isStripped(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' ||
      c == '\r' || c == ' '

  /** One pass strip + one pass separator rewrite; invoked from both `eval`
    * and the generated code. Surrogate-safe: every char this function
    * inspects ('.', ',', ASCII digits, the strip set) is a BMP singleton
    * that can never be half of a surrogate pair, so char-wise scanning
    * matches the regex's code-point semantics exactly. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    // pass 1: whitespace/NBSP strip into a char buffer
    val buf = new Array[Char](n)
    var m = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (!isStripped(c)) { buf(m) = c; m += 1 }
      i += 1
    }
    // pass 2: thousands-dot drop (dot + exactly-3-then-no-more digits,
    // the \.(?=\d{3}(\D|$)) lookahead) and decimal-comma swap
    @inline def dig(j: Int): Boolean = j < m && buf(j) >= '0' && buf(j) <= '9'
    val out = new java.lang.StringBuilder(m)
    var j = 0
    while (j < m) {
      val c = buf(j)
      if (c == '.' && dig(j + 1) && dig(j + 2) && dig(j + 3) && !dig(j + 4)) {
        // thousands separator: drop
      } else if (c == ',') out.append('.')
      else out.append(c)
      j += 1
    }
    UTF8String.fromString(out.toString)
  }
}
