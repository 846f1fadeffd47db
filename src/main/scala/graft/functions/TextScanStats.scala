package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-row text-scan statistics: one compiled pass over the
  * code points replaces the regex chains behind token counting and
  * character-class fractions —
  * `struct(n_chars, alpha, digit, space, upper, symbol, ws_tokens,
  * bpe_tokens)`, all INT (the types `length()` / `size()` produce, so the
  * operator layer's output schemas don't move).
  *
  * Field-by-field bit-equivalence contracts (each mirrors the exact Column
  * formulation it replaces; [[graft.TextScanSpec]] pins them against the
  * regex originals on randomized unicode corpora):
  *
  *  - `n_chars` = `length(text)` — code point count.
  *  - `alpha/digit/space/upper/symbol` = the `length(t) −
  *    length(regexp_replace(t, re, ""))` counts for `[A-Za-z]`, `[0-9]`,
  *    `\s`, `[A-Z]`, `[^A-Za-z0-9\s]`. Java `\s` without UNICODE flags is
  *    exactly `[ \t\n\x0B\f\r]`; the negated class matches any OTHER code
  *    point (so non-ASCII letters count as `symbol`, same as the regex).
  *  - `ws_tokens` = `size(split(trim(text), "\\s+"))`. `trim` strips 0x20
  *    only; Java `split` with the default -1 limit keeps leading/trailing
  *    empty elements for non-zero-width separators, so the count is
  *    (maximal `\s` runs in the trimmed text) + 1 — including the empty
  *    string, where `split` returns `[""]` and the formula gives 0 + 1.
  *  - `bpe_tokens` = `size(regexp_extract_all(text,
  *    "[A-Za-z0-9]+|[^A-Za-z0-9\\s]", 0))`: leftmost-longest alternation ≡
  *    (maximal ASCII-alnum runs) + (code points neither ASCII-alnum nor
  *    `\s`).
  *
  * Why: the regex formulation of the character-class fractions rebuilt the
  * full document string five times per row (each `regexp_replace` allocates
  * a replacement just to measure its length), and the token counts
  * materialized an array of every token to take its size. At sf10 (500k
  * docs) those constants dominated t01/t23 (23 s / 53 s); one compiled scan
  * with no allocation does all eight counters inside WholeStageCodegen.
  *
  * Null string → null struct, matching `length(null)` / `size(null)` under
  * Spark 4 defaults.
  */
case class TextScanStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_text_scan expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = TextScanStats.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_text_scan"

  override protected def nullSafeEval(input: Any): Any =
    TextScanStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextScanStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextScanStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("space", IntegerType, nullable = false),
    StructField("upper", IntegerType, nullable = false),
    StructField("symbol", IntegerType, nullable = false),
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false)))

  @inline private def isJavaSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** One pass over the string's code points; invoked from both `eval` and
    * the generated code. */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length
    var n, alpha, digit, space, upper, symbol, bpe = 0
    var inAlnumRun = false
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val isUp = cp >= 'A' && cp <= 'Z'
      val isLo = cp >= 'a' && cp <= 'z'
      val isDig = cp >= '0' && cp <= '9'
      val isSp = isJavaSpace(cp)
      if (isUp) { upper += 1 }
      if (isUp || isLo) { alpha += 1 }
      if (isDig) { digit += 1 }
      if (isSp) { space += 1 }
      val alnum = isUp || isLo || isDig
      if (!alnum && !isSp) { symbol += 1 }
      if (alnum) {
        if (!inAlnumRun) { bpe += 1; inAlnumRun = true }
      } else {
        inAlnumRun = false
        if (!isSp) bpe += 1
      }
    }
    // ws_tokens over the 0x20-trimmed view: separator runs + 1. All `\s`
    // chars are BMP singletons, so charAt is code-point-exact here.
    var lo = 0
    var hi = len
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var wsRuns = 0
    var inWs = false
    var j = lo
    while (j < hi) {
      if (isJavaSpace(s.charAt(j))) {
        if (!inWs) { wsRuns += 1; inWs = true }
      } else inWs = false
      j += 1
    }
    new GenericInternalRow(Array[Any](
      n, alpha, digit, space, upper, symbol, wsRuns + 1, bpe))
  }
}
