package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document 60-bit SimHash: one compiled pass computes what the
  * Column formulation spelled as explode(tokens) → per-token hash60 → a
  * 60-column conditional-sum aggregate → bit reassembly.
  *
  * The plan argument is the point, not just the constant: SimHash is a
  * PER-DOCUMENT function — every vote depends only on the document's own
  * tokens — yet the relational formulation shuffled one (doc_id, hash)
  * row per token through a hash aggregate (at sf10, ~5·10⁷ rows through
  * a 60-buffer aggregate just to come back to one row per doc). A
  * per-row expression computes the fingerprint where the text already
  * is: no explode, no exchange, no aggregate — the shape that scales to
  * 100 TB because the token stream never leaves the input partition.
  *
  * Bit-equivalence contract with the aggregate formulation (pinned by
  * [[graft.SimHashScanSpec]] on adversarial + randomized corpora):
  * tokens are `split(trim(text), "\s+")` with Spark semantics — trim
  * strips 0x20 only, Java split keeps leading/trailing empties at limit
  * −1 (so `""` contributes one empty token, exactly like the Column
  * chain); each token votes with the 60 bits of [[Hash60]] (+1 set, −1
  * clear, duplicates vote each occurrence); fingerprint bit j is set iff
  * vote j is strictly positive. Null text → null (callers filter, which
  * reproduces explode(null) dropping the row).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {

  /** Spark split()'s regex, precompiled once. Using the real Pattern (not
    * a hand-rolled scanner) guarantees token-boundary parity with the
    * Column chain by construction. */
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(u: UTF8String): Long = {
    val s = u.toString
    // Spark trim(): strip 0x20 only (NOT Java String.trim, which eats
    // every control char <= 0x20 and would move token boundaries)
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val toks = Ws.split(s.substring(lo, hi), -1)
    val votes = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      val h = Hash60.first60(
        toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
