package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token-distribution pass for Simpson diversity
  * (E66): one compiled scan tokenizes and produces
  * `(n_tokens, coll = Σ_type tf·(tf−1))` — what the Column formulation
  * spelled as split → array_sort → an interpreted run-length `aggregate`
  * fold (the HOF runs the lambda through the expression interpreter per
  * ELEMENT; at sf10 that constant dominated t25 exactly like the minhash
  * HOF counter-example in DedupOps).
  *
  * Equivalence contract with the Column chain (pinned by
  * [[graft.TokenDiversitySpec]]): tokens are `split(trim(text), "\s+")`
  * with Spark semantics (identical to [[SimHash60]]'s pinned tokenizer —
  * trim strips 0x20 only, limit −1 keeps `""` as one empty token);
  * `coll` is Σ tf·(tf−1) over token TYPES, which the fold computes as
  * Σ run·(run−1) over equal-runs of the sorted array — equal by algebra
  * for ANY total order, since only the grouping of equal tokens matters,
  * so this scan needs no sort at all: tokens are counted in a hash map
  * and the sum read off the counts. Both outputs are exact longs; the
  * collision-probability division stays in Column land, bit-identical to
  * the fold path. Null text → null struct (callers' `when` guards then
  * yield the same null columns as the Column chain).
  */
case class TokenDiversity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_diversity expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("coll", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_diversity"

  override protected def nullSafeEval(input: Any): Any =
    TokenDiversity.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenDiversity.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenDiversity {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    // Spark trim(): 0x20 only (see SimHash60.compute)
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val toks = Ws.split(s.substring(lo, hi), -1)
    val counts = new java.util.HashMap[String, Array[Long]](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val c = counts.get(toks(i))
      if (c == null) counts.put(toks(i), Array(1L)) else c(0) += 1
      i += 1
    }
    var coll = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val tf = it.next()(0)
      coll += tf * (tf - 1L)
    }
    new GenericInternalRow(Array[Any](toks.length.toLong, coll))
  }
}
