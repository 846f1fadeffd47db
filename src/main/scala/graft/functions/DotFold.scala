package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over numeric arrays: a strict left-to-right
  * fold of `sum_i (double) a(i) * (double) b(i)`.
  *
  * This is a drop-in for the engine-portable higher-order-function twin
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)` — bit-identical by construction (same element order, same
  * IEEE double ops: cast, multiply, then accumulate), which is what keeps
  * the DuckDB oracle hash-parity intact. The HOF twin stays as the
  * documentation/oracle form; this expression exists because Spark's array
  * higher-order functions are `CodegenFallback` (interpreted lambda per
  * element + an allocated intermediate array from `zip_with`), which is the
  * hot inner loop of every cosine-scored ANN/near-dup operator. Here the
  * whole fold compiles into the enclosing WholeStageCodegen loop: no
  * allocation, no virtual calls.
  *
  * Null semantics replicate the HOF twin exactly: null array → null;
  * length mismatch (zip_with pads with null) → null; any null element →
  * null; both empty → 0.0.
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val an = a.numElements(); val bn = b.numElements()
    val n = math.max(an, bn)
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (i >= an || i >= bn || a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("a"); val b = ctx.freshName("b")
    val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val acc = ctx.freshName("acc"); val bad = ctx.freshName("anyNull")
    def getter(v: String, t: DataType) =
      if (t == FloatType) s"(double) $v.get${"Float"}($i)" else s"$v.getDouble($i)"
    val ax = getter(a, elemType(left))
    val by = getter(b, elemType(right))
    val arrayData = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          $arrayData $a = ${leftGen.value};
          $arrayData $b = ${rightGen.value};
          int $an = $a.numElements();
          int $bn = $b.numElements();
          int $n = Math.max($an, $bn);
          boolean $bad = false;
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($i >= $an || $i >= $bn || $a.isNullAt($i) || $b.isNullAt($i)) {
              $bad = true; break;
            }
            $acc += $ax * $by;
          }
          if (!$bad) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
