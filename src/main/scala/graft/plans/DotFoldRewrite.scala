package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.DotFold

/** Optimizer rule: canonicalize the engine-portable higher-order-function
  * dot product
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0d, (acc, v) => acc + v)` into the native codegen'd [[DotFold]].
  *
  * The HOF form is how the fold is written in portable/oracle code (and how
  * a user of the library would naturally write it), but Spark's array
  * higher-order functions are `CodegenFallback`: an interpreted lambda per
  * element plus the intermediate array `zip_with` allocates. DotFold is
  * bit-identical (same element order, same IEEE ops — DotFoldSpec) and
  * compiles into the enclosing WholeStageCodegen loop, so the rewrite is a
  * pure plan improvement with no semantic surface.
  *
  * Matching is deliberately narrow — exact zero literal, exact
  * multiply-of-the-two-lambda-variables shape (bare or cast-to-double),
  * exact `acc + v` merge, identity finish, float/double array inputs —
  * anything else is left untouched (asserted in PlanRuleSpec). Registered
  * through `SparkSessionExtensions.injectOptimizerRule` by
  * [[graft.GraftExtensions]].
  */
object DotFoldRewrite extends Rule[LogicalPlan] {

  private def isDotArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `v` itself (already double) or `cast(v as double)`. */
  private def isVarAsDouble(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
    case c: Cast if c.dataType == DoubleType => c.child match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
        if zero == 0.0 &&
          isDotArray(a.dataType) && isDotArray(b.dataType) &&
          isVarAsDouble(mul.left, x) && isVarAsDouble(mul.right, y) &&
          isVar(add.left, acc) && isVar(add.right, el) &&
          fin.exprId == facc.exprId =>
      DotFold(a, b)
  }
}
