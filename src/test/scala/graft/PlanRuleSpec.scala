package graft

import org.apache.spark.sql.functions._
import graft.functions.DotFold
import graft.operators.SimilarityOps

/** DotFoldRewrite: the injected optimizer rule must rewrite exactly the
  * HOF dot-fold shape — and nothing else — into the native expression. */
class PlanRuleSpec extends SparkSpec {
  import spark.implicits._

  // repartition blocks ConvertToLocalRelation from eagerly evaluating the
  // projection — a 1-row local Seq would otherwise constant-fold to a
  // LocalRelation before any expression is left to rewrite (file-backed
  // frames, the real case, never collapse this way)
  private lazy val df =
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .repartition(1)

  private def hasDotFold(frame: org.apache.spark.sql.DataFrame): Boolean =
    frame.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotFold]))

  test("the HOF dot fold is rewritten to DotFold and evaluates identically") {
    val hof = df.select(SimilarityOps.dotHof(col("a"), col("b")).as("d"))
    assert(hasDotFold(hof), "optimizer should canonicalize the HOF fold")
    assert(hof.head().getDouble(0) == 32.0)
    // double arrays (no cast inside the lambda) are matched too
    val dd = df.select(col("a").cast("array<double>").as("ad"),
        col("b").cast("array<double>").as("bd"))
      .select(aggregate(zip_with(col("ad"), col("bd"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(hasDotFold(dd), "plain double fold should also canonicalize")
    assert(dd.head().getDouble(0) == 32.0)
  }

  test("near-miss folds are left untouched") {
    // different merge (acc + 2*v), different zero, non-product lambda
    val wrongMerge = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v * lit(2.0)).as("d"))
    val wrongZero = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    val wrongLambda = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") + y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    for ((f, what) <- Seq((wrongMerge, "merge"), (wrongZero, "zero"), (wrongLambda, "lambda"))) {
      assert(!hasDotFold(f), s"$what variant must not be rewritten")
    }
    assert(wrongMerge.head().getDouble(0) == 64.0)
    assert(wrongZero.head().getDouble(0) == 33.0)
    assert(wrongLambda.head().getDouble(0) == 21.0)
  }
}
