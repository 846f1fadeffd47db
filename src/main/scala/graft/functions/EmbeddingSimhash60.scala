package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native 60-bit random-hyperplane sign sketch per embedding vector — the
  * compiled form of what `SimilarityOps.embeddingSimhash` spelled as
  * `transform(planes, w => graft_dot(emb, w))` + an `aggregate` bit fold.
  *
  * Like [[SimHash60]]/[[MinHashBands]], the sketch is a PER-ROW function,
  * but here the relational formulation's cost was not a shuffle — it was
  * INTERPRETATION: Spark's array higher-order functions carry no codegen,
  * so the 60-plane projection ran as 60 interpreted lambda calls per row
  * (each `graft_dot` falling back to `eval`) plus two allocated
  * intermediate arrays. This expression fuses the whole sketch into one
  * compiled 60×dim multiply-accumulate pass inside WholeStageCodegen —
  * zero allocations beyond one reused values buffer per row.
  *
  * Bit-equivalence contract with the HOF formulation (pinned by
  * [[graft.EmbeddingSimhashSpec]]): plane p's weight at position d is
  * ±1.0 by bit 0 of `Hashing.hash60Scalar("esh_" + p + "_" + d)` (the
  * reproducible-plane convention the DuckDB oracles replay); projection p
  * is the strict left-to-right IEEE-double fold of `(double) emb(d) *
  * w(d)` (exactly [[DotFold]]'s accumulation); fingerprint bit p is set
  * iff projection p > 0 under SPARK's comparison semantics (NaN is larger
  * than any numeric, so a NaN projection sets its bit — Java's `>` alone
  * would clear it). Null semantics REPLICATE the Column chain, which
  * never returns null: a null vector, a wrong-length vector, or any null
  * element makes every `graft_dot` projection null, every `> 0` test
  * false, and the folded fingerprint 0L — so this expression is
  * non-nullable and returns 0L for those inputs. (`preparedVectors`
  * filters such rows before any miner sees them; the 0-sketch contract
  * only matters for drop-in equivalence of the public helper.)
  */
case class EmbeddingSimhash60(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_embedding_simhash expects array<float>/array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_embedding_simhash"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else EmbeddingSimhash60.compute(v.asInstanceOf[ArrayData], dim, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.EmbeddingSimhash60.compute(${c.value}, $dim, $isFloat);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmbeddingSimhash60 {

  private val Planes = 60

  /** ±1.0 Rademacher plane weights for a given dim — the exact doubles the
    * HOF formulation ships as literals, derived once per distinct dim
    * (60×dim hash60Scalar calls, then a cache hit per row). */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]

  private def signs(dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent(dim, { d =>
      Array.tabulate(Planes, d) { (p, i) =>
        if ((Hashing.hash60Scalar(s"esh_${p}_$i") & 1L) == 0L) 1.0 else -1.0
      }
    })

  def compute(arr: ArrayData, dim: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    if (n != dim) return 0L // graft_dot length-mismatch null -> all bits 0
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0L // null element -> every projection null
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val w = signs(dim)
    var fp = 0L
    var p = 0
    while (p < Planes) {
      val wp = w(p)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += v(d) * wp(d)
        d += 1
      }
      // Spark SQL comparison semantics, not Java's: NaN is LARGER than any
      // numeric, so a NaN projection passes `> 0` and sets the bit
      if (acc > 0 || java.lang.Double.isNaN(acc)) fp |= (1L << p)
      p += 1
    }
    fp
  }
}
