package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared kernels for the per-row codebook scans ([[ArgMaxCos]],
  * [[ArgMaxCosGrouped]], [[PqCodes]]) — the compiled form of the IVF/PQ
  * assignment that `SimilarityOps` previously spelled as a broadcast
  * crossJoin + `groupBy(vec_id).agg(min(struct(...)))`.
  *
  * Why an expression and not the relational form: the argmax over a
  * (driver-known, codebook-sized) anchor set is a PER-ROW function of the
  * embedding, but the relational spelling pays a full-corpus exchange for
  * the `groupBy(vec_id)` — per Lloyd iteration, per assignment — purely to
  * reduce the k exploded candidate rows back to one. Scanning the anchors
  * inside one codegen'd loop removes that exchange outright (guide §2.4)
  * and the k-row explosion with it; at 100 TB the corpus never shuffles
  * for an assignment at all.
  *
  * Bit-equivalence contract with the relational form (pinned by
  * ArgMaxCosSpec): per anchor, acos = dot(e, a) / (sqrt(dot(e, e)) *
  * sqrt(dot(a, a))) with every dot the strict left-to-right double fold of
  * [[DotFold]] (anchor self-dots are precomputed per expression instance —
  * same value every row, same IEEE ops). The selected cell is the argmin
  * of (-acos, cell) under SPARK's double ordering (NaN greater than
  * everything and equal to itself, -0.0 == 0.0 — [[ArgMaxCos.cmpD]]), i.e.
  * exactly `min(struct((-acos).as("neg"), cell))` with ties to the lowest
  * cell. A null/short/null-element embedding makes every dot — and thus
  * every acos — null, and `min(struct(null, cell))` resolves the tie on
  * cell alone (nulls-first field ordering): the kernels return the first
  * candidate cell for those rows, which is the same answer.
  */
object ArgMaxCos {

  /** Spark SQL double comparison (SQLOrderingUtil semantics): -0.0 == 0.0,
    * NaN == NaN, NaN greater than any other value. */
  def cmpD(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else { // at least one NaN
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an && bn) 0 else if (an) 1 else -1
    }

  /** Strict left-to-right self-dot (DotFold's accumulation). */
  def selfDot(a: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * a(i); i += 1 }
    acc
  }

  /** Embedding extracted to doubles, or null when any dot against a
    * dim-length anchor would be null (null array, length mismatch, null
    * element) — the uniform-null case the scaladoc describes. */
  def extract(arr: ArrayData, dim: Int, isFloat: Boolean): Array[Double] = {
    if (arr == null || arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    v
  }

  /** Argmin of (-cos, cell) over entries [from, until) of the anchor set;
    * candidate entries are pre-sorted by cell ascending so a strict
    * replace keeps the lowest cell on ties. */
  def compute(arr: ArrayData, cells: Array[Int],
              anchors: Array[Array[Double]], sqrtNorms: Array[Double],
              isFloat: Boolean): Int = {
    val v = extract(arr, anchors(0).length, isFloat)
    if (v == null) return cells(0) // all acos null -> tie on cell
    val sne = math.sqrt(selfDot(v))
    var bestNeg = 0.0
    var bestCell = 0
    var first = true
    var i = 0
    while (i < anchors.length) {
      val a = anchors(i)
      var d = 0.0; var j = 0
      while (j < a.length) { d += v(j) * a(j); j += 1 }
      val neg = -(d / (sne * sqrtNorms(i)))
      if (first || cmpD(neg, bestNeg) < 0) {
        bestNeg = neg; bestCell = cells(i); first = false
      }
      i += 1
    }
    bestCell
  }

  /** [[compute]] restricted to the entries of slice [from, until) — the
    * row's group, located by the caller's slice index; cells ascend within
    * the slice so the strict replace keeps the lowest cell on ties. Null
    * (boxed) embedding degeneracies resolve to the slice's first (lowest)
    * cell — the relational `min(struct(null, cell))` answer. */
  def computeGrouped(arr: ArrayData, from: Int, until: Int,
                     cells: Array[Int], anchors: Array[Array[Double]],
                     sqrtNorms: Array[Double], isFloat: Boolean): Int = {
    val v = extract(arr, anchors(0).length, isFloat)
    if (v == null) return cells(from) // all acos null -> lowest cell
    val sne = math.sqrt(selfDot(v))
    var bestNeg = 0.0
    var bestCell = 0
    var first = true
    var i = from
    while (i < until) {
      val a = anchors(i)
      var d = 0.0; var j = 0
      while (j < a.length) { d += v(j) * a(j); j += 1 }
      val neg = -(d / (sne * sqrtNorms(i)))
      if (first || cmpD(neg, bestNeg) < 0) {
        bestNeg = neg; bestCell = cells(i); first = false
      }
      i += 1
    }
    bestCell
  }

  /** Group-slice index over a (grp, cell)-sorted parallel-array codebook:
    * (sorted distinct group ids, slice start, slice end). Requires the
    * groups array non-decreasing — [[graft.operators.SimilarityOps.collectGroupedCodebook]]'s
    * sort order. */
  def groupIndex(groups: Array[Int]): (Array[Int], Array[Int], Array[Int]) = {
    val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < groups.length) {
      require(ids.isEmpty || groups(i) > ids.last,
        s"groups array not sorted ascending at $i: ${groups(i)} after ${ids.last}")
      val g = groups(i)
      val start = i
      while (i < groups.length && groups(i) == g) i += 1
      ids += g; starts += start; ends += i
    }
    (ids.toArray, starts.toArray, ends.toArray)
  }

  /** Binary search for grp in the sorted slice-index ids; -1 = no such
    * (non-empty) group — the relational inner join dropped those rows. */
  def findGroup(ids: Array[Int], grp: Int): Int = {
    var lo = 0; var hi = ids.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = ids(mid)
      if (v == grp) return mid
      else if (v < grp) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  def sqrtNormsOf(anchors: Array[Array[Double]]): Array[Double] =
    anchors.map(a => math.sqrt(selfDot(a)))

  def checkEmb(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float>/array<double>, got ${t.catalogString}")
  }
}

/** Per-row max-cosine cell id against a driver-known codebook — the
  * exchange-free form of `SimilarityOps.ivfAssign`'s crossJoin +
  * `min(struct)` argmax (see [[ArgMaxCos$]] for the contract). `cells` and
  * `anchors` are parallel, sorted by cell ascending. */
case class ArgMaxCos(child: Expression, cells: Array[Int],
                     anchors: Array[Array[Double]])
    extends UnaryExpression {
  require(cells.nonEmpty && cells.length == anchors.length,
    s"graft_argmax_cos: ${cells.length} cells vs ${anchors.length} anchors")

  override def checkInputDataTypes(): TypeCheckResult =
    ArgMaxCos.checkEmb(child.dataType, prettyName)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_argmax_cos"
  override def flatArguments: Iterator[Any] = Iterator(child)
  override def toString: String = s"$prettyName($child, k=${cells.length})"

  @transient private lazy val sqrtNorms = ArgMaxCos.sqrtNormsOf(anchors)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ArgMaxCos.compute(
      if (v == null) null else v.asInstanceOf[ArrayData],
      cells, anchors, sqrtNorms, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val anchorsRef = ctx.addReferenceObj("anchors", anchors, "double[][]")
    val normsRef = ctx.addReferenceObj("sqrtNorms", sqrtNorms, "double[]")
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = graft.functions.ArgMaxCos.compute(
          ${c.isNull} ? null : ${c.value},
          $cellsRef, $anchorsRef, $normsRef, $isFloat);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[ArgMaxCos]] restricted per row to the anchors whose `groups` tag
  * equals the `grp` child — the exchange-free form of semDedupSampled's
  * broadcast-join-on-grp + `min(struct)` pruned assignment. Entries
  * arrive sorted by (group, cell), so each group is a contiguous slice
  * and a row costs O(log g) lookup + its own slice's cosines — the same
  * n·k/g work as the relational broadcast-hash join, not an O(k) tag
  * scan (the r17 lesson at sf100's k≈32k). Null when grp is null or
  * names an empty group (the relational inner join dropped those rows;
  * callers filter). */
case class ArgMaxCosGrouped(left: Expression, right: Expression,
                            cells: Array[Int], anchors: Array[Array[Double]],
                            groups: Array[Int])
    extends BinaryExpression {
  require(cells.nonEmpty && cells.length == anchors.length &&
    cells.length == groups.length,
    s"graft_argmax_cos_grouped: cells/anchors/groups lengths differ")

  @transient private lazy val (grpIds, grpStarts, grpEnds) =
    ArgMaxCos.groupIndex(groups)

  override def checkInputDataTypes(): TypeCheckResult =
    ArgMaxCos.checkEmb(left.dataType, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => right.dataType match {
        case IntegerType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName group tag must be int, got ${t.catalogString}")
      }
      case f => f
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cos_grouped"
  override def flatArguments: Iterator[Any] = Iterator(left, right)
  override def toString: String =
    s"$prettyName($left, $right, k=${cells.length})"

  @transient private lazy val sqrtNorms = ArgMaxCos.sqrtNormsOf(anchors)

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val g = right.eval(input)
    if (g == null) return null
    val gi = ArgMaxCos.findGroup(grpIds, g.asInstanceOf[Int])
    if (gi < 0) return null
    val v = left.eval(input)
    java.lang.Integer.valueOf(ArgMaxCos.computeGrouped(
      if (v == null) null else v.asInstanceOf[ArrayData],
      grpStarts(gi), grpEnds(gi), cells, anchors, sqrtNorms, isFloat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val anchorsRef = ctx.addReferenceObj("anchors", anchors, "double[][]")
    val normsRef = ctx.addReferenceObj("sqrtNorms", sqrtNorms, "double[]")
    val idsRef = ctx.addReferenceObj("grpIds", grpIds, "int[]")
    val startsRef = ctx.addReferenceObj("grpStarts", grpStarts, "int[]")
    val endsRef = ctx.addReferenceObj("grpEnds", grpEnds, "int[]")
    val gi = ctx.freshName("gi")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${r.isNull}) {
          int $gi = graft.functions.ArgMaxCos.findGroup($idsRef, ${r.value});
          if ($gi >= 0) {
            ${ev.isNull} = false;
            ${ev.value} = graft.functions.ArgMaxCos.computeGrouped(
              ${l.isNull} ? null : ${l.value},
              $startsRef[$gi], $endsRef[$gi],
              $cellsRef, $anchorsRef, $normsRef, $isFloat);
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-row product-quantization assignment against a driver-known PQ
  * codebook — the exchange-free form of `SimilarityOps.pqAssign`'s
  * explode + broadcast join + `groupBy(vec_id, sub).agg(min(struct))`.
  *
  * Output: array of m structs (code int, d double) where `code` is the
  * argmin of (|c|² − 2·dot(sv, c), code) over the sub's codes (SPARK
  * double ordering, ties to the lower code — exactly the relational
  * `min(struct(score, code))`) and `d` is the raw dot(sv, anchor_chosen)
  * double (the residual-scale term; callers quantize it in the DataFrame
  * with the same `round(d·1e9)` the relational form used). A sub whose
  * slice is short or carries a null element had every score null in the
  * relational form — tie to code 0 — and a null dot: the struct is
  * (0, null).
  *
  * Entries are grouped by sub via `subOffsets` (length m+1); within a sub,
  * codes ascend. Codes need not be dense (trained codebooks drop empty
  * codes). */
case class PqCodes(child: Expression, subOffsets: Array[Int],
                   codes: Array[Int], anchors: Array[Array[Double]],
                   norms: Array[Double])
    extends UnaryExpression {
  require(subOffsets.length >= 2 && subOffsets.head == 0 &&
    subOffsets.last == codes.length && codes.length == anchors.length &&
    norms.length == anchors.length,
    "graft_pq_codes: inconsistent codebook arrays")

  override def checkInputDataTypes(): TypeCheckResult =
    ArgMaxCos.checkEmb(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("code", IntegerType, nullable = false),
      StructField("d", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_codes"
  override def flatArguments: Iterator[Any] = Iterator(child)
  override def toString: String =
    s"$prettyName($child, m=${subOffsets.length - 1})"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqCodes.compute(if (v == null) null else v.asInstanceOf[ArrayData],
      subOffsets, codes, anchors, norms, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val offRef = ctx.addReferenceObj("subOffsets", subOffsets, "int[]")
    val codesRef = ctx.addReferenceObj("codes", codes, "int[]")
    val anchorsRef = ctx.addReferenceObj("anchors", anchors, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.PqCodes.compute(
            ${c.isNull} ? null : ${c.value},
            $offRef, $codesRef, $anchorsRef, $normsRef, $isFloat);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {

  def compute(arr: ArrayData, subOffsets: Array[Int], codes: Array[Int],
              anchors: Array[Array[Double]], norms: Array[Double],
              isFloat: Boolean): ArrayData = {
    val m = subOffsets.length - 1
    val subDim = anchors(0).length
    val n = if (arr == null) 0 else arr.numElements()
    val out = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      val start = sub * subDim
      // the sub's slice, or null when any dot over it would be null
      var sv: Array[Double] = null
      if (arr != null && start + subDim <= n) {
        sv = new Array[Double](subDim)
        var j = 0
        var ok = true
        while (ok && j < subDim) {
          if (arr.isNullAt(start + j)) { sv = null; ok = false }
          else {
            sv(j) = if (isFloat) arr.getFloat(start + j).toDouble
                    else arr.getDouble(start + j)
            j += 1
          }
        }
      }
      if (sv == null) {
        // every score null -> tie to the sub's first (lowest) code; d null
        out(sub) = InternalRow(codes(subOffsets(sub)), null)
      } else {
        var bestScore = 0.0
        var bestCode = 0
        var bestD = 0.0
        var first = true
        var i = subOffsets(sub)
        while (i < subOffsets(sub + 1)) {
          val a = anchors(i)
          var d = 0.0; var j = 0
          while (j < subDim) { d += sv(j) * a(j); j += 1 }
          val score = norms(i) - 2.0 * d
          if (first || ArgMaxCos.cmpD(score, bestScore) < 0) {
            bestScore = score; bestCode = codes(i); bestD = d; first = false
          }
          i += 1
        }
        out(sub) = InternalRow(bestCode, bestD)
      }
      sub += 1
    }
    new GenericArrayData(out)
  }
}
