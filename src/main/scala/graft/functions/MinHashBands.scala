package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document MinHash band signatures: one compiled pass over a
  * doc's shingle-hash array computes all `bands × rowsPerBand` affine
  * permutation minima AND assembles the `bands` band-signature strings —
  * what the relational formulation spelled as explode(hs) →
  * groupBy(doc_id).agg(128 × min(minhashPerm)) → 32 × concat_ws.
  *
  * Like SimHash, MinHash is a PER-DOCUMENT function: every signature
  * depends only on the doc's own shingle hashes, yet the aggregate
  * formulation shuffled one row per shingle through a 128-buffer hash
  * aggregate just to come back to one row per doc. This scan computes the
  * signatures where the shingles already are — no explode, no exchange,
  * no aggregate — the shape that survives 100 TB because the shingle
  * stream never leaves the input partition. (The HOF rewrite rejected in
  * [[graft.operators.DedupOps.minhashSignatures]]'s scaladoc lost because
  * `transform` is INTERPRETED, h array allocations per row; this is the
  * compiled version of the same idea — |hs| × h fused multiply-mod-min
  * steps, zero intermediate arrays.)
  *
  * Bit-equivalence contract with the aggregate + concat_ws formulation
  * (pinned by [[graft.MinHashBandsSpec]]): sig_j = min over the doc's
  * non-null hashes of [[Hashing.minhashPerm]]'s affine map
  * `((h % P) * a_j + b_j) % P`; band b's string = the decimal sig values
  * `b*rowsPerBand .. b*rowsPerBand+rowsPerBand-1` joined with `_`
  * (`concat_ws` semantics: null sigs — possible only when every element
  * of `hs` is null — are skipped, so an all-null doc yields "" like the
  * all-null aggregate row). Callers filter empty/null `hs` to match
  * explode dropping those docs. Null array → null.
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashBands.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {

  /** Affine coefficient pairs (a_j, b_j) for j < numHashes — exactly
    * [[Hashing.minhashPerm]]'s derivation, precomputed once per distinct
    * numHashes (one cache hit per ROW thereafter; the per-row work is the
    * |hs| × numHashes inner loop, not this lookup). */
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  private val P = Hashing.MinhashPrime   // 4294967291, < 2^32
  private val CoefPrime = Hashing.CoefPrime // < 2^30

  private def coefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, { n =>
      val a = new Array[Long](n)
      val b = new Array[Long](n)
      var i = 0
      while (i < n) {
        a(i) = (2654435761L * (i + 1) + 1) % CoefPrime + 1
        b(i) = (40503L * (i + 7) + 2654435769L) % P
        i += 1
      }
      (a, b)
    })

  def compute(hs: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val numHashes = bands * rowsPerBand
    val (a, b) = coefs(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hs.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        seen = true
        // hash60 values are non-negative, so % matches the Column chain's
        // remainder on every real input; coefficients < 2^30 keep every
        // product under 2^62 — exact, no overflow (Hashing.scala:46-48)
        val hm = hs.getLong(i) % P
        var j = 0
        while (j < numHashes) {
          val v = (hm * a(j) + b(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 11)
    var bd = 0
    while (bd < bands) {
      sb.setLength(0)
      if (seen) {
        var r = 0
        while (r < rowsPerBand) {
          if (r > 0) sb.append('_')
          sb.append(mins(bd * rowsPerBand + r))
          r += 1
        }
      } // all-null doc: every sig null -> concat_ws skips them all -> ""
      out(bd) = UTF8String.fromString(sb.toString)
      bd += 1
    }
    new GenericArrayData(out)
  }
}
