package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches — the quantile twin of the HLL
  * distinct-count artifact (E109): `percentile_approx` collapses to numbers
  * at aggregation time, but a long-lived pipeline wants the SKETCH as the
  * artifact — built per shard / per micro-batch / per partition-day,
  * persisted as bytes, unioned at read time, with new data folded in by
  * another union instead of a rescan. Backed by the Apache Datasketches KLL
  * implementation already shipped with Spark (wire format readable outside
  * the JVM ecosystem).
  *
  * Three functions registered by [[graft.GraftExtensions]]:
  *  - `graft_kll_agg(value, k)` — aggregate doubles into a sketch (binary);
  *  - `graft_kll_merge(sketch)` — aggregate serialized sketches by union;
  *  - `graft_kll_quantiles(sketch, array(q...))` — read quantiles out.
  *
  * Honesty note (the E109 convention): KLL compaction is RANDOMIZED by
  * design (the sketch library draws coin flips when a compactor level
  * fills), so past ~k retained items two runs over identical data may
  * return quantiles that differ within the published rank-error bound
  * (~1.65%/√(k/200) at k=200) — unlike every oracle-gated operator in this
  * repo, which is why the sketch surface is spec-gated with exactness
  * asserted only below the compaction threshold and error-bound assertions
  * above it.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_agg expects a double value, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Union of serialized KLL sketches (differing k merge to the smallest —
  * the library's rule; the buffer's own `k` participates, so it must be
  * >= the inputs' k to be accuracy-neutral). Corrupt sketch bytes fail
  * the job loudly by design: a sketch column is a TYPED artifact this
  * engine wrote, not untrusted input — swallowing a heapify failure
  * would silently drop that shard's contribution (contrast MediaDecoder,
  * where payloads are untrusted by nature and degrade to "raw"). */
case class KllMergeAgg(
    child: Expression,
    k: Int = KllQuantiles.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge expects a binary sketch, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_merge"

  // the buffer's k caps the merged accuracy (KLL merges resolve to the
  // SMALLEST k involved): a buffer k below an input sketch's k would
  // silently degrade that sketch to the buffer's accuracy, so update()
  // reads each input's k from its own header and fails the job loudly
  // on a mismatch instead (silent accuracy loss is a bug, not a mode)
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val in = KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (in.getK > k) throw new IllegalArgumentException(
        s"graft_kll_merge: input sketch built at k=${in.getK} but the merge " +
          s"buffer has k=$k — merging would silently degrade accuracy to " +
          s"k=$k (smallest-k-wins). Pass k >= ${in.getK} " +
          "(AnalyticsOps.kllMergeSketchesK).")
      buffer.merge(in)
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Quantile readout: `graft_kll_quantiles(sketch, array(0.5, 0.99))` →
  * array of doubles (null for an empty sketch). Runs on sketch tables
  * (key-sized), so the CodegenFallback eval is off every hot path. */
case class KllQuantiles(left: Expression, right: Expression)
  extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
      right.dataType.isInstanceOf[ArrayType] &&
      right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_kll_quantiles expects (binary, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val qs = right.eval(input)
    if (s == null || qs == null) return null
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(s.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) return null
    val arr = qs.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(arr.map(q => sketch.getQuantile(q)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object KllQuantiles {
  val DefaultK = 200
}
