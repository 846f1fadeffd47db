package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Distinct, Join, LocalRelation, RepartitionOperation, Sort, Window, Range => LogicalRange}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, FileTable}

/** Map-side parallelism guard for operators whose per-row work (shingle
  * construction, per-token hashing, heavy regexes) costs orders of magnitude
  * more than the row bytes. Spark sizes the map stage by INPUT SPLITS: a
  * small parquet file arrives as one split, so the expensive projection of
  * an otherwise perfectly scalable plan grinds through a single core — the
  * compute-bound cousin of the BroadcastNestedLoopJoin parallelism trap
  * (see jaccardPairsBrute / bruteForceTopK). At real scale the input arrives
  * in thousands of splits and this guard is a no-op branch; it only inserts
  * a (cheap, row-sized) round-robin exchange when the source is under-split
  * relative to the cluster.
  *
  * The gate reads the ANALYZED logical plan's leaves only — it must not pay
  * `df.rdd`, which forces full physical planning (finalized outside AQE) on
  * every operator invocation just to learn a partition count, with the plan
  * then re-planned from scratch for the real execution. File sources
  * estimate their split count from the relation's byte size via Spark's own
  * split formula; already-materialized RDD leaves (localCheckpoint results)
  * read the existing RDD's partition count for free. Callers wrap raw
  * SOURCES (see explodedShingleKeys), so leaves == the frame being gated.
  */
object Par {

  /** `df`, repartitioned to `defaultParallelism` iff its source leaves are
    * estimated to arrive in fewer splits (streaming frames pass through
    * untouched — micro-batch splits are the trigger's concern). Unknown
    * leaf shapes are treated as under-split: in this repo they only occur
    * for small in-memory frames, and a spurious row-sized exchange is
    * noise next to the per-row compute these operators exist to spread.
    *
    * DEMOTION GUARD: the leaf estimate cannot see partitioning raised
    * ABOVE the leaves by an upstream exchange (a repartition/join/agg in
    * the plan), so a transformed frame whose parallelism is already fine
    * could be wrapped in an exchange that REDUCES it. A
    * shuffle-introducing node in the analyzed plan therefore switches the
    * gate from the leaf estimate to the POST-SHUFFLE floor: such a
    * frame's partitioning is governed by `spark.sql.shuffle.partitions`
    * and AQE, never by source splits. The static floor usually clears
    * `defaultParallelism` — but AQE's coalescePartitions can shrink a
    * byte-small shuffle below it at runtime (down to 1 partition when the
    * whole output fits one minPartitionSize), which re-creates the
    * under-split trap for heavy per-row work DOWNSTREAM of a join/agg
    * (the Multimodal decode shape). So the skip is conditional: skip when
    * the static floor holds and either AQE coalescing is off or the
    * frame's optimizer size estimate says AQE cannot coalesce below the
    * floor; otherwise append an explicit `repartition(par)` — which AQE
    * never coalesces (user-specified), and which is a row-sized exchange
    * on exactly the byte-small frames the branch selects for.
    * Size over-estimates (join stats multiply) err toward skipping — the
    * pre-r11 behavior — never toward adding exchanges to big frames. */
  def ensure(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.isStreaming) df
    // an explicit repartition/coalesce in the plan is the caller's own
    // partitioning decision — AQE never coalesces user-specified
    // repartitions, so the floor cannot be broken at runtime, and wrapping
    // would demote (the r10 guard's original scenario)
    else if (df.queryExecution.analyzed.exists {
      case _: RepartitionOperation => true
      case _ => false
    }) df
    else if (df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Window |
           _: Distinct | _: Deduplicate => true
      case s: Sort => s.global
      case _ => false
    }) {
      if (postShuffleFloorHolds(df, par)) df else df.repartition(par)
    }
    else {
      estimatedSourceSplits(df) match {
        case Some(n) if n >= par => df
        case _                   => df.repartition(par)
      }
    }
  }
  // r17 audited: a deterministic whole-row-hash repartition (to skip
  // round-robin's sortBeforeRepartition local sort) was A/B'd and REJECTED —
  // the hash expression references EVERY column, defeating column pruning
  // at the scan (b48's ReadSchema grew 7 -> 11 columns), and the sort's
  // cost was not measurable on these row-sized frames (b12 stage: 0.62 s
  // round-robin vs 0.77 s hash, both dominated by decode+write).

  /** True iff a shuffle-bearing frame is guaranteed at least `par`
    * partitions at runtime: the static `spark.sql.shuffle.partitions`
    * floor clears `par`, and — when AQE partition coalescing is enabled —
    * the optimizer's byte estimate keeps the coalescer above `par`
    * partitions too (AQE never coalesces a partition below its target
    * size: minPartitionSize under the default parallelismFirst policy,
    * advisoryPartitionSizeInBytes otherwise, so a frame estimated at
    * ≥ par × target bytes cannot land under par partitions). */
  private def postShuffleFloorHolds(df: DataFrame, par: Int): Boolean = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = df.sparkSession.sessionState.conf
    if (conf.numShufflePartitions < par) return false
    val aqeCoalesce = conf.adaptiveExecutionEnabled &&
      conf.coalesceShufflePartitionsEnabled
    if (!aqeCoalesce) return true
    val targetBytes =
      if (conf.getConf(SQLConf.COALESCE_PARTITIONS_PARALLELISM_FIRST))
        conf.getConf(SQLConf.COALESCE_PARTITIONS_MIN_PARTITION_SIZE)
      else conf.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    df.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(par.toLong * math.max(1L, targetBytes))
  }

  /** Estimated split count of `df`'s source leaves, without physical
    * planning. None = a leaf whose split count can't be read cheaply. */
  private def estimatedSourceSplits(df: DataFrame): Option[Int] = {
    val conf = df.sparkSession.sessionState.conf
    val par = df.sparkSession.sparkContext.defaultParallelism
    val leaves = df.queryExecution.analyzed.collectLeaves()
    if (leaves.isEmpty) return Some(1)
    // FilePartition's own sizing rule: small tables shrink the split size
    // toward openCostInBytes to fill the cluster, capped at
    // maxPartitionBytes — so a 17 MB parquet genuinely arrives in ~4
    // splits at the default 4 MB open cost, not 1. Spark charges the open
    // cost PER FILE when packing files into splits, so a multi-file source
    // (every ScaleData decade dir, any real partitioned table) arrives in
    // at least ~numFiles·openCost/maxSplit splits regardless of its byte
    // size — the r17 lesson: the bytes-only estimate said "2 splits" for a
    // 32-part 6 MB directory that Spark actually reads 32-way, and the
    // spurious spreading exchange cost b48/t09 over a second each at sf1
    // (same-session A/B). numFiles reads the relation's file index, which
    // the imminent scan materializes anyway.
    def fileSplits(sizeBytes: Long, numFiles: Long): Int = {
      val total = math.max(1L, sizeBytes) +
        math.max(0L, numFiles) * conf.filesOpenCostInBytes
      val maxSplit = math.min(conf.filesMaxPartitionBytes,
        math.max(conf.filesOpenCostInBytes, total / math.max(1, par)))
      ((total + maxSplit - 1) / maxSplit).min(Int.MaxValue).toInt
    }
    val counts = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => Some(fileSplits(fs.location.sizeInBytes,
          fs.location.inputFiles.length.toLong))
        case _                    => None
      }
      case v2: DataSourceV2Relation => v2.table match {
        case ft: FileTable => Some(fileSplits(ft.fileIndex.sizeInBytes,
          ft.fileIndex.inputFiles.length.toLong))
        case _             => None
      }
      case rdd: LogicalRDD  => Some(rdd.rdd.getNumPartitions)
      case _: LocalRelation => Some(1)
      case r: LogicalRange  => Some(r.numSlices.getOrElse(par))
      case _                => None
    }
    if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
  }
}
