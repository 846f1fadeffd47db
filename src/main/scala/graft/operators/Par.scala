package graft.operators

import org.apache.spark.sql.DataFrame

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
  */
object Par {

  /** `df`, repartitioned to `defaultParallelism` iff it currently has fewer
    * partitions (streaming frames pass through untouched — micro-batch
    * splits are the trigger's concern, and `.rdd` is illegal on them). */
  def ensure(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val sc = df.sparkSession.sparkContext
      if (df.rdd.getNumPartitions < sc.defaultParallelism)
        df.repartition(sc.defaultParallelism)
      else df
    }
  }
}
