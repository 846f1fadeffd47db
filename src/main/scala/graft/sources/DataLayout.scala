package graft.sources

import org.apache.spark.sql.{DataFrame, functions => F}

/** Write-side data layout for scan-heavy tables: Hive-style partition
  * directories for coarse pruning, in-file ordering for parquet row-group
  * (min/max) pruning. At 100 TB the cheapest query is the one that never
  * reads the bytes: a `lang = 'en'` filter over a lang-partitioned corpus
  * lists only the `lang=en/` directory (proven in LayoutSpec via the plan's
  * PartitionFilters + the scanned file list), and a range predicate over a
  * sorted column skips whole row groups via footer statistics. */
object DataLayout {

  /** Write `df` partitioned by `partitionCols` (directory per value combo),
    * rows sorted by `sortCols` within each output file, ~`filesPerPartition`
    * files per value combo (range boundaries are sample-based, so the split
    * is approximate).
    *
    * Repartitioning on the partition columns first avoids the classic
    * small-file explosion (shuffle-partitions × values files) — but it also
    * funnels each value through `filesPerPartition` tasks, so a skewed
    * value (the billion-row `lang=en` stratum) needs `filesPerPartition`
    * raised to spread its sort/write across tasks; the slice is a
    * deterministic hash of the whole row, so re-runs produce identical
    * files. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil,
                       filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition > 0,
      s"filesPerPartition must be positive: $filesPerPartition")
    val sliced = df.withColumn("__slice",
      if (filesPerPartition == 1) F.lit(0)
      else F.pmod(F.xxhash64(F.struct(df.columns.map(F.col).toIndexedSeq: _*)),
        F.lit(filesPerPartition)))
    // range-partition with an EXPLICIT partition count: a column-only
    // repartition is subject to AQE coalescing (small writes collapse to one
    // task and the file-count contract silently breaks), and hash
    // partitioning collides distinct (value, slice) combos into shared
    // tasks. The count costs one distinct over the partition columns —
    // cheap next to the write it shapes.
    val nVals = df.select(partitionCols.map(F.col): _*).distinct().count().toInt
    val repart = sliced.repartitionByRange(
      math.max(1, nVals * filesPerPartition),
      (partitionCols :+ "__slice").map(F.col): _*)
    val sorted =
      if (sortCols.isEmpty) repart
      else repart.sortWithinPartitions((partitionCols ++ sortCols).map(F.col): _*)
    sorted.drop("__slice").write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
