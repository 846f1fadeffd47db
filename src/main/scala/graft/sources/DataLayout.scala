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
    * rows sorted by `sortCols` within each output file. One file per
    * (shuffle partition × partition value); repartitioning on the partition
    * columns first keeps file counts at one per value combo — a 1000-way
    * lang split should not produce 1000 × shuffle-partitions small files
    * (the classic small-file explosion). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil): Unit = {
    val repart = df.repartition(partitionCols.map(F.col): _*)
    val sorted =
      if (sortCols.isEmpty) repart
      else repart.sortWithinPartitions((partitionCols ++ sortCols).map(F.col): _*)
    sorted.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
