package graft.sources

import org.apache.spark.sql.{Column, DataFrame, functions => F}

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

  /** Write `df` Hive-partitioned by `partitionCol` WITHOUT an exchange —
    * the sink for frames whose no-shuffle plan is the point (a36's
    * generated LOCF grid: re-shuffling the biggest frame of the job to
    * control file counts would defeat the operator). Rows are sorted by
    * the partition column WITHIN each upstream task (a local sort, no
    * exchange), which makes each task's fan-out CONTIGUOUS — the writer
    * holds one open file at a time instead of one per live value — and
    * `maxRecordsPerFile` caps every file's rows, bounding file SIZE from
    * above. The explicit trade vs [[writePartitioned]]: file COUNT is
    * O(upstream tasks × values-per-task) (each task emits one file per
    * partition value it holds, plus record-cap splits), not
    * filesPerPartition — bounded and returned (LayoutSpec pins it), paid
    * deliberately to keep the grid off the wire. A too-fragmented result
    * feeds [[compact]] as the standard epilogue. Returns the written
    * parquet file count. */
  def writePartitionedNoExchange(df: DataFrame, path: String,
                                 partitionCol: String,
                                 maxRecordsPerFile: Long): Int = {
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive: $maxRecordsPerFile")
    df.sortWithinPartitions(F.col(partitionCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
    parquetFileCount(df.sparkSession, path)
  }

  /** Recursive parquet data-file count under `path` (partition dirs
    * included) — the number LayoutSpec-style file-count assertions pin. */
  def parquetFileCount(spark: org.apache.spark.sql.SparkSession,
                       path: String): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** 32-bit Morton (Z-order) key of two bounded coordinates: each is
    * quantized to 16 bits over its [lo, hi) range, bit-spread with the
    * classic magic-mask chain, and interleaved. Sorting a table by this key
    * clusters BOTH dimensions, so parquet row-group min/max stats prune 2-D
    * range predicates (lat AND lon) that a single-column sort can only
    * prune on one axis — the Delta `ZORDER BY` technique as a plain column
    * expression. Pure integer/float built-ins: codegen'd, engine-portable
    * (b33's DuckDB twin reproduces it bit-for-bit). */
  def zOrder2(x: Column, xLo: Double, xHi: Double,
              y: Column, yLo: Double, yHi: Double): Column = {
    require(xHi > xLo && yHi > yLo, s"empty range: [$xLo,$xHi) [$yLo,$yHi)")
    def quant(c: Column, lo: Double, hi: Double): Column =
      F.least(F.lit(65535L), F.greatest(F.lit(0L),
        F.floor((c - F.lit(lo)) / F.lit(hi - lo) * F.lit(65536.0)).cast("long")))
    def spread(v: Column): Column = {
      val a = v.bitwiseAND(F.lit(65535L))
      val b = a.bitwiseOR(F.shiftleft(a, 8)).bitwiseAND(F.lit(16711935L))
      val c = b.bitwiseOR(F.shiftleft(b, 4)).bitwiseAND(F.lit(252645135L))
      val d = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(858993459L))
      d.bitwiseOR(F.shiftleft(d, 1)).bitwiseAND(F.lit(1431655765L))
    }
    spread(quant(x, xLo, xHi))
      .bitwiseOR(F.shiftleft(spread(quant(y, yLo, yHi)), 1))
  }

  /** Compact a parquet directory's small files: size the target file
    * count from the directory's actual bytes (`ceil(bytes / targetBytes)`,
    * floor 1) and rewrite through a single coalesce — the maintenance job
    * behind every streaming sink and over-partitioned write (thousands of
    * KB-files turn scans into open/close storms and NameNode pressure; at
    * 100 TB, compaction IS the difference between a metadata-bound and an
    * IO-bound scan). `coalesce` (not repartition) merges without a
    * shuffle: partitions concatenate, row order within files is
    * preserved, and the write is one pass over the data. Rewrites to
    * `destPath` (staging-dir pattern — compacting in place would race
    * concurrent readers; the caller swaps paths atomically).
    * Returns (filesBefore, filesAfter). */
  def compact(spark: org.apache.spark.sql.SparkSession, srcPath: String,
              destPath: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val hPath = new org.apache.hadoop.fs.Path(srcPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcPath).coalesce(nOut)
      .write.mode("overwrite").parquet(destPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(destPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  /** Write `df` as parquet sorted by the [[zOrder2]] key of the two
    * coordinate columns — one range shuffle on the key, then in-file order
    * gives every row group a tight 2-D bounding box. */
  def writeZOrdered(df: DataFrame, path: String,
                    x: Column, xLo: Double, xHi: Double,
                    y: Column, yLo: Double, yHi: Double,
                    numFiles: Int = 1): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("__z", zOrder2(x, xLo, xHi, y, yLo, yHi))
      .repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
