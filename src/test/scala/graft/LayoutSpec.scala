package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.DataLayout

/** Data-layout proofs: a partition-column filter must prune at the
  * directory level (PartitionFilters in the scan, only matching files
  * listed), not post-filter a full scan. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write: filters prune partitions, scan lists only matching files") {
    val path = Files.createTempDirectory("layout").toString
    val docs = (0L until 300L)
      .map(i => (i, Seq("en", "de", "zh")(i.toInt % 3), s"text $i"))
      .toDF("doc_id", "lang", "text")
    DataLayout.writePartitioned(docs, path, Seq("lang"), sortCols = Seq("doc_id"))

    // AQE off so the scan node is directly collectable from the plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val en = spark.read.parquet(path).filter(col("lang") === "en")
      val qe = en.queryExecution
      val plan = qe.executedPlan.toString
      // the filter must live IN the scan as a partition filter, not above it
      assert(plan.contains("PartitionFilters") && plan.contains("= en"), plan)
      qe.toRdd.count() // drive THIS plan instance so its metrics populate
      val scan = qe.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      // 3 partition files on disk, exactly 1 read
      assert(scan.metrics("numFiles").value === 1,
        s"expected 1 scanned file, got ${scan.metrics("numFiles").value}")
      assert(en.count() === 100)
      // no small-file explosion: one file per partition value
      assert(spark.read.parquet(path).inputFiles.length === 3)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("zOrder2: exact interleave on known bit patterns") {
    // identity quantization over [0, 65536): quant(v) == v
    def z(x: Double, y: Double): Long =
      Seq((x, y)).toDF("x", "y").repartition(1)
        .select(DataLayout.zOrder2(col("x"), 0, 65536, col("y"), 0, 65536))
        .head().getLong(0)
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)       // x bits land in even positions
    assert(z(0, 1) == 2L)       // y bits land in odd positions
    assert(z(3, 1) == 7L)       // 0b11 interleaved with 0b01
    assert(z(65535, 65535) == 0xFFFFFFFFL)
    assert(z(-5, 70000) == (0xAAAAAAAAL))  // clamps to (0, 65535)
  }

  test("zOrder2 sort clusters both dimensions (tighter per-chunk bounding boxes)") {
    val pts = for (i <- 0 until 64; j <- 0 until 64)
      yield (i.toDouble, j.toDouble)
    val df = pts.toDF("x", "y")
    val sorted = df
      .withColumn("z", DataLayout.zOrder2(col("x"), 0, 64, col("y"), 0, 64))
      .orderBy("z").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // 16 chunks of 256 rows: each Morton chunk should be a compact 2-D
    // region — bounding-box area far below the full 64x64 domain
    val areas = sorted.grouped(256).map { chunk =>
      val (xs, ys) = chunk.unzip
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
    }.toSeq
    assert(areas.forall(_ <= 64 * 64 / 8.0),
      s"chunks not clustered: areas=$areas")
    // a single-column sort cannot do this on the other axis: sorting by x
    // leaves every 256-row chunk spanning the full y range
    val bySingle = sorted.sortBy(_._1).grouped(256).map(_.map(_._2)).map(ys =>
      ys.max - ys.min + 1).toSeq
    assert(bySingle.forall(_ == 64.0))
  }

  test("partitioned write: filesPerPartition spreads a skewed value over tasks") {
    val path = Files.createTempDirectory("layout_skew").toString
    val docs = (0L until 400L).map(i => (i, "en", s"text $i")).toDF("doc_id", "lang", "text")
    DataLayout.writePartitioned(docs, path, Seq("lang"), filesPerPartition = 4)
    val files = spark.read.parquet(path).inputFiles
    // range boundaries are sample-based, so the split is approximate — the
    // guarantee is spread (>1 task), bounded by filesPerPartition
    assert(files.length >= 2 && files.length <= 4, files.mkString(","))
    assert(spark.read.parquet(path).count() === 400)
  }

  test("writePartitionedNoExchange: no added exchange, file count bounded " +
      "by tasks x values, maxRecordsPerFile caps file rows") {
    // the a36 sink contract: the grid-sized frame keeps the caller's
    // partitioning (sortWithinPartitions is a LOCAL sort), the fan-out is
    // one file per (task, value) plus record-cap splits — bounded, not an
    // accident of task count
    val df = (0L until 600L).map(i => (i, i % 3, s"v$i")).toDF("id", "day", "v")
      .repartition(4, col("id"))
    // plan shape: exactly the caller's own repartition exchange, nothing
    // added (string count — the AQE wrapper hides children from collect)
    val planStr = df.sortWithinPartitions(col("day"))
      .queryExecution.executedPlan.toString
    val exchanges = planStr.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"local sort added an exchange:\n$planStr")

    val path = Files.createTempDirectory("layout_ne").toString
    val n = DataLayout.writePartitionedNoExchange(df, path, "day",
      maxRecordsPerFile = 1000000L)
    assert(n === DataLayout.parquetFileCount(spark, path))
    // >= one file per day value, <= tasks x values
    assert(n >= 3 && n <= 12, s"file count $n outside [3, 12]")
    assert(spark.read.parquet(path).count() === 600)

    // a binding record cap splits but stays bounded: >= rows/cap files,
    // <= rows/cap + one remainder file per (task, value) cell
    val path2 = Files.createTempDirectory("layout_ne2").toString
    val n2 = DataLayout.writePartitionedNoExchange(df, path2, "day",
      maxRecordsPerFile = 25L)
    assert(n2 >= 24 && n2 <= 24 + 12, s"capped file count $n2 outside [24, 36]")
    // the cap is honored file by file
    val fs = spark.read.parquet(path2)
    val perFile = fs.groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 25L), s"a file exceeds the record cap")
    assert(fs.count() === 600)
  }

  test("compact: many small files rewrite to the byte-sized target count, content preserved") {
    val src = Files.createTempDirectory("layout_frag").toString
    val dest = Files.createTempDirectory("layout_compact").toString
    val df = (0L until 1000L).map(i => (i, s"row $i")).toDF("id", "v")
    df.repartition(20).write.mode("overwrite").parquet(src) // fragment: 20 files
    val bytes = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target = half the data per file -> expect exactly 2 output files
    val (before, after) = DataLayout.compact(spark, src, dest, (bytes + 1) / 2)
    assert(before === 20)
    assert(after === 2, s"expected 2 compacted files, got $after")
    val back = spark.read.parquet(dest)
    assert(back.count() === 1000)
    assert(back.agg(sum(col("id"))).head.getLong(0) === (0L until 1000L).sum)
  }
}
