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
}
