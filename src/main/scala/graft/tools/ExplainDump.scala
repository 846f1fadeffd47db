package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump `.explain("formatted")` for a comma-separated list of
  * registry keys into per-key files — the before/after plan artifacts the
  * optimization rounds commit under plans/rNN/.
  * `sbt "runMain graft.tools.ExplainDump s03_ann_ivf,s06_pq_encode plans/r17 after [sfDir]"`
  * writes plans/r17/<key>_after.txt for each key. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val outDir = args(1)
    val tag = args(2)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, dir)
      val txt = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${key}_$tag.txt"), txt)
      println(s"[explain-dump] $key -> $outDir/${key}_$tag.txt " +
        s"(${"Exchange".r.findAllIn(txt).size} Exchange refs)")
    }
    spark.stop()
  }
}
