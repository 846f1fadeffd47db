package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed-plan skeleton (exchanges + joins +
  * aggregates) of a registry query — the quick "is this the plan I'd
  * want at 100 TB" check.
  * `sbt "runMain graft.tools.ExplainKey b55_cooccur [sfDir]"` */
object ExplainKey {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(key)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println(s"[explain] EXCHANGES: " + "Exchange".r.findAllIn(plan).size)
    plan.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("HashAggregate") || l.contains("Window") ||
        l.contains("Sort "))
      .foreach(l => println("[explain] " + l.trim.take(160)))
  }
}
