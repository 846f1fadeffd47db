package graft

/** Dev tool: print the formatted physical plan of one or more SparkEntry
  * queries (plan-quality review — pushdown, broadcast choice, codegen spans).
  *
  * Usage: runMain graft.Explain <sfDir> <queryKey> [queryKey ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("graft-explain", cpus = "4")
    keys.foreach { k =>
      SparkEntry.queries.get(k) match {
        case Some(fn) =>
          println(s"\n========== $k ==========")
          try println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable => println(s"[explain] $k failed: ${e.getMessage}") }
        case None => println(s"unknown query: $k")
      }
    }
    spark.stop()
  }
}
