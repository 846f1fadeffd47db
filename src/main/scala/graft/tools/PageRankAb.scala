package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproduction harness for the b46 checkpointInterval A/B recorded in
  * SCALING.md. Runs the b46 edge build + pageRank at each interval in ONE
  * JVM with interleaved trials (A,B,C,A,B,C,...) so C2 warm-up and page
  * cache drift hit every setting equally, prints per-trial seconds and the
  * median per setting, and asserts the pico-rank checksum is identical
  * across settings (the interval is a materialization knob — it must never
  * change results).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.PageRankAb 1,2,4 3"
  */
object PageRankAb {
  def main(args: Array[String]): Unit = {
    val intervals = args.headOption.getOrElse("1,2,4").split(',').map(_.trim.toInt).toSeq
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pagerank-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"), (col("o_custkey") + lit(1000000L)).as("dst"))

    def runOnce(ckpt: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = graft.operators.GraphOps.pageRank(edges, col("src"), col("dst"),
        iterations = graft.entry.OlapQueries.PageRankIters, checkpointInterval = ckpt)
      val sum = out.agg(org.apache.spark.sql.functions.sum("rank_pico")).head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      (sec, sum)
    }

    // one untimed warm-up so trial 1 of the first setting isn't the JVM's
    // first-ever codegen compile
    runOnce(intervals.head)

    val times = scala.collection.mutable.Map.empty[Int, Vector[Double]]
      .withDefaultValue(Vector.empty)
    var checksum: Option[Long] = None
    for (t <- 1 to trials; ck <- intervals) {
      val (sec, sum) = runOnce(ck)
      checksum match {
        case Some(c) => require(c == sum, s"pico-rank checksum drifted: $c vs $sum at ckpt=$ck")
        case None => checksum = Some(sum)
      }
      times(ck) = times(ck) :+ sec
      println(f"[ab] trial $t ckpt=$ck%d ${sec}%.2f s (checksum $sum)")
    }
    def median(v: Vector[Double]): Double = {
      val s = v.sorted; s((s.size - 1) / 2)
    }
    intervals.foreach { ck =>
      println(f"[ab] MEDIAN ckpt=$ck%d ${median(times(ck))}%.2f s over ${times(ck).size} trials: " +
        times(ck).map(x => f"$x%.2f").mkString(", "))
    }
    spark.stop()
  }
}
