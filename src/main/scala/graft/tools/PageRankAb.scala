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
  *   sbt "runMain graft.tools.PageRankAb 1,2,4 3 [deser,ser]"
  *
  * The optional third arg crosses each interval with the state-storage
  * modes (deser = MEMORY_AND_DISK, ser = *_SER — the r14 serializedState
  * lever on every persisted frame and rank checkpoint).
  */
object PageRankAb {
  def main(args: Array[String]): Unit = {
    val intervals = args.headOption.getOrElse("1,2,4").split(',').map(_.trim.toInt).toSeq
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val modes = args.lift(2).getOrElse("deser").split(',').map(_.trim).toSeq
    require(modes.forall(Set("deser", "ser")), s"modes must be deser|ser: $modes")
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

    def runOnce(ckpt: Int, mode: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = graft.operators.GraphOps.pageRank(edges, col("src"), col("dst"),
        iterations = graft.entry.OlapQueries.PageRankIters,
        checkpointInterval = ckpt, serializedState = mode == "ser")
      val sum = out.agg(org.apache.spark.sql.functions.sum("rank_pico")).head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      if (sec > 30.0) Thread.sleep(3000) // the Bench ContextCleaner drain
      (sec, sum)
    }

    // one untimed warm-up so trial 1 of the first setting isn't the JVM's
    // first-ever codegen compile
    runOnce(intervals.head, modes.head)

    val settings = for (ck <- intervals; m <- modes) yield (ck, m)
    val times = scala.collection.mutable.Map.empty[(Int, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    var checksum: Option[Long] = None
    for (t <- 1 to trials; s <- settings) {
      val (ck, mode) = s
      val (sec, sum) = runOnce(ck, mode)
      checksum match {
        case Some(c) => require(c == sum,
          s"pico-rank checksum drifted: $c vs $sum at ckpt=$ck mode=$mode")
        case None => checksum = Some(sum)
      }
      times(s) = times(s) :+ sec
      println(f"[ab] trial $t ckpt=$ck%d mode=$mode ${sec}%.2f s (checksum $sum)")
    }
    def median(v: Vector[Double]): Double = {
      val s = v.sorted; s((s.size - 1) / 2)
    }
    settings.foreach { case s @ (ck, mode) =>
      println(f"[ab] MEDIAN ckpt=$ck%d mode=$mode ${median(times(s))}%.2f s over ${times(s).size} trials: " +
        times(s).map(x => f"$x%.2f").mkString(", "))
    }
    spark.stop()
  }
}
