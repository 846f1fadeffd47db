package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CdcOps

/** A/B for the two point-in-time lookup plans over the b56 construction
  * (VERDICT r16 task 7): the shipped [[CdcOps.pointInTime]] (one as-of
  * sort-merge pass of facts ∪ versions) vs [[CdcOps.pointInTimeHashed]]
  * (shuffled-hash equi-join on the entity key with the interval as a
  * residual filter — no sort, candidates = facts × versions-per-key).
  * Interleaved trials (A B A B ...) so ambient drift hits both arms;
  * result equality asserted once before timing. The b56 data is the
  * hash variant's favorable regime (~10 versions/key); the record keeps
  * whichever wins.
  *
  * Usage: runMain graft.tools.PitAb [sfDir] [trials]
  */
object PitAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf1")
    val trials = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.build("pit-ab")
    spark.sparkContext.setLogLevel("WARN")

    def changelog = graft.Tables.orders(spark, dir).select(
      when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000L)
        .otherwise(col("o_custkey")).as("c_custkey"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
      concat(lit("n_"), col("o_orderkey").cast("string")).as("c_name"),
      col("o_totalprice").as("c_acctbal"))
    def hist = CdcOps.scd2History(changelog, Seq("c_custkey"), "seq", "op",
      Seq("c_name", "c_acctbal"))
    def facts = graft.Tables.orders(spark, dir).select(
      col("o_orderkey").as("fact_id"),
      when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000L)
        .otherwise(col("o_custkey")).as("c_custkey"),
      (col("o_orderkey") + col("o_orderkey") % 3).as("seq"))

    def asOf: DataFrame = CdcOps.pointInTime(facts, hist, Seq("c_custkey"),
      "seq", Seq("c_name", "c_acctbal"))
    def hashed: DataFrame = CdcOps.pointInTimeHashed(facts, hist,
      Seq("c_custkey"), "seq", Seq("c_name", "c_acctbal"))

    // equality first (untimed): the variants must agree row for row
    val diff = asOf.exceptAll(hashed).count() + hashed.exceptAll(asOf).count()
    println(s"[pit-ab] dir=$dir equality diff=$diff " +
      (if (diff == 0) "(EQUIVALENT)" else "(MISMATCH!)"))
    if (diff != 0) { spark.stop(); sys.exit(1) }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      s
    }
    // warm both arms once (codegen), then interleave
    time(asOf); time(hashed)
    val as = (1 to trials).map { i =>
      val a = time(asOf); val h = time(hashed)
      println(f"[pit-ab] trial=$i asof=${a}%6.1f s  hashed=${h}%6.1f s")
      (a, h)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[pit-ab] MEDIAN asof=${med(as.map(_._1))}%6.1f s  " +
      f"hashed=${med(as.map(_._2))}%6.1f s")
    spark.stop()
  }
}
