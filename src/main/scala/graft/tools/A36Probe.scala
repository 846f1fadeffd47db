package graft.tools

import org.apache.spark.sql.functions._

/** Sub-span linearity probe for a36_resample at the decade where the full
  * key cannot run (VERDICT r14 task 4): a36's cost IS its output — the
  * dense per-user hourly LOCF grid (~1.08 B rows / 100+ GB through the
  * window sort at sf100) — which exceeds this sandbox's disk, so the full
  * key is excluded from the sf100 record by analysis. This probe measures
  * the SAME operator (grid explode + one sort-merge as-of pass,
  * TemporalOps.resampleLocf, identical parameters to the a36 key) on the
  * FULL sf100 user population with the event stream truncated to the
  * first {18, 36, 72} hours of the window: output shrinks ~10–40× below
  * the disk ceiling while the per-row linear term — the thing the decade
  * record wants adjudicated — is measured directly from the span sweep
  * (wall time should scale ~linearly with grid rows across the three
  * spans; any super-linear residual would indict the plan, not the
  * output size).
  *
  * Grid rows are also PREDICTED from the tiny per-user bounds aggregate
  * (rows = Σ_users hours(trunc(lo)..hi)+1 — the as-of join is 1:1 on the
  * grid side) so the probe reports output size without a second
  * materialization of the grid.
  *
  * Usage: runMain graft.tools.A36Probe [sfDir] [spansCsv]
  */
object A36Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf100")
    val spans = (if (args.length > 1) args(1) else "18,36,72")
      .split(',').map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.build("a36-probe")
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables.events(spark, dir)
    val lo = events.agg(min(col("ts"))).head().getTimestamp(0)
    println(s"[a36probe] dir=$dir window starts $lo")
    spans.foreach { h =>
      val cut = new java.sql.Timestamp(lo.getTime + h * 3600L * 1000L)
      val slice = events.filter(col("ts") < lit(cut))
      val predicted = slice.groupBy(col("user_id"))
        .agg(min(col("ts")).as("__lo"), max(col("ts")).as("__hi"))
        .agg(sum(floor(
          (unix_timestamp(col("__hi")) -
            unix_timestamp(date_trunc("hour", col("__lo")))) / 3600L)
          .cast("long") + 1L)
          .as("rows"), count(lit(1)).as("users"))
        .head()
      val t0 = System.nanoTime()
      graft.operators.TemporalOps.resampleLocf(slice,
          key = Seq("user_id"), tsCol = "ts", payload = Seq("value"),
          interval = "1 hour", truncUnit = "hour",
          tieBreak = col("event_id"))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[a36probe] span=${h}%3d h  users=${predicted.getLong(1)}%,d" +
        f"  grid_rows=${predicted.getLong(0)}%,d  wall=${sec}%8.1f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
