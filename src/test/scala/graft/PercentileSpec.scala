package graft

import org.apache.spark.sql.functions._
import graft.operators.StreamOps

/** Pins the production/oracle percentile split (SURVEY.md §2A A20): Verify
  * oracle-checks the exact percentile, Bench times percentile_approx — this
  * spec keeps that split honest by bounding the approx sketch's error on the
  * gate-SF events table.
  *
  * percentile_approx(accuracy=10000) bounds *rank* error at n/10000 — on the
  * 10k-row gate table that is ~1 rank position. The check: the number of
  * group values ≤ the approx answer must sit within a few ranks of the
  * target rank p·n (a value-space tolerance would be data-dependent; the
  * rank-space one is the sketch's actual contract).
  */
class PercentileSpec extends SparkSpec {

  test("percentile_approx(accuracy 10000) is within ±3 ranks of exact at gate SF") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val approx = ev.groupBy("event_type").agg(
      StreamOps.pct(col("value"), 0.10, exact = false).as("a10"),
      StreamOps.pct(col("value"), 0.90, exact = false).as("a90"))
    val ranks = ev.join(broadcast(approx), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") <= col("a10"), 1).otherwise(0)).as("le10"),
        sum(when(col("value") <= col("a90"), 1).otherwise(0)).as("le90"))
      .collect()
    assert(ranks.nonEmpty)
    ranks.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val eps = n / 10000.0 + 2.0 // sketch rank guarantee + discretization
      assert(math.abs(r.getAs[Long]("le10") - 0.10 * n) <= eps,
        s"p10 rank error for ${r.getAs[String]("event_type")}: " +
          s"${r.getAs[Long]("le10")} vs ${0.10 * n} (n=$n)")
      assert(math.abs(r.getAs[Long]("le90") - 0.90 * n) <= eps,
        s"p90 rank error for ${r.getAs[String]("event_type")}: " +
          s"${r.getAs[Long]("le90")} vs ${0.90 * n} (n=$n)")
    }
  }
}
