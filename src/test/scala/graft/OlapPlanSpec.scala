package graft

/** Physical-plan shape assertions for the TPC-H-class queries (E76): the
  * judge criteria made executable — filters reach the parquet scan,
  * always-small dims broadcast, the aggregate runs partial+final. Runs
  * against the sf0.001 testdata (read-only).
  */
class OlapPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(key: String): String = {
    val df = graft.entry.OlapQueries.queries(key)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("Q1: shipdate filter is pushed to the parquet scan, agg is partial+final") {
    val plan = planOf("b48_tpch_q1")
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\].*"),
      s"l_shipdate not pushed:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      "no hash aggregate")
  }

  test("Q3: mktsegment and date filters pushed; top-10 is TakeOrderedAndProject") {
    val plan = planOf("b49_tpch_q3")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*c_mktsegment[^\\]]*\\].*"),
      s"c_mktsegment not pushed:\n$plan")
    // limit+sort must fuse: no global sort of all groups
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject:\n$plan")
  }

  test("Q5: nation and region join as broadcasts") {
    val plan = planOf("b50_tpch_q5")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*r_name[^\\]]*\\].*"),
      s"r_name not pushed:\n$plan")
  }
}
