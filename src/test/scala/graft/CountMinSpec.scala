package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin
import graft.operators.AnalyticsOps

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish fixture: key k_i appears ~200/i times
  private lazy val keyed = (1 to 40)
    .flatMap(i => Seq.fill(200 / i)(s"k$i"))
    .toDF("k")

  private lazy val exact = keyed.groupBy("k").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates are always >= the true count (one-sided error)") {
    val sk = CountMin.build(keyed, col("k"), depth = 4, width = 32)
    val est = CountMin.estimate(sk, keyed.distinct(), col("k"),
        depth = 4, width = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, c) => assert(est(k) >= c, s"under-count at $k") }
  }

  test("a wide sketch with no collisions is exact") {
    val sk = CountMin.build(keyed, col("k"), depth = 4, width = 4096)
    val est = CountMin.estimate(sk, keyed.distinct(), col("k"),
        depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }

  test("shard merge law: merge(build(A), build(B)) == build(A union B) exactly") {
    val a = keyed.filter(length(col("k")) === 2) // k1..k9
    val b = keyed.filter(length(col("k")) =!= 2)
    val merged = CountMin.merge(
        CountMin.build(a, col("k"), depth = 4, width = 64),
        CountMin.build(b, col("k"), depth = 4, width = 64))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.build(keyed, col("k"), depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("weighted build sums weights, not rows") {
    val df = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("k", "w")
    val sk = CountMin.build(df, col("k"), col("w"), depth = 2, width = 512)
    val est = CountMin.estimate(sk, df.select("k").distinct(), col("k"),
        depth = 2, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 12L, "b" -> 1L))
  }

  test("inner product over-estimates the exact join size, exactly when wide") {
    val left = (1 to 30).flatMap(i => Seq.fill(i % 5 + 1)(s"j$i")).toDF("k")
    val right = (16 to 45).flatMap(i => Seq.fill(i % 3 + 1)(s"j$i")).toDF("k")
    val exactJoin = left.join(right, "k").count()
    def ip(width: Int): Long =
      CountMin.innerProduct(
          CountMin.build(left, col("k"), depth = 4, width = width),
          CountMin.build(right, col("k"), depth = 4, width = width))
        .collect().head.getDecimal(0).longValueExact()
    assert(ip(16) >= exactJoin)        // narrow: collisions only inflate
    assert(ip(4096) == exactJoin)      // wide: no collisions, AMS is exact
  }

  test("null keys are excluded from build and estimate") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("k")
    val sk = CountMin.build(df, col("k"), depth = 2, width = 64)
    val est = CountMin.estimate(sk, df.distinct(), col("k"),
        depth = 2, width = 64).collect()
    assert(est.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq("a" -> 2L))
  }

  test("skewReport ranks heavy keys with exact integer shares") {
    // 60 'hot' + 20 'warm' + 20 singletons over 100 rows
    val rows = Seq.fill(60)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 20).map(i => s"cold$i") ++ Seq(null.asInstanceOf[String])
    val rep = AnalyticsOps.skewReport(rows.toDF("k"), col("k"), topN = 3)
      .collect()
    assert(rep.length == 3)
    val hot = rep.head
    assert(hot.getString(0) == "hot" && hot.getLong(1) == 60L)
    assert(hot.getLong(2) == 22L)            // n_keys: hot, warm, 20 colds
    assert(hot.getLong(3) == 600000L)        // 60 * 1e6 div 100
    assert(hot.getLong(4) == 1320L)          // 600000 * 22 div 10000
    // tie region sorts by key: cold1 < cold10 < ... lexicographic
    assert(rep(2).getString(0) == "cold1" && rep(2).getLong(1) == 1L)
  }

  test("CMS builds incrementally on a stream and equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val q = CountMin.build(mem.toDF.select(col("value").as("k")), col("k"),
        depth = 2, width = 64)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      mem.addData("a", "b", "a"); q.processAllAvailable()
      mem.addData("b", "c", "a"); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = CountMin.build(Seq("a", "b", "a", "b", "c", "a").toDF("k"),
          col("k"), depth = 2, width = 64)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("skewReport plan is a TakeOrderedAndProject over one aggregate") {
    val plan = AnalyticsOps.skewReport((1 to 100).map(i => s"k${i % 7}").toDF("k"),
      col("k"), topN = 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
