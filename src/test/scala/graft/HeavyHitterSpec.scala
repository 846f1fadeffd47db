package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

/** Misra–Gries guarantees on planted skew: frequent items survive with
  * bounded undercount regardless of partitioning (merge order). */
class HeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  test("MG guarantees: items above n/(k+1) survive with bounded undercount") {
    // n = 10_000: "hot" 3000, "warm" 2000, "mild" 1000, tail 4000 singletonish
    val rows = Seq.fill(3000)("hot") ++ Seq.fill(2000)("warm") ++
      Seq.fill(1000)("mild") ++ (0 until 4000).map(i => s"tail_$i")
    val n = rows.size
    val k = 20
    for (parts <- Seq(1, 7, 32)) { // merge order must not break guarantees
      val df = rows.toDF("term").repartition(parts)
      val hh = HeavyHitters.heavyHitters(df, col("term"), k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hh.size <= k)
      val bound = n / (k + 1)
      for ((item, trueCount) <- Seq("hot" -> 3000L, "warm" -> 2000L, "mild" -> 1000L)) {
        assert(hh.contains(item), s"parts=$parts: $item (freq > n/(k+1)) must survive")
        assert(hh(item) <= trueCount, s"parts=$parts: MG never overcounts")
        assert(trueCount - hh(item) <= bound,
          s"parts=$parts: undercount of $item = ${trueCount - hh(item)} > $bound")
      }
    }
  }

  test("exactHeavyHitters equals the plain GROUP BY/HAVING answer (differential)") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: term i with weight ~ 1/(i+1); 5000 draws over 300 terms
    val rows = Seq.fill(5000) {
      val u = rnd.nextDouble()
      s"term_${math.min(299, (math.exp(u * math.log(300.0)) - 1).toInt)}"
    }
    for (share <- Seq(0.005, 0.02, 0.2); parts <- Seq(1, 13)) {
      val df = rows.toDF("term").repartition(parts)
      val got = graft.functions.HeavyHitters
        .exactHeavyHitters(df, col("term"), share)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = rows.size
      val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c > n.toDouble * share }.toMap
      assert(got == expected, s"share=$share parts=$parts")
    }
  }

  test("exactHeavyHitters: no qualifying item yields an empty frame with the right schema") {
    val df = (0 until 1000).map(i => s"u_$i").toDF("term")
    val out = graft.functions.HeavyHitters.exactHeavyHitters(df, col("term"), 0.01)
    assert(out.columns.toSeq == Seq("term", "cnt"))
    assert(out.count() == 0)
  }

  test("sketchAgg merges incrementally across streaming micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val k = 10
    val agg = mem.toDS().groupByKey(_ => 0)
      .agg(graft.functions.HeavyHitters.sketchAgg(k).name("mg"))
      // kryo-encoded maps land as opaque binary in a sink; render to text
      .map { case (_, m) =>
        m.toSeq.sorted.map { case (t, c) => s"$t:$c" }.mkString(",")
      }
    val q = agg.writeStream.format("memory").queryName("hh_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: 60 hot + 20 tail; batch 2: 40 hot + 30 warm — state is the
      // <=k summary, merged per micro-batch
      mem.addData(Seq.fill(60)("hot") ++ (0 until 20).map(i => s"t$i"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(40)("hot") ++ Seq.fill(30)("warm"): _*)
      q.processAllAvailable()
      // the memory sink holds one updated row per batch; only the batch-2
      // row can contain "warm" (no warm data existed in batch 1)
      val m = spark.table("hh_stream").collect()
        .map(_.getString(0).split(",").filter(_.nonEmpty)
          .map { kv => val Array(t, c) = kv.split(":"); t -> c.toLong }.toMap)
        .find(_.contains("warm")).get
      val n = 60 + 20 + 40 + 30
      assert(m.size <= k)
      assert(m.contains("hot") && m("hot") <= 100 && 100 - m("hot") <= n / (k + 1))
      assert(m.contains("warm") && m("warm") <= 30 && 30 - m("warm") <= n / (k + 1))
    } finally q.stop()
  }

  test("shrink: decrement drops at least one entry and never overcounts") {
    val m = Map("a" -> 10L, "b" -> 5L, "c" -> 3L, "d" -> 1L)
    val s = HeavyHitters.shrink(m, 2)
    assert(s.size <= 2)
    assert(s.forall { case (t, c) => c <= m(t) })
    assert(s.contains("a"))
  }
}
