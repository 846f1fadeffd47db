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

  test("shrink: decrement drops at least one entry and never overcounts") {
    val m = Map("a" -> 10L, "b" -> 5L, "c" -> 3L, "d" -> 1L)
    val s = HeavyHitters.shrink(m, 2)
    assert(s.size <= 2)
    assert(s.forall { case (t, c) => c <= m(t) })
    assert(s.contains("a"))
  }
}
