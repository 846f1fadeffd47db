package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Unit coverage for GraphOps.pageRank (SURVEY §2E E72). The fixed-point
  * recurrence is differentially tested against a driver-side Scala
  * replay of the exact same integer arithmetic.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the pico-rank recurrence. */
  private def referenceRanks(edges: Seq[(Long, Long)],
                             iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val r0 = 1000000000000L / n
    val base = (15L * r0) / 100L
    var ranks = nodes.map(_ -> r0).toMap
    (1 to iterations).foreach { _ =>
      val inbound = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => ranks(s) / outdeg(s) }.sum
      }
      ranks = nodes.map(v => v -> (base + (85L * inbound.getOrElse(v, 0L)) / 100L)).toMap
    }
    ranks
  }

  test("pageRank matches the driver-side integer recurrence on a small graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 2L),
      (5L, 1L), (1L, 5L), (2L, 1L))
    val got = GraphOps.pageRank(edges.toDF("s", "d"), col("s"), col("d"),
        iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceRanks(edges, 5))
  }

  test("pageRank: hub of a star collects the rank mass") {
    val edges = (1L to 9L).map(i => (i, 100L))
    val got = GraphOps.pageRank(edges.toDF("s", "d"), col("s"), col("d"),
        iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(100L) > got(1L) * 5)
    assert((1L to 9L).map(got).distinct.size === 1) // leaves symmetric
  }

  test("pageRank: empty edge set yields an empty result, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    val out = GraphOps.pageRank(empty, col("s"), col("d"), iterations = 3)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("node", "rank_pico", "rank"))
  }

  test("pageRank: checkpointInterval is a materialization knob, never a result knob") {
    // the PageRankAb harness (and the SCALING A/B it records) depends on
    // this invariance: any interval must yield bit-identical pico-ranks
    val edges = (0L until 300L).map(i => (i % 31, (i * 11) % 17 + 100L))
    val expect = referenceRanks(edges, 5)
    for (ck <- Seq(1, 2, 4, 5)) {
      val got = GraphOps.pageRank(edges.toDF("s", "d"), col("s"), col("d"),
          iterations = 5, checkpointInterval = ck)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"checkpointInterval=$ck diverged")
    }
  }

  test("pageRank: deterministic across input partitionings") {
    val edges = (0L until 200L).map(i => (i % 23, (i * 7) % 19 + 100L))
    val a = GraphOps.pageRank(edges.toDF("s", "d").repartition(7),
        col("s"), col("d"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRank(edges.toDF("s", "d").repartition(1),
        col("s"), col("d"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a === referenceRanks(edges, 4))
  }
}
