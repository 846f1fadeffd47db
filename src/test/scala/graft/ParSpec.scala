package graft

import graft.operators.Par

/** Behavior of the map-side parallelism guard: under-split raw sources are
  * spread, and — the round-10 demotion guard — frames whose partitioning
  * was already raised ABOVE the leaves by an upstream exchange are left
  * untouched (the leaf estimate cannot see that exchange and would
  * otherwise wrap them in a parallelism-REDUCING repartition).
  */
class ParSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  test("under-split parquet source is spread to defaultParallelism") {
    val par = spark.sparkContext.defaultParallelism
    val df = spark.read.parquet(docs).select("doc_id")
    val out = Par.ensure(df)
    assert(out.rdd.getNumPartitions === par,
      s"expected $par partitions, got ${out.rdd.getNumPartitions}")
  }

  test("upstream repartition above defaultParallelism is never demoted") {
    val par = spark.sparkContext.defaultParallelism
    val df = spark.read.parquet(docs).select("doc_id").repartition(par * 2)
    val out = Par.ensure(df)
    // reference equality: the guard must not touch the frame at all
    assert(out eq df, "ensure() wrapped an already-shuffled frame")
    assert(out.rdd.getNumPartitions === par * 2)
  }

  test("aggregated and joined frames pass through untouched") {
    val base = spark.read.parquet(docs)
    val agg = base.groupBy("lang").count()
    assert(Par.ensure(agg) eq agg)
    val joined = base.select("doc_id", "lang")
      .join(agg, "lang")
    assert(Par.ensure(joined) eq joined)
  }

  test("already-materialized RDD leaves read their partition count for free") {
    val par = spark.sparkContext.defaultParallelism
    val ck = spark.read.parquet(docs).select("doc_id")
      .repartition(par).localCheckpoint(true)
    // plan is a bare LogicalRDD leaf (the checkpoint), no shuffle node —
    // the leaf estimate sees its partition count directly, no wrap
    val out = Par.ensure(ck)
    assert(out eq ck, "ensure() wrapped a checkpointed frame at full parallelism")
  }
}
