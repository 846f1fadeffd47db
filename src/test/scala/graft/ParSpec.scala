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

  test("byte-small aggregated/joined frames are spread: AQE coalesce can " +
      "shrink them below the floor") {
    // the r11 refinement of the demotion guard: a post-shuffle frame is
    // governed by shuffle.partitions — but AQE's coalescePartitions can
    // shrink a BYTE-SMALL shuffle to fewer than defaultParallelism
    // partitions at runtime (down to 1), recreating the under-split trap
    // for heavy per-row work downstream of a join/agg. Such frames get an
    // explicit repartition (which AQE never coalesces).
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(docs)
    val agg = base.groupBy("lang").count()
    val out = Par.ensure(agg)
    assert(!(out eq agg), "byte-small agg frame was not spread")
    assert(out.rdd.getNumPartitions === par)
    val joined = base.select("doc_id", "lang").join(agg, "lang")
    assert(Par.ensure(joined).rdd.getNumPartitions === par)
  }

  test("post-shuffle frames pass through untouched when the floor provably " +
      "holds") {
    val base = spark.read.parquet(docs)
    val agg = base.groupBy("lang").count()
    // (a) AQE coalescing off: the static shuffle.partitions floor is the
    // runtime partitioning, nothing can shrink it
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      assert(Par.ensure(agg) eq agg)
    } finally spark.conf.set(coalesceKey, prev)
    // (b) coalescing on, but the frame's byte estimate clears
    // par × target-size, so AQE cannot land under par partitions
    val sizeKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val prevSize = spark.conf.getOption(sizeKey)
    try {
      spark.conf.set(sizeKey, "1b")
      assert(Par.ensure(agg) eq agg)
    } finally prevSize match {
      case Some(v) => spark.conf.set(sizeKey, v)
      case None    => spark.conf.unset(sizeKey)
    }
  }

  test("an explicit repartition is the caller's decision - never wrapped, " +
      "even below the floor") {
    // AQE never coalesces user-specified repartitions, so the floor can't
    // break at runtime; and wrapping a deliberate below-par partitioning
    // would override the caller
    val two = spark.read.parquet(docs).groupBy("lang").count().repartition(2)
    assert(Par.ensure(two) eq two)
  }

  test("multi-file sources charge the per-file open cost: a byte-small " +
      "many-part directory is NOT spuriously spread") {
    // the r17 lesson: Spark packs files into splits charging openCostInBytes
    // PER FILE, so a 32-part directory of tiny files already scans ~32-way;
    // the bytes-only estimate said "2 splits" for such a source and inserted
    // a pure-waste exchange (b48/t09 at sf1, same-session A/B). Write a
    // many-part copy and assert the guard now leaves it alone.
    val par = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("par_multifile").toString
    try {
      spark.read.parquet(docs).select("doc_id").repartition(par)
        .write.mode("overwrite").parquet(dir)
      val many = spark.read.parquet(dir)
      assert(Par.ensure(many) eq many,
        "ensure() spread a many-part source that already scans wide")
      // control: the single-file original still spreads (first test's case)
      val single = spark.read.parquet(docs).select("doc_id")
      assert(!(Par.ensure(single) eq single))
    } finally graft.entry.QueryHelpers.deleteRecursively(new java.io.File(dir))
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
