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

  private def dPlanOf(key: String): String =
    graft.entry.DQueries.queries(key)(spark, dir)
      .queryExecution.executedPlan.toString

  test("m03/d18 image+embedding pair miners: chunk equi-joins, no cartesian") {
    // both new dedup-family members ride the d04 simhash chunk machinery;
    // their candidate generation must plan as hash-key equi-joins (d18's
    // internal checkpoints re-root parts of the plan, but the bucket
    // self-join and the cosine-verify joins remain visible downstream)
    for (key <- Seq("m03_image_dedup", "d18_embedding_simhash",
        "d19_cross_embedding_dedup", "m06_audio_dedup", "m07_video_dedup")) {
      val plan = dPlanOf(key)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$key candidates must be chunk equi-joins:\n$plan")
      assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
        .findAllIn(plan).nonEmpty, s"$key: no equi-join found:\n$plan")
    }
  }

  test("t30 weighted sample: rank filter plans as WindowGroupLimit") {
    val plan = dPlanOf("t30_weighted_sample")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k rank not pushed into WindowGroupLimit:\n$plan")
  }

  test("t29 char entropy: native expression stays inside whole-stage codegen") {
    val df = graft.entry.DQueries.queries("t29_char_entropy")(spark, dir)
    // AQE prints codegen spans only on the executed final plan — execute
    // THIS QueryExecution (a write action would plan a fresh one)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_char_stats"), s"native expr missing:\n$plan")
    // the projection carrying the expression must sit in a codegen'd span,
    // not a CodegenFallback island (the failure mode of the HOF twin)
    assert("\\*\\(\\d+\\) Project \\[[^\\]]*graft_char_stats".r
      .findFirstIn(plan.replaceAll("\n", " ")).isDefined,
      s"graft_char_stats not inside WholeStageCodegen:\n$plan")
  }

  test("d10 decontam overlap: benchmark gram set joins as a broadcast") {
    val plan = dPlanOf("d10_decontam_overlap")
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side did not broadcast:\n$plan")
  }

  test("t31 drift: one hash aggregate over the unioned scan; window sits above it") {
    val plan = dPlanOf("t31_drift")
    // bucketing + side-tag fold into the scans; counts run partial+final
    assert(plan.contains("Union") && plan.contains("HashAggregate"),
      s"expected union + hash aggregate:\n$plan")
    // the proportion window must consume the AGGREGATE, not fact rows: in
    // the physical plan the Window's child subtree contains the final
    // HashAggregate (Window above agg), never the reverse
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window does not sit above the aggregate:\n$plan")
  }

  test("d11 cross dedup: candidates come from equi-joins, no cartesian product") {
    // the gate query materializes + releases its caches (the returned plan
    // re-roots at the checkpoint blocks), so inspect the LAZY operator plan —
    // same shape the gate executes, with the joins still visible
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val newSh = graft.operators.DedupOps.shingleSets(
      docs.filter(pmod(col("doc_id"), lit(2)) === 1), col("doc_id"), col("text"), 3)
    val corpSh = graft.operators.DedupOps.shingleSets(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), col("doc_id"), col("text"), 3)
    val plan = graft.operators.DedupOps
      .crossNearDupPairs(newSh, corpSh, 0.5, release = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cross-corpus candidates must be bucket equi-joins:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).nonEmpty, s"no equi-join found:\n$plan")
  }

  test("d12 canonical selection: argmax is a hash aggregate, no per-cluster sort") {
    val plan = dPlanOf("d12_canonical")
    // simhash candidate pairs come from 15-bit chunk equi-joins; the
    // canonical argmax is min(struct) — neither may plan a cartesian or
    // a row_number window (which would sort every cluster)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must stay equi-joins:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("row_number"),
      s"keep-best must be an aggregate, not a window:\n$plan")
  }

  test("b54 join estimate: sketch builds are map-combined hash aggregates") {
    // (the final est x exact combine is a deliberate 1-row x 1-row join —
    // only the sketch-build and inner-product stages are shape-checked)
    val plan = planOf("b54_join_estimate")
    assert("partial_sum".r.findAllIn(plan).nonEmpty,
      s"sketch build must map-combine:\n$plan")
    assert("SortMergeJoin|BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      s"inner product must be an equi-join on (j, bucket):\n$plan")
  }

  test("t35 negative sampling: ring picks are equi-joins, ranks stay bucket-local") {
    val plan = dPlanOf("t35_negative_sample")
    // the dense index must come from per-BUCKET ranks + offsets, never a
    // global row_number (which would funnel the corpus through one task)
    assert(!plan.contains("SinglePartition"),
      s"global single-partition stage found:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"picks must resolve as equi-joins:\n$plan")
  }

  test("b55 co-occurrence: pair generation is a basket equi-join, counts map-combine") {
    val plan = graft.entry.OlapQueries.queries("b55_cooccur")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay a basket equi-join:\n$plan")
    assert("partial_count|HashAggregate".r.findAllIn(plan).nonEmpty,
      s"pair counts must map-combine:\n$plan")
  }

  test("s08 random projection: broadcast sign join + map-combined aggregate") {
    val plan = dPlanOf("s08_random_proj")
    assert(plan.contains("BroadcastHashJoin"),
      s"sign table must broadcast:\n$plan")
    assert("partial_sum".r.findAllIn(plan).nonEmpty,
      s"projection sums must map-combine:\n$plan")
  }

  test("t37 bigram LM: model joins are equi-joins, no cartesian anywhere") {
    val plan = dPlanOf("t37_bigram_lm")
    // the 1-row vocab count rides a broadcast nested loop BY DESIGN (a
    // cross join with one row); the model joins themselves must be hash
    // or sort-merge equi-joins and nothing may plan a CartesianProduct
    assert(!plan.contains("CartesianProduct"), s"cartesian found:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).nonEmpty, s"no equi-join found:\n$plan")
  }

  test("d17 containment: pairing is a key equi-join, no cartesian/BNLJ") {
    val plan = dPlanOf("d17_containment")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"containment pairing must stay a key equi-join:\n$plan")
  }

  test("t39 exact split: no per-stratum sort window — every Window is (stratum, bucket)-keyed") {
    val plan = dPlanOf("t39_exact_split")
    // the row_number windows must partition by TWO expressions (stratum +
    // hash bucket); a single-column partitionBy would be the mega-stratum
    // buffering trap the operator exists to avoid. The prefix-offset
    // window over the counts frame is also (stratum)-partitioned but
    // bounded by `buckets` rows per group — identified by its running
    // frame over __c, not row_number.
    val rowNumWindows = "Window \\[row_number\\(\\)[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(rowNumWindows.nonEmpty, s"no row_number window found:\n$plan")
    rowNumWindows.foreach { parts =>
      assert(parts.split(",").length >= 2,
        s"row_number window partitions by a single column ($parts):\n$plan")
    }
  }

  test("a44 attribution: one window pass, no self-join") {
    val df = graft.entry.AQueries.queries("a44_attribution")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct|BroadcastNestedLoopJoin".r
      .findFirstIn(plan).isDefined,
      s"attribution must not join — it is one window pass:\n$plan")
    assert(plan.contains("Window"), s"expected the carry window:\n$plan")
  }

  test("a45 windowed top-k: rank filter plans as WindowGroupLimit") {
    val plan = graft.entry.AQueries.queries("a45_windowed_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-window top-k must prune before the final exchange:\n$plan")
  }

  test("s11 mmr: candidate and pair-similarity joins stay equi, no cartesian") {
    val plan = dPlanOf("s11_mmr_rerank")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in the MMR rounds:\n$plan")
  }
}
