package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components (which lives in
  * [[DedupOps.dedupClusters]] as the dedup-cluster assignment). Iterative
  * algorithms follow the same discipline as the CC rounds: one shuffle
  * join + one aggregate per round, periodic eager localCheckpoint lineage
  * truncation, explicit unpersist of superseded round frames.
  */
object GraphOps {

  /** Fixed-point PageRank over a directed edge set — ranks held as exact
    * BIGINT multiples of 10^-12 ("pico-rank" units) with FLOOR integer
    * division everywhere, which makes every iteration bit-reproducible in
    * any engine and ORDER-INDEPENDENT under summation (a double-sum
    * PageRank differs run-to-run at 100 TB because fp addition is not
    * associative across partition orders; exact integer sums are). The
    * recurrence per node v:
    *
    *   rank(v) = (15 · r0) // 100  +  (85 · Σ_{u→v} rank(u) // outdeg(u)) // 100
    *
    * with r0 = UNIT // n — the standard damping-0.85 simplified PageRank
    * (dangling-node mass leaks, as in the common no-redistribution
    * variant), quantized to the floor at each step. Quantization error is
    * ≤ n·10^-12 per iteration — noise relative to rank gaps, and the gate
    * checks the INVARIANT, not an approximation: the oracle replays the
    * identical integer recurrence.
    *
    * Plan per iteration: per-edge contribution = one equi-join of the
    * rank frame (node-sized) against the edge set on src, then ONE hash
    * aggregate on dst over the contributions UNIONED with a zero row per
    * node (map-side combine applies — contributions are algebraic long
    * sums). The zero-row union is how dangling nodes keep their base
    * rank WITHOUT the textbook `nodes LEFT JOIN inbound` — the union is
    * a free plan concatenation feeding the aggregate the round already
    * pays for, where the left join was a whole extra join (+ its sort
    * or broadcast build) per round on the node-sized frame. A/B at
    * sf0.1: rounds job 3.2 s → 2.4 s warm, identical pico-rank sums.
    * The rank frame enters each round's plan exactly ONCE, so lineage
    * grows linearly (one join+agg layer per round), not exponentially —
    * which means rounds need not each pay an eager materialization job.
    * `checkpointInterval` controls the trade: every k-th round (and the
    * last) is materialized with an eager localCheckpoint, truncating the
    * k-layer lineage and bounding re-execution + plan depth, while the
    * rounds in between stay lazy and fuse into the next checkpoint's job.
    * Superseded checkpoint blocks are unpersisted as soon as the next
    * checkpoint lands. The edge and node frames persist across all rounds
    * (they are read every iteration — at scale these are the materialized
    * inputs). The default is 1 (checkpoint every round): an interleaved
    * A/B at sf0.1 (graft.tools.PageRankAb, 3 trials per setting, one JVM)
    * measured medians 4.64 s / 4.86 s / 5.31 s for intervals 1 / 2 / 4,
    * with interval 1 fastest in every individual trial — fusing k rounds
    * re-lengthens each checkpoint job's plan (k join+agg layers compile
    * as one deeper codegen unit and AQE replans the whole chain) by more
    * than the k-1 saved job launches cost. Identical pico-rank checksum
    * across all settings, as the knob requires.
    *
    * Remaining local cost is FIXED overhead, not data: with both AQE and
    * whole-stage codegen disabled the same 4-round job runs ~1.4 s at
    * sf0.1 vs ~2.4 s with both on — per-stage codegen compilation (fresh
    * exprIds each run defeat the codegen cache) plus AQE stage
    * materialization make up ~1 s that is graph-size-independent and
    * amortizes to nothing on a real cluster, so the knobs stay on (they
    * are the right defaults at 100 TB).
    *
    * Mega-hub dst skew: inbound contributions are algebraic, so partial
    * aggregation flattens a node with a billion in-edges the same way the
    * E63 mega-domain case flattens. The `n` node count is one count()
    * action over the node frame (single pass, documented driver-side
    * scalar — it parameterizes the literal base rank).
    *
    * Returns (node, rank_pico BIGINT, rank DOUBLE = rank_pico / 10^12).
    */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column,
               iterations: Int = 8, checkpointInterval: Int = 1,
               serializedState: Boolean = true): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1: $checkpointInterval")
    val UnitPico: Long = 1000000000000L
    // `serializedState` switches every persisted frame (edge/node caches
    // AND the per-round rank checkpoints) to *_SER storage — the b55/d17
    // storage lever (deserialized UnsafeRow pins ~80 B/row; serialized
    // blocks trade CPU decode for heap room). A storage level is a
    // materialization knob, never a semantics knob: PageRankAb asserts
    // the pico-rank checksum is identical across settings. Default TRUE
    // since r14 — the interleaved A/B (graft.tools.PageRankAb) measured
    // serialized ≤ deserialized at every decade, decisively where the
    // edge cache pressures the heap: sf0.1 3.53 vs 3.79 s, sf10 25.3 vs
    // 26.0 s, sf100 219/222 vs 233/242 s (every ser trial beat every
    // deser trial at 64 g; the decode tax never shows because the
    // per-round join reads the cache once per pass — see SCALING r14).
    val MemDisk =
      if (serializedState)
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // a half-null edge is no edge: it would register a null node that
    // every join silently drops, leaking rank mass nondeterministically.
    // ONE edge-sized exchange for all of prep: repartition on src, then
    // dedup, outdeg, and the deg join are all partition-local —
    // HashPartitioning(src) satisfies the (src, dst) dedup's clustered
    // distribution (equal (src,dst) pairs share a src) and both sides of
    // the deg join. The former shape (distinct on (src,dst) THEN a
    // src-keyed deg join) shuffled the edge set twice.
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .persist(MemDisk)
    // explode, not union-of-two-projections: a union reads the
    // not-yet-materialized e cache through TWO sibling stages of the same
    // job, recomputing the scan+join+dedup lineage twice (the lazy-
    // persist race) — the explode derives both endpoints in ONE pass
    // (measured: prep job 4.6 s → 3.9 s cold at sf0.1)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
      .persist(MemDisk)
    val n = nodes.count() // also materializes both caches eagerly
    if (n == 0) {
      // empty graph: no nodes, no ranks — and no 1/n base to divide by
      e.unpersist(false); nodes.unpersist(false)
      return nodes.select(col("node"), lit(0L).as("rank_pico"),
        lit(0.0).as("rank"))
    }
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // per-edge sender state: src rank / outdeg changes per round, outdeg
    // doesn't — pre-join deg onto the edge set ONCE so rounds join only
    // the rank frame. (A count-window over src would save the join stage
    // but buffers each src partition whole — a mega-hub src then lands on
    // one task with no AQE skew split; the agg+equi-join keeps map-side
    // combine and AQE skew handling.) Both deg and the join read the
    // src-partitioned e cache, so neither adds an exchange.
    // Eager materialization is NOT optional: with checkpointInterval > 1
    // the fused checkpoint job references eDeg through one sibling join
    // stage PER ROUND, and an unmaterialized lazy persist makes those
    // siblings race and recompute the join lineage each (the d03/d06
    // lesson — lazy persist is only safe with a single consumer stage).
    // Measured at sf0.1: lazy 10.2 s → eager 5.0 s warm for the 4-round
    // query; the extra prep job costs one partition-local join over the
    // already-cached e.
    val eDeg = e.join(deg, "src").persist(MemDisk)
    eDeg.count()
    val r0 = UnitPico / n
    val base = (15L * r0) / 100L
    def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
        case _ => None
      }
    var ranks = nodes.select(col("node"), lit(r0).as("rank"))
    var lastCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var i = 0
    while (i < iterations) {
      // contributions ∪ a zero row per node, ONE aggregate: dangling
      // nodes keep their base rank without a second (left) join per round
      val contribs = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("__n"), expr("rank div outdeg").as("__c"))
      val zeros = nodes.select(col("node").as("__n"), lit(0L).as("__c"))
      var next = contribs.unionByName(zeros)
        .groupBy(col("__n")).agg(sum(col("__c")).as("__inb"))
        .select(col("__n").as("node"),
          (lit(base) + expr("(85 * __inb) div 100")).as("rank"))
      i += 1
      if (i % checkpointInterval == 0 || i == iterations) {
        next = next.localCheckpoint(true, MemDisk)
        val stale = lastCkpt
        lastCkpt = backingRdd(next)
        stale.foreach(_.unpersist(false))
      }
      ranks = next
    }
    e.unpersist(false)
    eDeg.unpersist(false)
    nodes.unpersist(false)
    ranks.select(col("node"), col("rank").as("rank_pico"),
      (col("rank") / lit(1.0e12)).as("rank"))
  }
}
