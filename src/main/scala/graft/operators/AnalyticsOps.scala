package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General OLAP analytics operators beyond the reference surface: sliding
  * windows, per-key moving aggregates, multi-level rollup/cube, approximate
  * distinct counting, z-score outlier flagging, semi/anti membership
  * labeling, and fixed-width histograms. Like the rest of `graft.operators`
  * these are pure `DataFrame => DataFrame` functions built from codegen'd
  * built-ins, so they run identically over batch frames and (where the
  * operator is streamable) watermarked streaming frames.
  */
object AnalyticsOps {

  /** Sliding (hopping) tumbling-window aggregation:
    * `window(ts, duration, slide)` × keys → aggs. Each row lands in
    * `duration/slide` windows — Spark expands the window list per row
    * before the shuffle, so the shuffle volume is multiplied by that
    * factor. Keep the ratio small at scale (2-4×); for large ratios
    * aggregate tumbling `slide`-sized panes first and re-aggregate panes
    * into sliding windows (the pane optimization), which this function
    * deliberately does NOT do because the built-in expansion is
    * watermark-compatible on streams (state evicts once the window
    * closes past the watermark).
    */
  def slidingWindowAgg(df: DataFrame, tsCol: String, duration: String,
                       slide: String, keys: Seq[Column],
                       aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Per-key moving aggregate over the previous `lookback` rows (inclusive
    * of current) in (ts, tieBreak) order, plus the lag delta to the prior
    * row. One shuffle on the key, one per-partition sort — the canonical
    * window-function plan. At 100 TB the hazard is a monster key (all rows
    * one partition): pre-split by coarse time bucket and patch the first
    * `lookback` rows per bucket with the previous bucket's tail, same
    * boundary-patch shape as the as-of join note in SCALING.md.
    */
  def movingAgg(df: DataFrame, key: Seq[Column], tsCol: String,
                tieBreak: Column, valueCol: Column,
                lookback: Int): DataFrame = {
    val order = Window.partitionBy(key: _*).orderBy(col(tsCol), tieBreak)
    val frame = order.rowsBetween(-(lookback - 1), Window.currentRow)
    // avg emitted as exact frame-sum / count rather than the built-in avg:
    // when valueCol is a decimal the sum is exact in any engine and the
    // single double division is correctly rounded, so the moving average
    // is bit-reproducible cross-engine (built-in avg dialects differ on
    // decimal: Spark divides in decimal, others in double)
    df.withColumn("moving_sum", sum(valueCol).over(frame))
      .withColumn("moving_cnt", count(valueCol).over(frame))
      .withColumn("moving_avg",
        col("moving_sum").cast("double") / col("moving_cnt"))
      .withColumn("moving_min", min(valueCol).over(frame))
      .withColumn("moving_max", max(valueCol).over(frame))
      .withColumn("delta_prev", valueCol - lag(valueCol, 1).over(order))
  }

  /** Multi-level aggregation (grouping sets) by ADDITIVE re-aggregation:
    * aggregate the finest grouping once, then re-aggregate that (tiny)
    * result per requested level and union, tagging each level with the
    * rolled-up columns NULLed and a `lvl` bitmask (bit i set = groupCols(i)
    * rolled up — same numbering as `grouping_id()`).
    *
    * Spark's built-in `rollup`/`cube` plan this with an Expand operator
    * that replicates EVERY INPUT ROW once per grouping set before the
    * shuffle — n levels multiply the shuffle volume by n. For algebraic
    * aggregates (count/sum/min/max), re-aggregating the finest level is
    * equivalent and shuffles the raw data exactly once; the re-aggs run
    * over group-count-sized data. At 100 TB that is the difference between
    * a 3× and a 1× shuffle of the fact table. Differentially tested
    * against the built-in `df.rollup` in AnalyticsSpec.
    *
    * The level branches all reference the finest frame; the single
    * fact-table scan is realized by AQE's stage reuse — the branches'
    * finest-agg exchanges canonicalize identically, so branches 2..n
    * become ReusedExchange over branch 1's materialized shuffle (asserted
    * on the executed plan in AnalyticsSpec). Running with AQE disabled
    * would re-scan per level: persist the finest frame eagerly in that
    * configuration.
    *
    * `aggSpecs` maps output name -> (finest-level agg over raw input,
    * re-agg over the finest result). count becomes (count(*), sum) —
    * the standard algebraic decomposition.
    */
  def groupingSetsAdditive(df: DataFrame, groupCols: Seq[(String, Column)],
                           aggSpecs: Seq[(String, Column, String => Column)],
                           sets: Seq[Seq[String]]): DataFrame = {
    val names = groupCols.map(_._1)
    require(sets.nonEmpty && sets.forall(_.forall(names.contains)),
      s"grouping sets must draw from $names")
    val finestAggs = aggSpecs.map { case (n, fin, _) => fin.as(n) }
    val finest = df.groupBy(groupCols.map { case (n, c) => c.as(n) }: _*)
      .agg(finestAggs.head, finestAggs.tail: _*)
    val levels = sets.map { set =>
      val reAggs = aggSpecs.map { case (n, _, re) => re(n).as(n) }
      val keyCols = names.map(n =>
        (if (set.contains(n)) col(n) else lit(null).cast(finest.schema(n).dataType)).as(n))
      val lvl = names.zipWithIndex
        .map { case (n, i) => if (set.contains(n)) 0L else 1L << (names.length - 1 - i) }
        .sum
      val grouped =
        if (set.isEmpty) finest.groupBy()
        else finest.groupBy(set.map(col): _*)
      grouped.agg(reAggs.head, reAggs.tail: _*)
        .select(keyCols ++ aggSpecs.map { case (n, _, _) => col(n) }
          :+ lit(lvl).as("lvl"): _*)
    }
    levels.reduce(_.unionByName(_))
  }

  /** ROLLUP levels: (a,b,...,z), (a,b,...), ..., (a), (). */
  def rollupAdditive(df: DataFrame, groupCols: Seq[(String, Column)],
                     aggSpecs: Seq[(String, Column, String => Column)]): DataFrame =
    groupingSetsAdditive(df, groupCols, aggSpecs,
      groupCols.indices.reverse.map(i => groupCols.take(i + 1).map(_._1)) :+ Seq.empty)

  /** CUBE levels: every subset of the grouping columns. */
  def cubeAdditive(df: DataFrame, groupCols: Seq[(String, Column)],
                   aggSpecs: Seq[(String, Column, String => Column)]): DataFrame = {
    val names = groupCols.map(_._1)
    val subsets = (0 until (1 << names.length)).map(mask =>
      names.zipWithIndex.collect { case (n, i) if (mask & (1 << i)) != 0 => n })
    groupingSetsAdditive(df, groupCols, aggSpecs, subsets)
  }

  /** Exact distinct count per group — the oracle/verification path. A
    * distinct count cannot partially aggregate: Spark plans it as a
    * two-phase shuffle (distinct-ize on (keys, value), then count), so the
    * full (keys, value) domain crosses the wire once. */
  def distinctCount(df: DataFrame, keys: Seq[Column], value: Column,
                    as: String): DataFrame =
    df.groupBy(keys: _*).agg(count_distinct(value).as(as))

  /** Approximate distinct count per group (HyperLogLog++): the sketch is
    * mergeable, so partial aggregation applies — each map task sends one
    * fixed-size sketch per group instead of the distinct value domain.
    * At 100 TB this is THE distinct-count plan (the exact twin exists for
    * verification); `rsd` trades sketch size for error (default 5%).
    * AnalyticsSpec pins the relative error against the exact count. */
  def approxDistinctCount(df: DataFrame, keys: Seq[Column], value: Column,
                          as: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(keys: _*).agg(approx_count_distinct(value, rsd).as(as))

  /** Z-score outlier flagging per group: two-pass — a tiny per-group
    * (avg, stddev_samp) aggregate broadcast back onto the fact rows, then
    * a pure-expression score. The stats frame has group-count rows, so the
    * join is always broadcast; the fact table is scanned once and never
    * shuffled (partial agg handles the stats pass map-side).
    * Degenerate groups (stddev null or 0 — fewer than 2 rows or constant)
    * yield null z and false flag. `roundStats` rounds the broadcast stats
    * so an external engine reproduces the division bit-for-bit. */
  def zscoreOutliers(df: DataFrame, keys: Seq[String], valueCol: Column,
                     threshold: Double,
                     roundStats: Option[Int] = None): DataFrame = {
    val keyCols = keys.map(col)
    def r(c: Column): Column = roundStats match {
      case Some(n) => round(c * pow(lit(10.0), n)) / pow(lit(10.0), n)
      case None => c
    }
    val stats = df.groupBy(keyCols: _*)
      .agg(r(avg(valueCol)).as("__mu"), r(stddev_samp(valueCol)).as("__sd"))
    val z = when(col("__sd").isNotNull && col("__sd") > 0,
      (valueCol - col("__mu")) / col("__sd"))
    df.join(broadcast(stats), keys)
      .withColumn("z", z)
      .withColumn("is_outlier", coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__mu", "__sd")
  }

  /** Time-decayed (half-life) aggregate — the feature-store staple: per
    * key, `Σ value·2^(−age/halfLife)` and the decayed event count, where
    * age = anchor − event time in seconds. A 7-day half-life means an
    * event a week old contributes half of a fresh one; recency-weighted
    * activity scores, trending counters, and decay-weighted CTRs are all
    * this aggregate with different value columns.
    *
    * ONE hash aggregate with map-side partial combine — the weights are
    * per-row expressions, so a 100 TB event log shuffles only its
    * per-key partial sums; the anchor is a caller-supplied epoch (pass
    * "now"), NOT a driver-side action over the data. Per-row
    * contributions are quantized to micro-units
    * (`round(value·w·1e6) AS BIGINT`) and summed as exact longs, making
    * the result order-independent across partitions/retries (the fp-sum
    * non-associativity note on [[graft.operators.SimilarityOps]]
    * centroids) and oracle-reproducible; the only cross-engine fp
    * surface is one `pow` per row, and a ≤1-ulp pow difference only
    * matters on the vanishing set of values landing exactly on a
    * half-micro-unit boundary. Returns keys + (n_events, decayed_count,
    * decayed_sum); null values contribute count weight but no sum. */
  def decayedAgg(df: DataFrame, keys: Seq[Column], tsCol: Column,
                 valueCol: Column, halfLifeSeconds: Long,
                 anchorEpochSeconds: Long): DataFrame = {
    val age = (lit(anchorEpochSeconds) - unix_timestamp(tsCol)).cast("double")
    val w = pow(lit(2.0), -age / lit(halfLifeSeconds.toDouble))
    val micro = lit(1000000.0)
    val cMicro = round(valueCol * w * micro).cast("long")
    val wMicro = round(w * micro).cast("long")
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_events"),
        (sum(wMicro).cast("double") / micro).as("decayed_count"),
        (sum(cMicro).cast("double") / micro).as("decayed_sum"))
  }

  /** Membership labeling via semi/anti join: every left row tagged
    * `'present'` or `'absent'` by key existence on the right. Two hash
    * joins of the same shape (Spark plans left_semi/left_anti without
    * materializing right-side payloads; AQE broadcasts a small right).
    * No row explosion regardless of right-side duplication — this is the
    * EXISTS / NOT EXISTS plan, not an equi-join + distinct. */
  def membershipLabel(left: DataFrame, right: DataFrame,
                      keys: Seq[String], as: String): DataFrame = {
    val present = left.join(right, keys, "left_semi").withColumn(as, lit("present"))
    val absent = left.join(right, keys, "left_anti").withColumn(as, lit("absent"))
    present.unionByName(absent)
  }

  /** Per-stratum quantile bucketing: `ntile(n)` over (orderCol, tieBreak)
    * within each key — deciles/quartiles of a score per language, the
    * curation primitive behind "keep the top quality decile per stratum".
    * The tie-break makes the total order (and therefore every bucket
    * boundary) deterministic, which is what lets an external engine
    * reproduce the assignment exactly — NTILE semantics (equal buckets,
    * remainder spread over the leading buckets) are standard SQL.
    * One shuffle + per-stratum sort; a billion-row skewed stratum gets the
    * same medicine as E17: compute approximate percentile thresholds
    * instead (CurationOps.qualityTopQuantile) when the sort is the
    * bottleneck — ntile is the exact path. */
  def quantileBuckets(df: DataFrame, keys: Seq[Column], orderCol: Column,
                      tieBreak: Column, n: Int, as: String): DataFrame =
    df.withColumn(as, ntile(n).over(
      Window.partitionBy(keys: _*).orderBy(orderCol, tieBreak)))

  /** Order-independent table content checksum: per row, the portable
    * 60-bit hash of the null-sentineled, '|'-joined string forms of
    * `cols`; summed EXACTLY in decimal (order-independent — fp sums are
    * not, and a 100 TB scan's partition order never repeats) together
    * with the row count. Two tables with equal (n_rows, checksum) match
    * with collision probability ~n²/2⁶¹; comparing replicas, validating a
    * migration, or sealing a snapshot costs one scan + a 1-row exchange
    * each side, and any engine that can do md5 reproduces the value.
    * Checksum is emitted as a STRING: a DECIMAL(38,0) surface form
    * hash-compares across engines only via its digits (the round-1
    * decimal-rendering lesson).
    *
    * Caveat: string forms must round-trip identically — integers and
    * strings always do; doubles can differ in scientific-notation
    * thresholds across engines, so cast/round them explicitly first. */
  def tableChecksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val key = concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    df.select(graft.functions.Hashing.hash60(key).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast("decimal(38,0)")).cast("string").as("checksum"))
  }

  /** Ordered-step funnel analysis: per user, the greedy earliest traversal
    * of `steps` — stage k is reached by the FIRST step-k event that occurs
    * strictly after the event that reached stage k-1, in the (ts, tieBreak)
    * total order. Returns one row per user that has at least one step
    * event: (user_id, stage = steps reached, step_ts = array of the
    * reaching events' timestamps, one entry per completed stage).
    *
    * The greedy earliest traversal equals the chained-min definition
    * (t_k = min step-k event with (ts, tie) > (ts, tie) of t_{k-1}), which
    * is what the DuckDB oracle computes; the tie-break makes the order
    * total, so equal timestamps cannot flip the result between engines.
    *
    * Plan: filter to step events (the non-step bulk of a 100 TB event log
    * never shuffles), map step → index with a when-chain, ONE shuffle to
    * `collect_list` per user, then a per-row `sort_array` + `aggregate`
    * fold — no self-joins, no per-step passes, state per user = that
    * user's step events only. A user with pathologically many step events
    * is the same monster-key hazard as [[movingAgg]]: cap per-user events
    * upstream (e.g. a time slice) if one key dominates. */
  def funnel(df: DataFrame, userCol: Column, tsCol: Column, tieBreak: Column,
             eventCol: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct: $steps")
    val stepIdx = steps.zipWithIndex
      .map { case (s, i) => when(eventCol === s, lit(i)) }
      .reduce(coalesce(_, _))
    val sorted = sort_array(collect_list(
      struct(col("__ts").as("ts"), col("__tie").as("tie"),
        col("__step").as("step"))))
    val init = struct(lit(0).as("stage"),
      array().cast("array<timestamp>").as("step_ts"))
    val folded = aggregate(sorted, init, (acc, e) =>
      when(e.getField("step") === acc.getField("stage"),
        struct((acc.getField("stage") + 1).as("stage"),
          concat(acc.getField("step_ts"),
            array(e.getField("ts"))).as("step_ts")))
      .otherwise(acc))
    // null-timestamp events are dropped, not sorted-first: a null ts has
    // no place in the "strictly after" order, and engines disagree on
    // null placement inside struct minima
    df.select(userCol.as("user_id"), tsCol.as("__ts"), tieBreak.as("__tie"),
        stepIdx.as("__step"))
      .filter(col("__step").isNotNull && col("__ts").isNotNull)
      .groupBy("user_id")
      .agg(folded.as("__f"))
      .select(col("user_id"), col("__f.stage").as("stage"),
        col("__f.step_ts").as("step_ts"))
  }

  /** Event-transition counts (the Markov/path-analysis primitive behind
    * "where do users go next"): per user, consecutive event pairs in the
    * strict (ts, tieBreak) order → (prev_event, event, n_transitions).
    * One shuffle on the user + per-user sort feeding a single `lag`
    * window, then a pair-count aggregate whose key domain is
    * |event types|² — the output is transition-matrix-sized regardless
    * of event volume (map-side combine collapses the pairs). First
    * events per user have no predecessor and are not transitions.
    * Null-timestamp events are dropped (no place in the order). */
  def eventTransitions(df: DataFrame, userCol: Column, tsCol: Column,
                       tieBreak: Column, eventCol: Column): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    df.filter(tsCol.isNotNull)
      .select(userCol.as("__u"), tsCol.as("__ts"), tieBreak.as("__tie"),
        eventCol.as("event"))
      .withColumn("prev_event", lag(col("event"), 1).over(w))
      .filter(col("prev_event").isNotNull)
      .groupBy("prev_event", "event")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Retention cohort matrix: users bucketed by the time bucket of their
    * first event (cohort), counted as active per (cohort, offset) where
    * offset = whole `offsetSeconds` periods between the cohort bucket and
    * the activity bucket. Returns (cohort_ts epoch-seconds, offset_n,
    * n_users). `truncUnit` is a `date_trunc` unit ("hour", "day", "week");
    * `offsetSeconds` must equal the bucket width so offsets are integral.
    *
    * Integral offsets additionally require fixed-width buckets: run with a
    * UTC session timezone (graft's default) for "day"/"week" truncation —
    * in a DST timezone a 23/25-hour day makes (bucket − cohort) a
    * non-multiple of `offsetSeconds`, and engines then disagree on the
    * fractional bucket (Spark floors here, ANSI CAST rounds half-even).
    * The floor() below pins graft's own behavior either way; the
    * cross-engine contract is UTC + matching width.
    *
    * Plan: ONE hash aggregate distinct-izes (user, bucket) — map-side
    * partial combine collapses the raw event volume, so the shuffle
    * carries distinct user-buckets, not events. A window-min over user
    * derives each user's cohort on that deduplicated frame (second,
    * smaller shuffle), and the final (cohort, offset) count is a
    * group-count-sized aggregate. No joins; nothing event-sized crosses
    * the wire twice. */
  def retentionCohorts(df: DataFrame, userCol: Column, tsCol: Column,
                       truncUnit: String, offsetSeconds: Long): DataFrame = {
    val buckets = df
      .filter(tsCol.isNotNull) // a null ts is activity in no bucket
      .select(userCol.as("user_id"), date_trunc(truncUnit, tsCol).as("__b"))
      .distinct()
    val cohort = min(col("__b")).over(Window.partitionBy(col("user_id")))
    buckets.withColumn("__cohort", cohort)
      .select(unix_timestamp(col("__cohort")).as("cohort_ts"),
        floor((unix_timestamp(col("__b")) - unix_timestamp(col("__cohort")))
          / lit(offsetSeconds)).cast("long").as("offset_n"))
      .groupBy("cohort_ts", "offset_n")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-partition content checksum: [[tableChecksum]] grouped by a
    * partition key — (part_key, n_rows, checksum DECIMAL(38,0)). One scan
    * + one hash aggregate whose key domain is the partition count; the
    * checksum column is kept as decimal for engine-internal comparison
    * ([[diffPartitionChecksums]]), not for cross-engine rendering. Same
    * string-form caveat as tableChecksum: cast/round doubles first. */
  def partitionChecksum(df: DataFrame, partCol: Column,
                        cols: Seq[Column]): DataFrame = {
    val key = concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    df.select(partCol.as("part_key"),
        graft.functions.Hashing.hash60(key).as("__h"))
      .groupBy("part_key")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast("decimal(38,0)")).as("checksum"))
  }

  /** Partition-level snapshot diff: which partitions were added, removed,
    * changed, or left intact between two [[partitionChecksum]] frames —
    * the incremental-refresh planner's question ("re-process only the
    * changed partitions") answered with one full-outer join of two
    * partition-count-sized frames, no row-level compare at all. The
    * row-level changelog for the changed partitions is [[CdcOps
    * .diffSnapshots]] restricted to them. Returns (part_key, status,
    * n_old, n_new); null partition keys compare null-safe. */
  def diffPartitionChecksums(oldCk: DataFrame, newCk: DataFrame): DataFrame = {
    val o = oldCk.select(col("part_key"), col("n_rows").as("n_old"),
      col("checksum").as("__co"))
    val n = newCk.select(col("part_key").as("__pk"), col("n_rows").as("n_new"),
      col("checksum").as("__cn"))
    o.join(n, col("part_key") <=> col("__pk"), "full_outer")
      .select(coalesce(col("part_key"), col("__pk")).as("part_key"),
        when(col("__co").isNull, "added")
          .when(col("__cn").isNull, "removed")
          .when(col("__co") === col("__cn") && col("n_old") === col("n_new"),
            "same")
          .otherwise("changed").as("status"),
        col("n_old"), col("n_new"))
  }

  /** Fixed-width histogram: values binned into `nBins` equal `[lo, hi)`
    * buckets (outside values clamp to the edge bins), one count per
    * non-empty bin with its bounds. The groupBy key has at most `nBins`
    * values, so map-side partial aggregation collapses virtually all rows
    * before the (tiny) shuffle — the plan is a single fact scan. Bin
    * arithmetic is single correctly-rounded IEEE ops, reproducible in any
    * engine. */
  def fixedWidthHistogram(df: DataFrame, valueCol: Column, lo: Double,
                          hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"need hi > lo and nBins > 0")
    val width = (hi - lo) / nBins
    val raw = floor((valueCol - lit(lo)) / lit(width)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(nBins - 1L))
    df.select(bin.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("bin_hi"),
        col("cnt"))
  }

  /** Distribution drift report between a reference and a current snapshot of
    * the same column — the crawl-over-crawl / release-over-release corpus
    * monitor. Values bucket against caller-supplied ascending `edges`
    * (bucket = number of edges ≤ value, so bucket 0 is (-∞, edges(0)) and
    * bucket `edges.size` is [edges.last, ∞)); per bucket the report carries
    * both counts, both proportions, and the bucket's PSI and KL(cur‖ref)
    * contributions — `psi_term = (p_cur − p_ref)·ln(p_cur/p_ref)`,
    * `kl_term = p_cur·ln(p_cur/p_ref)` — with proportions clamped at `eps`
    * so one-sided buckets stay finite (the standard PSI convention). Sum
    * the columns for the scalar indices (PSI > 0.2 ≈ "investigate").
    *
    * Edges are a PARAMETER, not derived from the data: at 100 TB you fix
    * them once (e.g. reference-quantile edges) so every snapshot buckets
    * identically and reports stay comparable across runs. The plan is the
    * cheapest possible: tag each side with a literal, union, and run ONE
    * hash aggregate whose key has ≤ edges.size+1 values — map-side combine
    * collapses both scans to ≤ B+1 partial rows each, so the shuffle and
    * everything after it is bucket-sized. The proportion window runs on
    * that tiny aggregate, never on the fact data. Buckets empty on BOTH
    * sides are omitted (they contribute zero drift); a bucket present on
    * one side reports 0 for the other. Null values are excluded. */
  def distributionDrift(ref: DataFrame, cur: DataFrame, valueCol: Column,
                        edges: Seq[Double], eps: Double = 1e-6): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted,
      s"edges must be non-empty ascending: $edges")
    def side(df: DataFrame, tag: Int): DataFrame = df
      .filter(valueCol.isNotNull)
      .select(driftBucket(valueCol, edges).as("bucket"), lit(tag).as("__side"))
    val counts = side(ref, 0).unionAll(side(cur, 1))
      .groupBy("bucket")
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("n_cur"))
    driftFromBucketCounts(counts, eps)
  }

  /** Bucket index of `valueCol` against ascending `edges` (0..edges.size) —
    * the shared bucketing of [[distributionDrift]] and its streaming
    * monitor twin. */
  def driftBucket(valueCol: Column, edges: Seq[Double]): Column =
    edges.map(e => when(valueCol >= lit(e), 1).otherwise(0)).reduce(_ + _)

  /** Drift report over a PRE-AGGREGATED (bucket, n_ref, n_cur) table.
    * Bucket counts are additive, so a streaming monitor maintains them
    * incrementally (per-trigger partial counts merged by bucket-sum in
    * foreachBatch) and recomputes this bucket-sized report per trigger —
    * no fact-data rescan; proven equal to the batch operator in
    * StreamingSpec. */
  def driftFromBucketCounts(counts: DataFrame, eps: Double = 1e-6): DataFrame = {
    require(eps > 0.0, s"eps must be positive: $eps")
    val w = Window.partitionBy() // global — over the ≤ B+1 aggregated rows
    val pRef = greatest(col("n_ref").cast("double") / sum("n_ref").over(w), lit(eps))
    val pCur = greatest(col("n_cur").cast("double") / sum("n_cur").over(w), lit(eps))
    counts
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        pRef.as("p_ref"), pCur.as("p_cur"))
      .select(col("bucket"), col("n_ref"), col("n_cur"), col("p_ref"),
        col("p_cur"),
        ((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
          .as("psi_term"),
        (col("p_cur") * log(col("p_cur") / col("p_ref"))).as("kl_term"))
  }

  /** Join-key skew report: the top-N heaviest keys of a prospective
    * join/group key with integer share metrics — the decision input for
    * salting (E21), broadcast thresholds, and AQE skew-join tuning BEFORE
    * paying for the 100 TB join itself.
    *
    * Per top key: cnt, n_keys (global distinct count, repeated),
    * share_ppm = cnt·10⁶ div total, and xmean_x100 = share_ppm·n_keys
    * div 10⁴ (≈ 100 × cnt/mean-count — 100 means "exactly uniform").
    * All floor integer divisions, bit-reproducible in any engine; staging
    * through share_ppm keeps every product under int64 up to ~10¹² rows
    * × 10¹² keys. Null keys are excluded (they never participate in an
    * equi-join).
    *
    * Plan: one hash aggregate on the key (map-side combine — a mega-key
    * flattens in the partials), a 1-row total re-aggregated from the
    * key-sized counts (broadcast back), and a top-N that fuses to
    * TakeOrderedAndProject — each map task forwards ≤ N rows, so the
    * report never materializes the key population on one node. */
  def skewReport(df: DataFrame, keyCol: Column, topN: Int = 20): DataFrame =
    skewReportFromCounts(
      df.filter(keyCol.isNotNull)
        .groupBy(keyCol.as("key")).agg(count(lit(1)).as("cnt")),
      topN)

  /** Report stage over a PRE-AGGREGATED (key, cnt) table. Key counts are
    * additive, so a streaming monitor maintains them incrementally
    * (per-trigger partial counts merged by key-sum in foreachBatch) and
    * recomputes this report per trigger without rescanning the stream
    * history — proven equal to the batch operator in StreamingSpec. */
  def skewReportFromCounts(counts: DataFrame, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1: $topN")
    val totals = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"), col("n_keys"),
        expr("cnt * 1000000 div __total").as("share_ppm"))
      .withColumn("xmean_x100", expr("share_ppm * n_keys div 10000"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
  }

  /** Robust per-key outlier statistics via median absolute deviation — the
    * data-QA complement of [[zscoreOutliers]]: mean/stddev are themselves
    * dragged by the outliers they're meant to flag, while the median and
    * MAD have a 50% breakdown point, so a corrupted feed (a sensor stuck
    * at 1e9, a currency field parsed in cents) still yields sane
    * thresholds. A value is an outlier when `|v − med| > nSigma · MAD`
    * (callers wanting the normal-consistent scale fold 1.4826 into
    * `nSigma`).
    *
    * Medians use the rank-defined LOWER median (rank `(n−1) div 2 + 1` on
    * non-null values — the [[CurationOps.winsorize]] exact-quantile
    * convention): an exact data value, no fp interpolation, so the DuckDB
    * twin replays it bit-for-bit. `exact = true` runs two per-key
    * sort+rank window passes (each buffers a key group in WindowExec —
    * right for the oracle and for bounded key groups); at crawl scale set
    * `exact = false` for two `percentile_approx` hash aggregates (no
    * sort, map-side combine, same output shape). The per-key stats table
    * (one row per key) broadcasts back for the flag pass.
    *
    * Output: keys :+ (n_vals, med, mad, n_outliers) — nulls are excluded
    * from ranks, counts, and flags. */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: Column,
                  nSigma: Double = 3.0, exact: Boolean = true,
                  accuracy: Int = 10000): DataFrame = {
    require(nSigma > 0, s"nSigma must be positive: $nSigma")
    val keyCols = keys.map(col)
    val base = df.select(keyCols :+ valueCol.as("__v"): _*)
      .filter(col("__v").isNotNull)
    def lowerMedian(d: DataFrame, v: String, out: String): DataFrame =
      if (exact) {
        val w = Window.partitionBy(keyCols: _*).orderBy(col(v).asc)
        d.withColumn("__rn", row_number().over(w).cast("long"))
          .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCols: _*)))
          .groupBy(keyCols: _*)
          .agg(max(when(col("__rn") === expr("(__n - 1) div 2") + 1, col(v)))
            .as(out))
      } else {
        d.groupBy(keyCols: _*)
          .agg(percentile_approx(col(v), lit(0.5), lit(accuracy)).as(out))
      }
    val med = lowerMedian(base, "__v", "med")
    val dev = base.join(broadcast(med), keys)
      .withColumn("__ad", abs(col("__v") - col("med")))
    val mad = lowerMedian(dev, "__ad", "mad")
    dev.join(broadcast(mad), keys)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_vals"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("__ad") > lit(nSigma) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Item co-occurrence (market-basket pairs): for every unordered item
    * pair sharing a basket, the number of baskets containing both, each
    * item's basket count, and the lift
    * `(n_ab · B) / (n_a · n_b)` (association strength; 1.0 = independent).
    * The "co-visited destinations" / "co-purchased products" query, and in
    * a training-data pipeline the co-occurrence statistics behind
    * PMI-style association mining on structured logs (the token-level twin
    * is [[TextOps]] bigram PMI).
    *
    * Plan: distinct (basket, item) [one exchange on the pair], basket
    * sizes via a partition-local-friendly hash aggregate, then a
    * basket-keyed SELF-join generates each basket's pairs — both sides
    * arrive hash-partitioned on `basket`, so the join adds no exchange
    * beyond the re-key. Fan-out per basket is `size²`, which is why
    * `maxBasketSize` is load-bearing: one degenerate mega-basket (a
    * crawler session touching every item) would otherwise dominate the
    * whole job; baskets above the cap are DROPPED (standard market-basket
    * practice — a basket with thousands of items carries no pairwise
    * signal anyway), and all counts (n_a, n_b, B) are computed over the
    * kept baskets so lift stays internally consistent. Pair counts and
    * item counts are map-side-combined hash aggregates; the lift chain is
    * a fixed-shape IEEE double expression, deterministic across engines.
    *
    * Output: (item_a, item_b, n_ab, n_a, n_b, lift) with item_a < item_b,
    * pairs below `minPairCount` pruned (prunes the random-collision tail,
    * which at crawl scale is the bulk of the output). */
  def coOccurrence(df: DataFrame, basketCol: Column, itemCol: Column,
                   minPairCount: Long = 2L,
                   maxBasketSize: Int = 10000): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2: $maxBasketSize")
    // ONE exchange on the basket key feeds the whole pair-generation
    // stage: after repartition(basket), the (basket, item) dedupe, the
    // basket sizes, the size filter join, and the pair self-join are all
    // partition-local (HashPartitioning(basket) satisfies every clustered
    // distribution keyed by basket) — the E93 single-exchange discipline.
    // The deduped frame is materialized EAGERLY (checkpoint preserves the
    // partitioning) because four consumers read it: a lazy plan would
    // recompute the scan+dedupe per consumer (measured: 23 exchanges vs
    // 10, see OlapPlanSpec).
    // HEAP-AWARE checkpoint placement: this is the one checkpoint in the
    // engine whose block is both huge (one row per (basket, item) — 60M
    // at sf10, ~600M at sf100) and co-resident with the job's hungriest
    // execution stage (the SMJ self-join + pair-count partials). Local
    // checkpoints cannot be recomputed, so Spark never evicts them — the
    // block's resting place is a RESOURCE TRADE, and the right side of
    // the trade flips with the heap:
    //  - SMALL heap (≤ 16 g): an in-memory pin squeezes execution. The
    //    r12 deserialized default OOMed 8 g outright; the r12-r15
    //    MEMORY_AND_DISK_SER pin packed ~5× tighter and held 8 g for
    //    three rounds but regressed day-fragile (r15 record OOM; r16
    //    reproduced it isolated — Java heap space inside
    //    smj_findNextJoinRows). DISK_ONLY removes the storage-region
    //    co-residency entirely: measured r16, isolated same-session
    //    3-trial at sf10 — ser-8g OOM, DISK_ONLY-8g 42.8 s, and at 16 g
    //    ser 39.0 s vs DISK_ONLY 39.5 s (≈1%, noise).
    //  - BIG heap (> 16 g): memory is abundant and DISK is the scarce
    //    budget — at sf100 the ~25 GB uncompressed DISK_ONLY block plus
    //    the pair stage's ~37 GB spill cannot co-reside on this
    //    sandbox's ~52 GB free (measured r16: 3/3 trials died "No space
    //    left on device"), while the serialized memory-first pin rides
    //    the 64 g storage region exactly as the r15 record did (436.6 s
    //    isolated). MEMORY_AND_DISK_SER there.
    // At 1000-executor scale the same rule reads: write the stage table
    // to whichever tier the cluster actually has headroom in — the
    // threshold keys on executor memory, the one signal the JVM gives us.
    // Partitioning is preserved like any checkpoint either way.
    val items = df.select(basketCol.as("basket"), itemCol.as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .repartition(col("basket"))
      .dropDuplicates("basket", "item")
      .localCheckpoint(true, cooccurCheckpointLevel(
        executorHeapBytes(df.sparkSession)))
    val keptBaskets = items.groupBy(col("basket"))
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select(col("basket"))
    val kept = items.join(keptBaskets, "basket")
    // one scalar action: the kept-basket count anchoring lift (bounded
    // driver work, same discipline as the token-budget boundary scalars)
    val nBaskets = keptBaskets.count()
    coOccurrenceFromCounts(
      coOccurrencePairCounts(kept),
      kept.groupBy(col("item")).agg(count(lit(1)).as("n_i")),
      nBaskets, minPairCount)
  }

  /** Heap of the JVMs that will HOLD the checkpoint blocks, in bytes:
    * `spark.executor.memory` on a real cluster (localCheckpoint blocks
    * live on executors — the driver's own heap is the wrong signal
    * there), this JVM's max heap in local mode (driver == executor, and
    * local mode ignores spark.executor.memory, so the runtime value is
    * the only honest one). Parsed with Spark's own size-string rules;
    * executor memory defaults to 1g when unset, matching the deploy
    * default. Pinned by AnalyticsSpec. */
  private[graft] def executorHeapBytes(
      spark: org.apache.spark.sql.SparkSession): Long =
    if (spark.sparkContext.master.startsWith("local"))
      Runtime.getRuntime.maxMemory
    else
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.executor.memory", "1g"))

  /** Storage level for [[coOccurrence]]'s items checkpoint, keyed on the
    * executor heap ([[executorHeapBytes]] — see the placement rationale
    * at the call site): at or
    * below 16 GiB the unevictable block must stay OFF the heap
    * (DISK_ONLY — the measured 8 g envelope fix), above it memory is the
    * cheap tier and disk the scarce one (MEMORY_AND_DISK_SER — the
    * measured sf100 disk-budget fix). Pure function, pinned by
    * AnalyticsSpec. */
  private[graft] def cooccurCheckpointLevel(
      maxHeapBytes: Long): org.apache.spark.storage.StorageLevel =
    if (maxHeapBytes <= 16L * 1024 * 1024 * 1024)
      org.apache.spark.storage.StorageLevel.DISK_ONLY
    else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

  /** Pair-count partial of [[coOccurrence]] over a (basket, item) frame
    * (distinct rows, oversized baskets already dropped — the `kept` frame
    * [[coOccurrence]] builds internally). Exposed because pair counts are
    * ADDITIVE across disjoint basket sets: a streaming monitor computes
    * per-trigger partials over each micro-batch's baskets and merges by
    * (item_a, item_b)-sum in foreachBatch — the E86/E87/E93 monitor
    * pattern; item counts and the basket count merge the same way. The
    * one assumption is that a basket arrives WHOLE within one trigger
    * (group the source by basket id, e.g. Kafka-keyed by order id) — a
    * basket split across triggers would miss its cross-trigger pairs.
    * Proven batch-equal in StreamingSpec. */
  def coOccurrencePairCounts(kept: DataFrame): DataFrame =
    kept.select(col("basket"), col("item").as("item_a"))
      .join(kept.select(col("basket"), col("item").as("item_b")), "basket")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))

  /** Report stage of [[coOccurrence]] over pre-aggregated pair counts
    * (item_a, item_b, n_ab), item counts (item, n_i), and the basket
    * count. Two item-keyed joins + the fixed-shape IEEE lift chain. */
  def coOccurrenceFromCounts(pairCounts: DataFrame, itemCounts: DataFrame,
                             nBaskets: Long,
                             minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    pairCounts
      .filter(col("n_ab") >= minPairCount)
      .join(itemCounts.select(col("item").as("item_a"), col("n_i").as("n_a")),
        "item_a")
      .join(itemCounts.select(col("item").as("item_b"), col("n_i").as("n_b")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(col("n_ab").cast("double") * lit(nBaskets)
            / (col("n_a").cast("double") * col("n_b")) * lit(10000.0))
          / lit(10000.0) as "lift")
  }

  /** Last-touch attribution with a lookback window — "which touch gets
    * credit for this conversion": for every conversion event, the most
    * recent STRICTLY-EARLIER event of an attributable touch type by the
    * same user, provided it falls within `lookbackSec` of the conversion;
    * conversions with no touch in the window come back null-attributed
    * (organic).
    *
    * ONE window pass, NO join: events sort once per user and a running
    * `last(touch-struct, ignoreNulls)` over the strictly-preceding frame
    * carries the latest touch forward; the lookback is a filter on the
    * carried timestamp. The usual formulation — interval self-join then
    * argmax per conversion — shuffles the touch×conversion fan-out;
    * this shuffles each event exactly once. Per-user window groups are
    * bounded by per-user activity (the natural key for the data). Ties
    * on ts break by event id (struct ordering), so attribution is
    * deterministic under concurrent events.
    *
    * Output: one row per conversion — (event_id, user_id, ts,
    * touch_event_id, touch_ts, touch_type), touch_* null when organic. */
  def lastTouchAttribution(events: DataFrame, tsCol: String,
                           userCol: String, typeCol: String, idCol: String,
                           convType: String, touchTypes: Seq[String],
                           lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouchAttribution: no touch types")
    require(!touchTypes.contains(convType),
      "lastTouchAttribution: conversion type cannot also be a touch type")
    require(lookbackSec > 0, s"lookbackSec must be > 0: $lookbackSec")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).as("t"), col(idCol).as("id"),
        col(typeCol).as("ty")))
    events
      .withColumn("__lt", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .select(col(idCol).as("event_id"), col(userCol).as("user_id"),
        col(tsCol).as("ts"),
        when(col("__lt.t") >= col(tsCol) - expr(s"INTERVAL $lookbackSec SECOND"),
          col("__lt.id")).as("touch_event_id"),
        when(col("__lt.t") >= col(tsCol) - expr(s"INTERVAL $lookbackSec SECOND"),
          col("__lt.t")).as("touch_ts"),
        when(col("__lt.t") >= col(tsCol) - expr(s"INTERVAL $lookbackSec SECOND"),
          col("__lt.ty")).as("touch_type"))
  }

  /** Windowed top-k ("trending"): per tumbling event-time window, the k
    * heaviest keys by row count, rank-ordered with deterministic ties
    * (count desc, key asc). One hash aggregate (map-combined) over
    * (window, key), then a rank window PER TIME WINDOW whose groups are
    * bounded by key cardinality — and whose `rank <= k` filter plans as
    * WindowGroupLimit, so each task forwards at most k rows per window
    * before the final exchange (asserted for the same shape at t30).
    * For unbounded key domains at 100 TB, put the E26 Misra-Gries pass
    * in front to prune to candidate keys first; for streams, the
    * (window, key) counts are the watermark-evictable state and the
    * rank runs in foreachBatch over the closed windows.
    *
    * Output: (w_start epoch BIGINT, rank, key, n). */
  def windowedTopK(df: DataFrame, tsCol: String, windowDur: String,
                   keyCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"windowedTopK: k must be >= 1: $k")
    val counts = df.groupBy(window(col(tsCol), windowDur),
        keyCol.as("key"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("window"))
      .orderBy(col("n").desc, col("key").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(unix_timestamp(col("window.start")).as("w_start"),
        col("rank"), col("key"), col("n"))
  }

  /** Per-key HLL distinct-count sketches — the MERGEABLE form of
    * [[approxDistinctCount]], for when the answer has to update without
    * rescanning history: approx_count_distinct collapses to a number at
    * aggregation time, but a 100 TB pipeline wants the sketch ITSELF as
    * the artifact — built per shard / per micro-batch / per partition-day,
    * persisted, and unioned at read time ([[hllMergeSketches]]), with new
    * data folded in by another union instead of a rescan. Fixed-size
    * state (2^lgK registers per key), map-side combined, Datasketches
    * wire format (readable outside Spark).
    *
    * Honest accuracy contract (asserted, not hidden, in AnalyticsSpec):
    * estimates are set-semantic approximations. Below the sketch's exact
    * list/set threshold they EQUAL the precise distinct count and merge
    * exactly in any order (the streaming-monitor equality StreamingSpec
    * pins). Past it, a single-pass build reads through the HIP estimator
    * while merges read through the composite estimator, and the merge
    * ORDER perturbs how list-mode items fold into dense registers — so
    * one-pass, merge, and re-ordered merge may each differ by a fraction
    * of the configured error (all within it; lgK sizes the error,
    * 1.04/√2^lgK relative). Pipelines that need bit-identical re-runs
    * fix the shard list and fold order — both deterministic here — or
    * stay on [[approxDistinctCount]] for one-shot answers. No DuckDB
    * twin: the oracle engine's HLL is a different implementation;
    * correctness is spec-gated like the sinks (A27-A30 precedent). */
  def hllSketches(df: DataFrame, keys: Seq[Column], valueCol: Column,
                  lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*)
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))

  /** Union independently built sketch tables (same lgK) by key — the
    * shard/micro-batch merge law: estimates after merge equal a single
    * build over the union of the inputs. */
  def hllMergeSketches(keyNames: Seq[String],
                       sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "hllMergeSketches: nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(keyNames.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))
  }

  /** Readout: (keys..., uniq) long estimates from a sketch table. */
  def hllEstimates(sketches: DataFrame): DataFrame =
    sketches.withColumn("uniq", hll_sketch_estimate(col("sketch")))
      .drop("sketch")

  /** Per-key KLL quantile sketches — the quantile twin of [[hllSketches]]
    * (E109) and the mergeable form of the percentile_approx plans used
    * across the winsorize/MAD/top-quantile operators: the sketch is the
    * ARTIFACT (built per shard/micro-batch, persisted as bytes, unioned
    * at read time, new data folded by union — no rescan). Backed by the
    * native [[graft.functions.KllSketchAgg]] TypedImperativeAggregate
    * (Datasketches KLL, fixed-size state, map-side combined).
    *
    * Honesty contract (see KllQuantiles' scaladoc): KLL compaction is
    * randomized by design — past ~k retained items, re-runs may differ
    * within the published rank-error bound; below it the sketch is exact
    * and merge-invariant, which is what the specs pin. */
  def kllSketches(df: DataFrame, keys: Seq[Column], valueCol: Column,
                  k: Int = 200): DataFrame =
    df.groupBy(keys: _*)
      .agg(call_function("graft_kll_agg", valueCol.cast("double"), lit(k))
        .as("sketch"))

  /** Union independently built KLL sketch tables by key. `k` must be >=
    * the k the inputs were built with — the merge buffer participates in
    * the library's smallest-k-wins rule. The degradation cannot happen
    * silently: the merge aggregate reads each input sketch's k from its
    * header and FAILS the job if it exceeds the buffer's k, so this no-k
    * overload is safe for default-k sketches and loud for everything
    * else (use [[kllMergeSketchesK]] for higher-k inputs). */
  def kllMergeSketches(keyNames: Seq[String],
                       sketches: DataFrame*): DataFrame =
    kllMergeSketchesK(keyNames, graft.functions.KllQuantiles.DefaultK,
      sketches: _*)

  def kllMergeSketchesK(keyNames: Seq[String], k: Int,
                        sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "kllMergeSketches: nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(keyNames.map(col): _*)
      .agg(call_function("graft_kll_merge", col("sketch"), lit(k))
        .as("sketch"))
  }

  /** Readout: (keys..., quantiles array<double>) for the given ranks. */
  def kllQuantiles(sketches: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"kllQuantiles: ranks must be in [0, 1]: $qs")
    sketches.withColumn("quantiles",
        call_function("graft_kll_quantiles", col("sketch"),
          array(qs.map(lit): _*)))
      .drop("sketch")
  }

  /** Distributed logistic regression by full-batch gradient descent — the
    * quality-classifier training loop (fastText-style doc filters, CCNet's
    * "looks like Wikipedia" gate) as an engine operator, bit-reproducible
    * across engines. Each round is ONE map-combined hash aggregate over
    * the corpus (d+1 gradient sums) + a 1-row driver collect and weight
    * update (bounded driver work — the PageRank node-count / BPE argmax
    * convention); `rounds` rounds = `rounds` linear passes, no per-round
    * corpus rewrite, no driver-side feature rows. 100 TB trains at the
    * cost of `rounds` scans.
    *
    * Numeric discipline (the t37/E101 conventions, extended): weights
    * live on the int64 MICRO grid; each row's gradient contribution
    * `(p − y)·x_i` quantizes to micro BEFORE summing, so the sums are
    * exact integers — order-independent and engine-portable. The sums
    * accumulate in DECIMAL(38,0) (at 10¹² rows an int64 gradient sum
    * can overflow; DuckDB widens to HUGEINT on its own), and the update
    * divides with FLOOR semantics via BigInt driver arithmetic —
    * matching DuckDB's `//` (Spark's integer `div` truncates toward
    * zero and would disagree one micro on negative gradients, the t37
    * division lesson). The per-row sigmoid uses libm `exp` (≤1 ulp
    * across engines — flips a rounded micro only on a measure-zero
    * boundary set, the decayedAgg/t37 argument). z accumulates
    * left-to-right in the feature order, both engines.
    *
    * Features should be small-magnitude integers (casts to double are
    * then exact); the caller owns feature scaling — big features slow
    * convergence and widen the gradient grid, same as any GD.
    *
    * Output: (id, y, p_micro, pred) for every input row, scored with the
    * final-round weights; `weightsMicro` exposes the trained vector
    * (bias first) for persisting as a model artifact. */
  def logisticScores(df: DataFrame, idCol: Column, features: Seq[Column],
                     labelCol: Column, rounds: Int,
                     lrPpm: Long): DataFrame = {
    require(features.nonEmpty, "logisticScores: no features")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(lrPpm >= 1, s"lrPpm must be >= 1: $lrPpm")
    val d = features.size
    val base = df.select(
      Seq(idCol.as("id"), labelCol.cast("int").as("y")) ++
        features.zipWithIndex.map { case (f, i) =>
          f.cast("double").as(s"x$i") }: _*)
      .localCheckpoint(true) // rounds+1 consumers of the feature projection
    val n = base.count()
    require(n >= 1, "logisticScores: empty input")
    val w = trainWeights(base, d, n, rounds, lrPpm)
    base.select(col("id"), col("y"),
      round(prob(w, d) * lit(1000000.0)).cast("long").as("p_micro"))
      .withColumn("pred", (col("p_micro") >= 500000L).cast("int"))
  }

  /** Trained weight vector (micro grid, bias first) — the model artifact. */
  def logisticWeightsMicro(df: DataFrame, features: Seq[Column],
                           labelCol: Column, rounds: Int,
                           lrPpm: Long): Array[Long] = {
    val d = features.size
    val base = df.select(
      Seq(labelCol.cast("int").as("y")) ++
        features.zipWithIndex.map { case (f, i) =>
          f.cast("double").as(s"x$i") }: _*)
      .localCheckpoint(true)
    trainWeights(base, d, base.count(), rounds, lrPpm)
  }

  /** z = w0 + Σ wᵢ·x_{i-1}, left-to-right, weights as exact double
    * literals off the micro grid; p = 1/(1+exp(−z)). */
  private def prob(w: Array[Long], d: Int): Column = {
    val z = (0 to d).map { i =>
      val wd = lit(w(i).toDouble / 1000000.0)
      if (i == 0) wd else wd * col(s"x${i - 1}")
    }.reduceLeft(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  private def trainWeights(base: DataFrame, d: Int, n: Long, rounds: Int,
                           lrPpm: Long): Array[Long] = {
    var w = Array.fill(d + 1)(0L)
    def floorDivBig(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a % b != 0 && (a < 0) != (b < 0)) q - 1 else q
    }
    for (_ <- 0 until rounds) {
      val p = prob(w, d)
      val aggs = (0 to d).map { i =>
        val xi = if (i == 0) lit(1.0) else col(s"x${i - 1}")
        sum(round((p - col("y")) * xi * lit(1000000.0)).cast("long")
          .cast("decimal(38,0)")).as(s"g$i")
      }
      val row = base.agg(aggs.head, aggs.tail: _*).collect()(0)
      w = w.zipWithIndex.map { case (wm, i) =>
        val g = BigInt(row.getDecimal(i).toBigInteger)
        wm - floorDivBig(BigInt(lrPpm) * g,
          BigInt(n) * BigInt(1000000L)).toLong
      }
    }
    w
  }
}
