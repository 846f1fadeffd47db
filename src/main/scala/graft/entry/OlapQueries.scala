package graft.entry

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.AnalyticsOps
import QueryHelpers._

/** OLAP analytics queries (SURVEY.md §2E E44-E51, E55-E58, E64-E68,
  * E72, E76): sliding windows, moving aggregates, approximate distinct,
  * z-score outliers, additive rollup, set operations, semi/anti
  * membership, histograms, resample/OHLC, fuzzy join, incremental agg,
  * funnel/retention/winsorize, PageRank, and the TPC-H Q1/Q3/Q5 plans.
  * Key prefixes follow the family of the driving table (a* = events,
  * b* = TPC-H dimensions/facts).
  */
object OlapQueries {

  /** b46 iteration count — ONE constant drives both the Spark plan and the
    * generated unrolled oracle, so they cannot drift. Each distributed
    * round costs a fixed join+agg+checkpoint cycle (~1 s locally
    * regardless of graph size); 4 rounds spread rank far enough to
    * discriminate hubs while keeping the per-round overhead visible in
    * bench honest. */
  val PageRankIters = 4

  val queries: Map[String, Q] = Map(
    "a32_sliding_window" -> ((s, dir) => {
      // E47: 10-minute windows hopping every 5 — each event lands in 2
      // windows. Identical call shape runs on a watermarked stream.
      AnalyticsOps.slidingWindowAgg(events(s, dir), "ts",
          "10 minutes", "5 minutes", Seq(col("event_type")),
          Seq(count(lit(1)).as("cnt"), decOut(sum(dec(col("value")))).as("value_sum")))
        .select(wStart(), col("event_type"), col("cnt"), col("value_sum"))
        .orderBy("w_start", "event_type")
    }),

    "a33_moving_avg" -> ((s, dir) => {
      // E48: per-user 3-event moving stats in (ts, event_id) order. The
      // decimal value column makes the frame sum exact, so the emitted
      // average is engine-portable (see AnalyticsOps.movingAgg).
      AnalyticsOps.movingAgg(events(s, dir), Seq(col("user_id")), "ts",
          col("event_id"), dec(col("value")), lookback = 3)
        .select(col("event_id"), col("user_id"),
          rnd(col("moving_avg")).as("mov_avg"),
          col("moving_min").cast("double").as("mov_min"),
          col("moving_max").cast("double").as("mov_max"),
          col("delta_prev").cast("double").as("delta_prev"))
        .orderBy("event_id")
    }),

    "a34_approx_distinct" -> ((s, dir) => {
      // E49 oracle path: exact distinct users per event type. Bench runs
      // the HyperLogLog sketch twin under the same key (benchOverrides).
      AnalyticsOps.distinctCount(events(s, dir), Seq(col("event_type")),
          col("user_id"), "uniq_users")
        .orderBy("event_type")
    }),

    "a35_zscore" -> ((s, dir) => {
      // E50: per-event-type z-score outlier flags; stats rounded to 6dp
      // so the oracle reproduces the division bit-for-bit.
      AnalyticsOps.zscoreOutliers(events(s, dir), Seq("event_type"),
          col("value"), threshold = 2.0, roundStats = Some(6))
        .select(col("event_id"), col("event_type"), rnd(col("z")).as("z"),
          col("is_outlier").cast("int").as("is_outlier"))
        .orderBy("event_id")
    }),

    "b36_rollup" -> ((s, dir) => {
      // E44: order-year × priority rollup via additive re-aggregation —
      // ONE shuffle of the fact table (Spark's built-in rollup Expands
      // every row once per level first). lvl follows grouping_id().
      AnalyticsOps.rollupAdditive(orders(s, dir),
          Seq("o_year" -> year(col("o_orderdate")), "o_prio" -> col("o_orderpriority")),
          Seq(
            ("n", count(lit(1)), (n: String) => sum(col(n))),
            ("spend_sum", sum(dec(col("o_totalprice"))), (n: String) => sum(col(n)))))
        .select(col("o_year"), col("o_prio"), col("n"),
          decOut(col("spend_sum")).as("spend_sum"), col("lvl"))
        .orderBy("lvl", "o_year", "o_prio")
    }),

    "b37_set_ops" -> ((s, dir) => {
      // E45: INTERSECT / EXCEPT over two derived key sets (1996 vs 1997
      // purchasers), each branch tagged. Spark plans these as left-semi /
      // left-anti aggregates — no row explosion.
      val o = orders(s, dir)
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
      y96.intersect(y97).withColumn("tag", lit("both"))
        .unionByName(y96.except(y97).withColumn("tag", lit("only_1996")))
        .unionByName(y97.except(y96).withColumn("tag", lit("only_1997")))
        .orderBy("o_custkey")
    }),

    "b38_semi_anti" -> ((s, dir) => {
      // E46: EXISTS / NOT EXISTS membership labeling of customers against
      // the orders fact.
      AnalyticsOps.membershipLabel(
          customer(s, dir).select("c_custkey", "c_mktsegment"),
          orders(s, dir).select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), as = "has_orders")
        .orderBy("c_custkey")
    }),

    "b39_histogram" -> ((s, dir) => {
      // E51: fixed-width price histogram, 22 × 5000-wide bins over
      // [0, 110000) with edge clamping.
      AnalyticsOps.fixedWidthHistogram(lineitem(s, dir),
          col("l_extendedprice"), lo = 0.0, hi = 110000.0, nBins = 22)
        .select(col("bin"), col("bin_lo"), col("bin_hi"), col("cnt"))
        .orderBy("bin")
    }),

    "a36_resample" -> ((s, dir) => {
      // E55: hourly per-user grid with last-observation-carried-forward —
      // grid generation + the E14 as-of pass, no inequality join.
      graft.operators.TemporalOps.resampleLocf(events(s, dir),
          key = Seq("user_id"), tsCol = "ts", payload = Seq("value"),
          interval = "1 hour", truncUnit = "hour", tieBreak = col("event_id"))
        .select(col("user_id"), unix_timestamp(col("ts")).as("grid_ts"),
          rnd(col("asof_value")).as("value"))
        .orderBy("user_id", "grid_ts")
    }),

    "a36_resample_sink" -> ((s, dir) => {
      // E55 at scale, the a36 fourth-decade answer: the stream-shaped LOCF
      // grid (TemporalOps.resampleLocfStream — only the EVENTS shuffle and
      // sort; the dense grid is generated map-side after the window and
      // never crosses an exchange) written straight to a day-partitioned
      // parquet sink, then a per-day audit summary read back from the
      // files. The full grid is this key's real product (at 100 TB the
      // sink IS the output table, day-partitioned for downstream pruning);
      // the returned frame is the bounded audit a production writer
      // reports: per day, row count / user count / null (pre-first-obs)
      // count / exact micro-quantized value sum (the t37 long-sum
      // convention, order-independent where a double sum is not). The
      // oracle replays the day rollup over the same ASOF grid.
      //
      // Sink discipline (the E25/E80 trade, made explicit): the write goes
      // through DataLayout.writePartitionedNoExchange — a LOCAL sort on
      // grid_day (contiguous per-task fan-out, one open writer at a time)
      // plus a maxRecordsPerFile cap, NOT writePartitioned, whose
      // repartition would re-shuffle the grid — the biggest frame of the
      // job and exactly the exchange this key exists to avoid. The cost is
      // file COUNT O(tasks × days-per-task) instead of filesPerPartition
      // (bounded: LayoutSpec pins the writer's count contract); a
      // downstream that wants fewer files runs DataLayout.compact as the
      // standard epilogue. Scratch roots at GRAFT_SCRATCH_DIR (decade
      // runs put the grid on the budgeted disk, not /tmp) with a
      // shutdown-hook cleanup for the hard-kill path.
      val grid = graft.operators.TemporalOps.resampleLocfStream(
        events(s, dir), key = Seq("user_id"), tsCol = "ts",
        valueCol = "value", stepSec = 3600L, tieBreak = col("event_id"))
      val outDir = scratchDir("a36_sink")
      try {
        graft.sources.DataLayout.writePartitionedNoExchange(
          grid.withColumn("grid_day",
            (unix_timestamp(col("ts")) - pmod(unix_timestamp(col("ts")),
              lit(86400L)))),
          outDir.toString, "grid_day", maxRecordsPerFile = 4000000L)
        val back = s.read.parquet(outDir.toString)
        // eager: the summary is days-sized — materialize it before the
        // temp sink is deleted (finally below)
        back.groupBy(col("grid_day").cast("long").as("day_ts"))
          .agg(count(lit(1)).as("n_rows"),
            count_distinct(col("user_id")).as("n_users"),
            sum(when(col("asof_value").isNull, 1L).otherwise(0L))
              .as("n_null"),
            coalesce(sum(round(col("asof_value") * lit(10000.0))
              .cast("long")), lit(0L)).as("v_sum_q"))
          .orderBy("day_ts")
          .localCheckpoint(true)
      } finally {
        // the grid parquet is scratch — a real deployment keeps it as the
        // stage output table; the bench/verify contract only needs the
        // audit frame
        deleteRecursively(outDir.toFile)
      }
    }),

    "a37_ohlc" -> ((s, dir) => {
      // E58: hourly OHLC bars per event type — one partial+final hash agg,
      // outputs are input VALUES (hash-comparable unrounded).
      graft.operators.TemporalOps.ohlcBars(events(s, dir), "ts", "1 hour",
          Seq(col("event_type")), col("value"), col("event_id"))
        .select(wStart(), col("event_type"), col("open"), col("high"),
          col("low"), col("close"), col("n_obs"))
        .orderBy("w_start", "event_type")
    }),

    "b41_incr_agg" -> ((s, dir) => {
      // E57: incremental materialized-view maintenance — the stored state
      // (orders with o_orderkey % 10 != 0) merged with the new batch's
      // aggregate must equal the full recompute (the oracle).
      val o = orders(s, dir)
      val base = o.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
      val delta = o.filter(pmod(col("o_orderkey"), lit(10)) === 0)
      def aggOf(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("spend_sum"),
            max(col("o_orderdate")).as("last_order"))
      graft.operators.CdcOps.mergeAggState(aggOf(base), aggOf(delta),
          key = Seq("o_custkey"),
          merge = Seq(
            ("n", (n: String) => sum(col(n))),
            ("spend_sum", (n: String) => sum(col(n))),
            ("last_order", (n: String) => max(col(n)))))
        .select(col("o_custkey"), col("n"), decOut(col("spend_sum")).as("spend_sum"),
          unix_timestamp(col("last_order")).as("last_order"))
        .orderBy("o_custkey")
    }),

    "a38_funnel" -> ((s, dir) => {
      // E64: view -> click -> purchase funnel, greedy earliest traversal
      // in strict (ts, event_id) order; per-user stage + the reaching
      // timestamps. ANSI mode: element_at past the array end raises, so
      // the per-stage columns are size-guarded.
      val f = AnalyticsOps.funnel(events(s, dir), col("user_id"), col("ts"),
        col("event_id"), col("event_type"), Seq("view", "click", "purchase"))
      def stepTs(k: Int) =
        when(size(col("step_ts")) >= k,
          unix_timestamp(element_at(col("step_ts"), k))).as(s"ts$k")
      f.select(col("user_id"), col("stage"), stepTs(1), stepTs(2), stepTs(3))
        .orderBy("user_id")
    }),

    "a39_retention" -> ((s, dir) => {
      // E65: hourly retention cohorts — first-seen hour × hour offset ×
      // distinct active users.
      AnalyticsOps.retentionCohorts(events(s, dir), col("user_id"), col("ts"),
          "hour", 3600L)
        .orderBy("cohort_ts", "offset_n")
    }),

    "a41_transitions" -> ((s, dir) => {
      // E78: per-user event-transition matrix in strict (ts, event_id)
      // order — output is |event types|² regardless of event volume.
      AnalyticsOps.eventTransitions(events(s, dir), col("user_id"),
          col("ts"), col("event_id"), col("event_type"))
        .orderBy("prev_event", "event")
    }),

    "a42_decayed" -> ((s, dir) => {
      // E83: half-life-weighted activity per event type — anchor one day
      // past the generated range (2024-02-01 UTC), half-life 7 days.
      // Micro-unit-quantized contributions make the sums exact longs.
      AnalyticsOps.decayedAgg(events(s, dir), Seq(col("event_type")),
          col("ts"), col("value"), halfLifeSeconds = 604800L,
          anchorEpochSeconds = 1706745600L)
        .orderBy("event_type")
    }),

    "a40_winsorize" -> ((s, dir) => {
      // E68 oracle path: exact rank-defined p05/p95 clamp of event values
      // per event type. The production percentile_approx plan is benched
      // instead — see benchOverrides.
      graft.operators.CurationOps.winsorize(events(s, dir), col("event_id"),
          col("event_type"), col("value"), qLo = 0.05, qHi = 0.95,
          exact = true)
        .select(col("id").as("event_id"), col("stratum").as("event_type"),
          col("value"), col("lo"), col("hi"), col("v_wins"))
        .orderBy("event_id")
    }),

    "b53_skew_report" -> ((s, dir) => {
      // E87: join-key skew diagnostics over the lineitem supplier key —
      // the salting/broadcast/AQE-skew decision input. Integer share
      // metrics replay exactly in the oracle (AnalyticsOps.skewReport).
      AnalyticsOps.skewReport(lineitem(s, dir), col("l_suppkey"), topN = 20)
        .orderBy(col("cnt").desc, col("key").asc)
    }),

    "b54_join_estimate" -> ((s, dir) => {
      // E88: count-min join-cardinality estimate (AMS-style sketch inner
      // product) for orders ⋈ customer on custkey, against the exact join
      // count — decide broadcast-vs-salt-vs-merge from two tiny sketches
      // BEFORE paying for the join (graft.functions.CountMin).
      val so = graft.functions.CountMin.build(orders(s, dir), col("o_custkey"))
      val sc = graft.functions.CountMin.build(customer(s, dir), col("c_custkey"))
      val est = graft.functions.CountMin.innerProduct(so, sc)
        .select(col("est").cast("long").as("est_join"))
      val exact = orders(s, dir)
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("exact_join"))
      est.crossJoin(exact)
        .select(col("est_join"), col("exact_join"),
          expr("(est_join - exact_join) * 1000000 div exact_join").as("err_ppm"))
    }),

    "b46_pagerank" -> ((s, dir) => {
      // E72: fixed-point PageRank over the supplier→customer ship graph
      // (distinct (l_suppkey, o_custkey) pairs; the customer key space is
      // offset to disambiguate). Integer pico-rank floors replay
      // identically in the oracle's unrolled recurrence.
      val edges = lineitem(s, dir)
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"),
          (col("o_custkey") + lit(1000000L)).as("dst"))
      graft.operators.GraphOps.pageRank(edges, col("src"), col("dst"),
          iterations = PageRankIters)
        .orderBy("node")
    }),

    "b48_tpch_q1" -> ((s, dir) => {
      // E76: TPC-H Q1 (pricing summary) adapted to the testdata's date
      // range — the canonical scan-heavy aggregate. Products are cast to
      // decimal BEFORE summation: the per-row double product is within
      // ulps of its ≤6-dp true value, so the cast recovers it exactly and
      // the sums are order-independent (see QueryHelpers).
      def dec6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
      // Par.ensure: Q1's six decimal casts+sums are the per-row-heavy
      // partial agg; a single-row-group parquet pins the whole pass to one
      // task (r17 profile: 2.3 s at 3 tasks, 600k rows). The filter still
      // pushes to the scan through the repartition; no-op once source
      // splits >= cores (sf1+).
      val l = graft.operators.Par.ensure(lineitem(s, dir))
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = discPrice * (lit(1.0) + col("l_tax"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).as("__sq"),
          sum(dec(col("l_extendedprice"))).as("__sp"),
          sum(dec6(discPrice)).as("__sdp"),
          sum(dec6(charge)).as("__sc"),
          sum(dec(col("l_discount"))).as("__sd"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          decOut(col("__sq")).as("sum_qty"),
          decOut(col("__sp")).as("sum_base_price"),
          decOut(col("__sdp")).as("sum_disc_price"),
          decOut(col("__sc")).as("sum_charge"),
          rnd(col("__sq").cast("double") / col("count_order")).as("avg_qty"),
          rnd(col("__sp").cast("double") / col("count_order")).as("avg_price"),
          rnd(col("__sd").cast("double") / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "b49_tpch_q3" -> ((s, dir) => {
      // E76: TPC-H Q3 (shipping priority) — selective dim filter, two
      // fact joins, top-10 by EXACT decimal revenue (deterministic order,
      // tie-broken by key).
      val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val l = lineitem(s, dir)
        .filter(col("l_shipdate") > lit("2000-03-15").cast("timestamp"))
      val dec6 = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,6)")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec6).as("__rev"))
        .orderBy(col("__rev").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"), decOut(col("__rev")).as("revenue"),
          unix_timestamp(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"))
    }),

    "b50_tpch_q5" -> ((s, dir) => {
      // E76: TPC-H Q5 (local-supplier volume) — the 6-table join. nation
      // and region carry explicit broadcast hints (25 and 5 rows at ANY
      // scale factor — the dims that stay broadcastable at 100 TB); AQE
      // handles the rest. Plan shape asserted in OlapPlanSpec.
      val c = customer(s, dir)
      val o = orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = lineitem(s, dir)
      val sup = supplier(s, dir)
      val n = nation(s, dir)
      val r = region(s, dir).filter(col("r_name") === "ASIA")
      val dec6 = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,6)")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec6).as("__rev"))
        .orderBy(col("__rev").desc, col("n_name"))
        .select(col("n_name"), decOut(col("__rev")).as("revenue"))
    }),

    "b40_fuzzy_match" -> ((s, dir) => {
      // E56: distance-1 fuzzy join of deterministically-corrupted supplier
      // names (one char deleted at a doc-derived position) back onto the
      // originals; deletion-neighborhood blocking must be invisible —
      // the oracle is the brute-force levenshtein join. (The boilerplate
      // "Supplier#" prefix is exactly the regime that collapsed the old
      // prefix/suffix pigeonhole blocking at sf10 — see SCALING.)
      val sup = supplier(s, dir).select("s_suppkey", "s_name")
      val pos = pmod(col("s_suppkey"), lit(10)) + lit(5)
      val corrupted = sup.select(col("s_suppkey").as("c_id"),
        concat(col("s_name").substr(lit(1), pos - 1),
          col("s_name").substr(pos + 1, lit(99))).as("c_name"))
      graft.operators.JoinOps.fuzzyJoinDist1(
          corrupted, col("c_id"), col("c_name"),
          sup, col("s_suppkey"), col("s_name"))
        .select(col("l_id"), col("r_id"), col("dist"))
        .orderBy("l_id", "r_id")
    }),

    "a43_mad_outliers" -> ((s, dir) => {
      // E95: robust per-type outlier stats — rank-defined lower medians
      // (exact data values, no fp interpolation) so the oracle replays
      // med/MAD bit-for-bit; flags compare on the unrounded values. The
      // percentile_approx scale plan is benched instead (benchOverrides).
      AnalyticsOps.madOutliers(events(s, dir), Seq("event_type"),
          col("value"), nSigma = 3.0, exact = true)
        .select(col("event_type"), col("n_vals"), rnd6(col("med")).as("med"),
          rnd6(col("mad")).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    }),

    "b55_cooccur" -> ((s, dir) => {
      // E96: market-basket co-occurrence over order baskets — pairs of
      // parts sharing >= 2 orders, with per-item supports and lift (the
      // fixed-shape double chain replays identically in DuckDB).
      AnalyticsOps.coOccurrence(lineitem(s, dir), col("l_orderkey"),
          col("l_partkey"), minPairCount = 2L)
        .orderBy("item_a", "item_b")
    })
  )

  /** HLL sketch twin benched under the a34 key: the plan we'd ship at
    * 100 TB (mergeable fixed-size sketches, map-side partial agg) vs the
    * exact two-phase distinct the oracle checks. */
  val benchOverrides: Map[String, Q] = Map(
    "a34_approx_distinct" -> ((s, dir) => {
      AnalyticsOps.approxDistinctCount(events(s, dir), Seq(col("event_type")),
          col("user_id"), "uniq_users")
        .orderBy("event_type")
    }),
    // the 100 TB winsorize plan: sketch thresholds, no per-stratum sort
    "a40_winsorize" -> ((s, dir) => {
      graft.operators.CurationOps.winsorize(events(s, dir), col("event_id"),
          col("event_type"), col("value"), qLo = 0.05, qHi = 0.95,
          exact = false)
        .select(col("id").as("event_id"), col("stratum").as("event_type"),
          col("value"), col("lo"), col("hi"), col("v_wins"))
        .orderBy("event_id")
    }),
    // the 100 TB MAD plan: two percentile_approx hash aggregates, no
    // per-key sort windows
    "a43_mad_outliers" -> ((s, dir) => {
      AnalyticsOps.madOutliers(events(s, dir), Seq("event_type"),
          col("value"), nSigma = 3.0, exact = false)
        .select(col("event_type"), col("n_vals"), rnd6(col("med")).as("med"),
          rnd6(col("mad")).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    // integer floor divisions staged through share_ppm exactly as the
    // operator computes them
    "b53_skew_report" ->
      """WITH c AS (
        |  SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem
        |  WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys FROM c),
        |s AS (
        |  SELECT key, cnt, n_keys, cnt * 1000000 // total AS share_ppm
        |  FROM c, t)
        |SELECT key, cnt, n_keys, share_ppm,
        |  share_ppm * n_keys // 10000 AS xmean_x100
        |FROM s ORDER BY cnt DESC, key ASC LIMIT 20""".stripMargin,

    // both count-min sketches rebuilt bucket-for-bucket from the portable
    // md5 hash; est = min over rows of the bucket-count inner product
    "b54_join_estimate" -> {
      def cms(table: String, key: String) =
        s"""SELECT t.j,
           |    ${h60Sql(s"'cms' || CAST(t.j AS VARCHAR) || '_' || CAST($key AS VARCHAR)")} % 1024 AS bucket,
           |    COUNT(*) AS cnt
           |  FROM $table CROSS JOIN range(0, 4) t(j)
           |  WHERE $key IS NOT NULL GROUP BY 1, 2""".stripMargin
      s"""WITH sa AS (
         |  ${cms("orders", "o_custkey")}),
         |sb AS (
         |  ${cms("customer", "c_custkey")}),
         |ip AS (
         |  SELECT sa.j, CAST(SUM(sa.cnt * sb.cnt) AS BIGINT) AS ipv
         |  FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
         |  GROUP BY 1),
         |e AS (SELECT MIN(ipv) AS est_join FROM ip),
         |x AS (
         |  SELECT COUNT(*) AS exact_join
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
         |SELECT est_join, exact_join,
         |  (est_join - exact_join) * 1000000 // exact_join AS err_ppm
         |FROM e, x""".stripMargin
    },

    // rank-defined lower medians ((n-1) div 2 + 1 on non-null values, the
    // winsorize exact-quantile convention); outlier flags compare the
    // UNROUNDED |v - med| against 3.0 * mad exactly as the operator does
    "a43_mad_outliers" ->
      s"""WITH v AS (
         |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
         |r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM v),
         |med AS (
         |  SELECT event_type,
         |    max(CASE WHEN rn = (n - 1) // 2 + 1 THEN value END) AS med
         |  FROM r GROUP BY 1),
         |d AS (
         |  SELECT v.event_type, v.value, med.med,
         |    abs(v.value - med.med) AS ad
         |  FROM v JOIN med USING (event_type)),
         |r2 AS (
         |  SELECT event_type, ad,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM d),
         |mad AS (
         |  SELECT event_type,
         |    max(CASE WHEN rn = (n - 1) // 2 + 1 THEN ad END) AS mad
         |  FROM r2 GROUP BY 1)
         |SELECT d.event_type, count(*) AS n_vals,
         |  ${rnd6Sql("any_value(d.med)")} AS med,
         |  ${rnd6Sql("any_value(mad.mad)")} AS mad,
         |  CAST(sum(CASE WHEN d.ad > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_outliers
         |FROM d JOIN mad USING (event_type)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // pair/item counts over kept baskets; the lift chain mirrors the
    // operator's double expression shape term for term
    "b55_cooccur" ->
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |keptb AS (
        |  SELECT basket FROM it GROUP BY basket HAVING count(*) <= 10000),
        |kept AS (SELECT it.* FROM it JOIN keptb USING (basket)),
        |nb AS (SELECT count(*) AS b FROM keptb),
        |ic AS (SELECT item, count(*) AS n_i FROM kept GROUP BY 1),
        |p AS (
        |  SELECT x.item AS item_a, y.item AS item_b, count(*) AS n_ab
        |  FROM kept x JOIN kept y
        |    ON x.basket = y.basket AND x.item < y.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.item_a, p.item_b, p.n_ab, a.n_i AS n_a, b2.n_i AS n_b,
        |  round(CAST(p.n_ab AS DOUBLE) * nb.b
        |      / (CAST(a.n_i AS DOUBLE) * b2.n_i) * 10000) / 10000 AS lift
        |FROM p
        |JOIN ic a ON a.item = p.item_a
        |JOIN ic b2 ON b2.item = p.item_b
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,

    "a32_sliding_window" ->
      s"""WITH hops AS (
         |  SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start, event_type, value FROM events
         |  UNION ALL
         |  SELECT CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT) AS w_start, event_type, value FROM events)
         |SELECT w_start, event_type, COUNT(*) AS cnt, ${decSumSql("value")} AS value_sum
         |FROM hops GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a33_moving_avg" ->
      s"""WITH d AS (
         |  SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,4)) AS v FROM events),
         |m AS (
         |  SELECT event_id, user_id,
         |    SUM(v) OVER w3 AS mov_sum, COUNT(v) OVER w3 AS mov_cnt,
         |    MIN(v) OVER w3 AS mov_min, MAX(v) OVER w3 AS mov_max,
         |    v - lag(v) OVER wo AS delta_prev
         |  FROM d
         |  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
         |         w3 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id,
         |  ${rndSql("CAST(mov_sum AS DOUBLE) / mov_cnt")} AS mov_avg,
         |  CAST(mov_min AS DOUBLE) AS mov_min, CAST(mov_max AS DOUBLE) AS mov_max,
         |  CAST(delta_prev AS DOUBLE) AS delta_prev
         |FROM m ORDER BY event_id""".stripMargin,

    "a34_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "a35_zscore" ->
      s"""WITH st AS (
         |  SELECT event_type, ${rnd6Sql("AVG(value)")} AS mu, ${rnd6Sql("stddev_samp(value)")} AS sd
         |  FROM events GROUP BY 1)
         |SELECT e.event_id, e.event_type,
         |  ${rndSql("CASE WHEN st.sd IS NOT NULL AND st.sd > 0 THEN (e.value - st.mu) / st.sd END")} AS z,
         |  CAST(COALESCE(abs(CASE WHEN st.sd IS NOT NULL AND st.sd > 0 THEN (e.value - st.mu) / st.sd END) > 2.0, FALSE) AS INT) AS is_outlier
         |FROM events e JOIN st ON e.event_type = st.event_type
         |ORDER BY e.event_id""".stripMargin,

    "b36_rollup" ->
      s"""SELECT year(o_orderdate) AS o_year, o_orderpriority AS o_prio,
         |  COUNT(*) AS n, ${decSumSql("o_totalprice")} AS spend_sum, 0 AS lvl
         |FROM orders GROUP BY 1, 2
         |UNION ALL
         |SELECT year(o_orderdate) AS o_year, NULL AS o_prio,
         |  COUNT(*) AS n, ${decSumSql("o_totalprice")} AS spend_sum, 1 AS lvl
         |FROM orders GROUP BY 1
         |UNION ALL
         |SELECT NULL AS o_year, NULL AS o_prio,
         |  COUNT(*) AS n, ${decSumSql("o_totalprice")} AS spend_sum, 3 AS lvl
         |FROM orders
         |ORDER BY lvl, o_year, o_prio""".stripMargin,

    "b37_set_ops" ->
      """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
        |UNION ALL
        |SELECT o_custkey, 'only_1996' AS tag FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
        |UNION ALL
        |SELECT o_custkey, 'only_1997' AS tag FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
        |ORDER BY o_custkey""".stripMargin,

    "b38_semi_anti" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |       THEN 'present' ELSE 'absent' END AS has_orders
        |FROM customer c ORDER BY c_custkey""".stripMargin,

    "b39_histogram" ->
      """WITH b AS (
        |  SELECT least(greatest(CAST(floor((l_extendedprice - 0.0) / 5000.0) AS BIGINT), 0), 21) AS bin
        |  FROM lineitem)
        |SELECT bin, 0.0 + bin * 5000.0 AS bin_lo, 0.0 + (bin + 1) * 5000.0 AS bin_hi, COUNT(*) AS cnt
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // same-ts ties pre-deduped to max event_id (the a28 ASOF convention)
    "a36_resample" ->
      s"""WITH b AS (
         |  SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
         |  FROM events GROUP BY 1),
         |g AS (
         |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS gts
         |  FROM b),
         |vd AS (
         |  SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
         |    FROM events) WHERE rn = 1)
         |SELECT g.user_id, CAST(floor(epoch(g.gts)) AS BIGINT) AS grid_ts,
         |  ${rndSql("vd.value")} AS value
         |FROM g ASOF LEFT JOIN vd ON g.user_id = vd.user_id AND g.gts >= vd.ts
         |ORDER BY g.user_id, grid_ts""".stripMargin,

    // day rollup of the a36 ASOF grid: same b/g/vd chain, aggregated per
    // day — n_rows/n_users/n_null plus the exact micro-quantized value sum
    // (CAST(round(v*1e4) AS BIGINT) summed as integers, the t37
    // convention; Spark HALF_UP == DuckDB round on doubles)
    "a36_resample_sink" ->
      s"""WITH b AS (
         |  SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
         |  FROM events GROUP BY 1),
         |g AS (
         |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS gts
         |  FROM b),
         |vd AS (
         |  SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
         |    FROM events) WHERE rn = 1),
         |j AS (
         |  SELECT g.user_id, g.gts, vd.value
         |  FROM g ASOF LEFT JOIN vd ON g.user_id = vd.user_id AND g.gts >= vd.ts)
         |SELECT CAST(floor(epoch(date_trunc('day', gts))) AS BIGINT) AS day_ts,
         |  COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users,
         |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(COALESCE(SUM(CAST(round(value * 10000) AS BIGINT)), 0) AS BIGINT) AS v_sum_q
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // open/close via row_number (min_by/max_by on the (ts, event_id)
    // struct == first/last in that total order)
    "a37_ohlc" ->
      s"""WITH r AS (
         |  SELECT ${wStartSql("ts", 3600L)} AS w_start, event_type, value,
         |    row_number() OVER (PARTITION BY ${wStartSql("ts", 3600L)}, event_type
         |      ORDER BY ts, event_id) AS rn_a,
         |    row_number() OVER (PARTITION BY ${wStartSql("ts", 3600L)}, event_type
         |      ORDER BY ts DESC, event_id DESC) AS rn_d
         |  FROM events)
         |SELECT w_start, event_type,
         |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
         |  MAX(value) AS high, MIN(value) AS low,
         |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
         |  COUNT(*) AS n_obs
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // full recompute over base ∪ delta: the merge must be invisible
    "b41_incr_agg" ->
      s"""SELECT o_custkey, COUNT(*) AS n, ${decSumSql("o_totalprice")} AS spend_sum,
         |  CAST(floor(epoch(MAX(o_orderdate))) AS BIGINT) AS last_order
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // chained-min funnel: stage k = first step-k event strictly after the
    // stage-(k-1) event in the (ts, event_id) total order — struct min /
    // struct > give the tuple ordering
    "a38_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(struct_pack(ts := ts, id := event_id)) AS k1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(struct_pack(ts := e.ts, id := e.event_id)) AS k2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click'
        |    AND struct_pack(ts := e.ts, id := e.event_id) > s1.k1
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(struct_pack(ts := e.ts, id := e.event_id)) AS k3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND struct_pack(ts := e.ts, id := e.event_id) > s2.k2
        |  GROUP BY 1),
        |u AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase'))
        |SELECT u.user_id,
        |  CASE WHEN k3 IS NOT NULL THEN 3 WHEN k2 IS NOT NULL THEN 2
        |       WHEN k1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |  CAST(floor(epoch(k1.ts)) AS BIGINT) AS ts1,
        |  CAST(floor(epoch(k2.ts)) AS BIGINT) AS ts2,
        |  CAST(floor(epoch(k3.ts)) AS BIGINT) AS ts3
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "a39_retention" ->
      """WITH ub AS (
        |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS b FROM events),
        |c AS (SELECT user_id, min(b) AS cohort FROM ub GROUP BY 1)
        |SELECT CAST(floor(epoch(c.cohort)) AS BIGINT) AS cohort_ts,
        |  CAST((epoch(ub.b) - epoch(c.cohort)) / 3600 AS BIGINT) AS offset_n,
        |  COUNT(*) AS n_users
        |FROM ub JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "b48_tpch_q1" -> {
      def d6(e: String) =
        s"round(CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE) * 10000) / 10000"
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSumSql("l_quantity")} AS sum_qty,
         |  ${decSumSql("l_extendedprice")} AS sum_base_price,
         |  ${d6("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${d6("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${rndSql("CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)")} AS avg_qty,
         |  ${rndSql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)")} AS avg_price,
         |  ${rndSql("CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // top-10 by EXACT decimal revenue (the limit set is order-sensitive,
    // so the sort runs on the unrounded decimal, tie-broken by key)
    "b49_tpch_q3" ->
      """WITH t AS (
        |  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |    AND l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
        |  GROUP BY 1, 2, 3
        |  ORDER BY rev DESC, l_orderkey LIMIT 10)
        |SELECT l_orderkey, round(CAST(rev AS DOUBLE) * 10000) / 10000 AS revenue,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate, o_orderpriority
        |FROM t ORDER BY rev DESC, l_orderkey""".stripMargin,

    // final ORDER BY runs on the unrounded decimal rev (matching the Spark
    // sort key) — sorting on the 4dp-rounded surface could transpose rows
    // whose unrounded revenues differ only past the 4th decimal
    "b50_tpch_q5" ->
      """WITH t AS (
        |  SELECT n_name,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev
        |  FROM customer c
        |  JOIN orders o ON c.c_custkey = o.o_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'ASIA'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1)
        |SELECT n_name, round(CAST(rev AS DOUBLE) * 10000) / 10000 AS revenue
        |FROM t ORDER BY rev DESC, n_name""".stripMargin,

    // the identical integer recurrence, unrolled — GENERATED so the oracle
    // and the operator cannot drift on iteration count or arithmetic
    "b46_pagerank" -> {
      val nSub = "(SELECT COUNT(*) FROM nodes)"
      val iters = (1 to PageRankIters).map { i =>
        s"""r$i AS (
           |  SELECT n.node,
           |    CAST((15 * (1000000000000 // $nSub)) // 100
           |      + (85 * COALESCE(s.inb, 0)) // 100 AS BIGINT) AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(SUM(r.rank // e.outdeg) AS BIGINT) AS inb
           |    FROM ed e JOIN r${i - 1} r ON e.src = r.node
           |    GROUP BY 1) s ON n.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d ON e.src = d.src),
         |r0 AS (SELECT node, CAST(1000000000000 // $nSub AS BIGINT) AS rank FROM nodes),
         |$iters
         |SELECT node, rank AS rank_pico, CAST(rank AS DOUBLE) / 1e12 AS rank
         |FROM r$PageRankIters ORDER BY node""".stripMargin
    },

    "a41_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event
        |  FROM events)
        |SELECT prev_event, event_type AS event, COUNT(*) AS n_transitions
        |FROM t WHERE prev_event IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // twin of AnalyticsOps.decayedAgg: identical per-row weight expression
    // (same anchor/half-life literals), micro-unit quantization to BIGINT,
    // exact long sums back to double
    "a42_decayed" -> {
      val w = "pow(2.0, -CAST(1706745600 - floor(epoch(ts)) AS DOUBLE) / 604800.0)"
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CAST(round($w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS decayed_count,
         |  CAST(SUM(CAST(round(value * $w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS decayed_sum
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // rank-defined quantile clamp: value at 1-based rank floor(q*(n-1))+1
    // in (value, event_id) order per stratum. Mirrors the operator exactly:
    // thresholds rank NON-NULL values only, rows left-join them back, and
    // null-value rows keep a null v_wins (lo/hi still attached)
    "a40_winsorize" ->
      """WITH r AS (
        |  SELECT event_id, event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |t AS (
        |  SELECT event_type,
        |    MAX(CASE WHEN rn = CAST(floor((n - 1) * 0.05) AS BIGINT) + 1 THEN value END) AS lo,
        |    MAX(CASE WHEN rn = CAST(floor((n - 1) * 0.95) AS BIGINT) + 1 THEN value END) AS hi
        |  FROM r GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value, t.lo, t.hi,
        |  CASE WHEN e.value IS NOT NULL
        |       THEN least(greatest(e.value, t.lo), t.hi) END AS v_wins
        |FROM events e
        |LEFT JOIN t ON e.event_type IS NOT DISTINCT FROM t.event_type
        |ORDER BY event_id""".stripMargin,

    // brute-force levenshtein join: the blocking in fuzzyJoinDist1 must be
    // invisible, so the oracle has no blocks at all
    "b40_fuzzy_match" ->
      """WITH c AS (
        |  SELECT s_suppkey AS l_id,
        |    substr(s_name, 1, CAST(s_suppkey % 10 + 4 AS INT))
        |      || substr(s_name, CAST(s_suppkey % 10 + 6 AS INT), 99) AS c_name
        |  FROM supplier)
        |SELECT c.l_id, s.s_suppkey AS r_id, levenshtein(c.c_name, s.s_name) AS dist
        |FROM c JOIN supplier s ON levenshtein(c.c_name, s.s_name) <= 1
        |ORDER BY l_id, r_id""".stripMargin
  )
}
