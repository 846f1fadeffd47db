package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Exprs._
import graft.operators.{EtlOps, RadiusDedup}
import QueryHelpers._

/** §2B batch dimension-ETL queries (SURVEY.md §2B): the reference's pandas
  * cleaning/merging/geo operators re-expressed as Spark transforms over the
  * driver testdata, each with a DuckDB oracle. Key prefix b{NN} maps to the
  * §2B operator id. (b28, the CSV/YAML sink, is covered by EtlSpec — a file
  * sink has no oracle-SQL form.)
  */
object BQueries {

  /** Euro-locale numeric string built from exact integers (no fp formatting):
    * "1.234.567,05"-style, with NBSP noise and an occasional malformed cell. */
  private def euroString(big: Column, frac2: Column, malformed: Column): Column =
    when(malformed, lit("n/a")).otherwise(
      concat(
        lit(" "),
        translate(format_number(big, 0), ",", "."),
        lit(","),
        lpad(frac2.cast("string"), 2, "0")))

  val queries: Map[String, Q] = Map(
    "b01_csv_sniff" -> ((s, dir) => {
      // B1: write the region table as a ';'-separated CSV, sniff the
      // delimiter from the head bytes, and read it back distributed.
      // Fixed reused scratch dir (overwrite mode) so repeated runs don't
      // litter /tmp with a copy of the table each time.
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_b01_csv").toString
      region(s, dir).coalesce(1).write.mode("overwrite")
        .option("header", "true").option("delimiter", ";").csv(tmp)
      EtlOps.readSniffedCsv(s, tmp)
        .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey")
    }),

    "b02_header_norm" -> ((s, dir) => {
      // B2: messy quoted/padded headers + padded cells -> normalized.
      val messy = part(s, dir)
        .select(col("p_partkey").as(" p_partkey "),
          concat(lit("  "), col("p_name"), lit(" ")).as("\"p_name\""))
      EtlOps.trimCells(EtlOps.normalizeHeaders(messy))
        .orderBy("p_partkey")
    }),

    "b03_fuzzy_col" -> ((s, dir) => {
      // B3: fuzzy column resolution over messy physical headers — driver-side
      // schema logic (O(columns)), emitted as a mapping table.
      val headers = Seq("Part-Key", "The Name", "Retail Price EUR")
      val candidates = Seq("partkey", "name", "retailprice")
      import s.implicits._
      candidates.map(c => (c, EtlOps.findColumn(headers, Seq(c)).orNull))
        .toDF("candidate", "resolved").orderBy("candidate")
    }),

    "b04_locale_numeric" -> ((s, dir) => {
      // B4: euro-locale numeric coercion with NBSP noise, '.'-thousands,
      // ','-decimal and malformed cells -> null (istat_utils.py:39-45).
      // sort FIRST, generate AND parse AFTER: the range sort's sampling job
      // executes the sort's child plan, so any expensive projection below
      // the sort runs twice (sample + real pass). The r02 plan moved the
      // parse above the sort but left the euroString GENERATION below it —
      // computed in both sort passes, at source-split parallelism (1-3
      // tasks on a single-row-group parquet). The generation only reads
      // the three sorted key columns, so it moves above the sort too
      // (CollapseProject never merges across a Sort, a project preserves
      // the sort order): the whole format+regex chain now runs ONCE,
      // post-shuffle, on the range partitions. r17 profile: the two
      // below-sort stages were 0.81+1.06 s at 3 tasks; identical rows.
      lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
        .orderBy("l_orderkey", "l_linenumber")
        .select(col("l_orderkey"), col("l_linenumber"),
          localeNumeric(euroString(
            col("l_orderkey") * 7 + col("l_linenumber"),
            pmod(col("l_suppkey"), lit(100)),
            col("l_linenumber") === 7)).as("parsed"))
    }),

    "b05_regex_filter" -> ((s, dir) => {
      // B5: regex domain filter — drop codes matching a pattern.
      EtlOps.regexDrop(orders(s, dir), col("o_orderpriority"), "^[13]-")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    "b06_latest_year" -> ((s, dir) => {
      // B6: latest-year selection via 1-row max aggregate broadcast back
      // onto the fact table (no driver round-trip, no fact shuffle).
      EtlOps.latestYearFilter(orders(s, dir), year(col("o_orderdate")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), decOut(sum(dec(col("o_totalprice")))).as("spend"))
        .orderBy("o_orderpriority")
    }),

    "b07_pivot" -> ((s, dir) => {
      // B7: long->wide pivot with an explicit value list (single pass, fixed
      // output schema).
      EtlOps.pivotWide(lineitem(s, dir), Seq(col("l_returnflag")),
          "l_linestatus", Seq("F", "O"), decOut(sum(dec(col("l_quantity")))))
        .orderBy("l_returnflag")
    }),

    "b08_ratio" -> ((s, dir) => {
      // B8: derived ratio clipped to <=1, round 3 (clean_istat_abitazioni.py:38-39).
      customer(s, dir)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("total"),
          sum(when(col("c_acctbal") < 0, 1).otherwise(0)).as("neg"))
        .select(col("c_nationkey"),
          rnd3(least(col("neg") / col("total"), lit(1.0))).as("neg_share"))
        .orderBy("c_nationkey")
    }),

    "b09_rank_dedup" -> ((s, dir) => {
      // B9: duplicate names resolved by type rank (large > medium > small,
      // clean_airports_it.py:49-55) — window row_number, one shuffle.
      val pr = when(col("p_type") === "LARGE", 3)
        .when(col("p_type") === "MEDIUM", 2).otherwise(1)
      EtlOps.keepFirstPerKey(part(s, dir).withColumn("pr", pr),
          Seq(col("p_name")), Seq(col("pr").desc, col("p_partkey").asc))
        .select("p_name", "p_partkey", "p_type")
        .orderBy("p_name")
    }),

    "b10_domain_filters" -> ((s, dir) => {
      // B10: chained domain filters — range, set membership, regex.
      part(s, dir)
        .filter(col("p_size").between(10, 30))
        .filter(col("p_type").isin("ECONOMY", "STANDARD", "PROMO"))
        .filter(col("p_name").rlike("^(red|small) "))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    "b11_region_map" -> ((s, dir) => {
      // B11: code->region broadcast lookup with "(Unknown)" fallback
      // (clean_cities_geonames.py:19-87).
      val key = when(pmod(col("n_nationkey"), lit(7)) === 0, lit(99))
        .otherwise(col("n_regionkey"))
      nation(s, dir).withColumn("rk", key)
        .join(broadcast(region(s, dir)), col("rk") === col("r_regionkey"), "left")
        .select(col("n_nationkey"), coalesce(col("r_name"), lit("(Unknown)")).as("region_name"))
        .orderBy("n_nationkey")
    }),

    "b12_weighted_agg" -> ((s, dir) => {
      // B12: weighted average via sum(a*b)/sum(b) + conditional bucket count
      // (clean_istat_famiglie.py:9-50). Decimal sums for cross-engine parity.
      // (r17 audited: a Par.ensure spread was A/B'd and REJECTED — the two
      // decimal products are light enough that the spreading exchange's map
      // side costs what the parallel agg saves, 1.31 s -> 1.41 s.)
      lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("pq"),
          sum(dec(col("l_quantity"))).as("q"),
          sum(when(col("l_quantity") >= 30, 1).otherwise(0)).as("big_lines"))
        .select(col("l_returnflag"),
          rnd((col("pq") / col("q")).cast("double")).as("w_avg_price"),
          col("big_lines"))
        .orderBy("l_returnflag")
    }),

    "b13_name_norm" -> ((s, dir) => {
      // B13: unicode NFKD name normalization — the engine's one true UDF
      // (Exprs.normalizeName; merge_istat_cities.py:9-22). Accents injected
      // deterministically so the op has real work to do.
      val accented = translate(col("c_name"), "aeo", "áèö")
      customer(s, dir)
        .select(col("c_custkey"), normalizeName(accented).as("norm_name"))
        .orderBy("c_custkey")
    }),

    "b14_unique_keys" -> ((s, dir) => {
      // B14: ambiguity-aware key prep — keep rows whose join key is unique
      // (merge_istat_cities.py:57-61).
      EtlOps.uniqueKeysOnly(orders(s, dir), col("o_custkey"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),

    "b15_latest_per_key" -> ((s, dir) => {
      // B15: latest-per-key dedup (merge_cities_all.py:54-57).
      EtlOps.keepFirstPerKey(orders(s, dir), Seq(col("o_custkey")),
          Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    }),

    "b16_multi_join" -> ((s, dir) => {
      // B16: multi-source left-join enrichment + coalesce fallbacks
      // (merge_istat_cities.py:63-99). Misses injected via corrupted keys.
      val key = when(pmod(col("c_nationkey"), lit(11)) === 0, col("c_nationkey") + 100)
        .otherwise(col("c_nationkey"))
      customer(s, dir).withColumn("nk", key)
        .join(broadcast(nation(s, dir)), col("nk") === col("n_nationkey"), "left")
        .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_name"), lit("(n/a)")).as("nation_name"),
          coalesce(col("r_name"), lit("(n/a)")).as("region_name"))
        .orderBy("c_custkey")
    }),

    "b17_staged_join" -> ((s, dir) => {
      // B17: staged fallback join — try the (partially corrupted) primary
      // key, then fill still-missing rows via the clean key
      // (rebuild_and_merge_cities_it.py:175-224).
      val o = orders(s, dir).withColumn("key1",
        when(pmod(col("o_custkey"), lit(13)) === 0, col("o_custkey") + 1000000)
          .otherwise(col("o_custkey")))
      EtlOps.stagedFallbackJoin(o, customer(s, dir),
          Seq(col("key1") -> col("c_custkey"), col("o_custkey") -> col("c_custkey")),
          Seq("c_name", "c_mktsegment"))
        .select("o_orderkey", "c_name", "c_mktsegment", "matched_stage")
        .orderBy("o_orderkey")
    }),

    "b18_fallback_computed" -> ((s, dir) => {
      // B18: fallback computed column coalesce(x, a/nullif(b,0))
      // (rebuild_and_merge_cities_it.py:261-267).
      val x = when(pmod(col("o_orderkey"), lit(5)) === 0, lit(null))
        .otherwise(col("o_totalprice"))
      orders(s, dir)
        .select(col("o_orderkey"),
          rnd(coalesce(x, col("o_totalprice") / nullif(pmod(col("o_orderkey"), lit(3)), lit(0))))
            .as("price_filled"))
        .orderBy("o_orderkey")
    }),

    "b19_keep_richest" -> ((s, dir) => {
      // B19: keep-richest dedup — per key keep the highest-population row
      // (rebuild_and_merge_cities_it.py:284-285).
      EtlOps.keepFirstPerKey(customer(s, dir), Seq(col("c_nationkey")),
          Seq(col("c_acctbal").desc, col("c_custkey").asc))
        .select("c_nationkey", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey")
    }),

    "b20_quality_report" -> ((s, dir) => {
      // B20: data-quality report — per-row missing flags + score, worst-N
      // (rebuild_and_merge_cities_it.py:300-321). Limit is pushed into
      // TakeOrderedAndProject.
      val c = customer(s, dir)
        .withColumn("name_fld",
          when(pmod(col("c_custkey"), lit(11)) === 0, lit(null)).otherwise(col("c_name")))
        .withColumn("bal_fld",
          when(pmod(col("c_custkey"), lit(7)) === 0, lit(null)).otherwise(col("c_acctbal")))
        .withColumn("seg_fld",
          when(pmod(col("c_custkey"), lit(13)) === 0, lit(null)).otherwise(col("c_mktsegment")))
      EtlOps.qualityReport(c, Seq("name_fld", "bal_fld", "seg_fld"),
        col("c_custkey"), 50)
    }),

    "b21_int_coercion" -> ((s, dir) => {
      // B21: int coercion + decimals report (final_cleaning.py:9-67);
      // floor(x+0.5) not round() for cross-engine reproducibility.
      val v = col("l_quantity") + col("l_tax")
      lineitem(s, dir)
        .select(col("l_returnflag"), EtlOps.intCoerce(v).as("iv"),
          EtlOps.hadDecimals(v).as("had_dec"))
        .groupBy("l_returnflag")
        .agg(sum(col("iv")).as("sum_int"), sum(col("had_dec")).as("decimal_cells"))
        .orderBy("l_returnflag")
    }),

    "b22_wkt_roundtrip" -> ((s, dir) => {
      // B22: WKT "POINT (lon lat)" parse (build_hotels_yaml.py:45-54); the
      // strings are built from exact quarter-degree grid values so the
      // round-trip is fp-exact.
      val lon = pmod(col("s_suppkey") * 13, lit(144)) / 4.0 - 18.0
      val lat = pmod(col("s_suppkey") * 7, lit(180)) / 4.0 - 22.0
      val wkt = concat(lit("POINT ("), lon.cast("decimal(6,2)").cast("string"),
        lit(" "), lat.cast("decimal(6,2)").cast("string"), lit(")"))
      supplier(s, dir).withColumn("wkt", wkt)
        .select(col("s_suppkey"), wktLon(col("wkt")).as("lon"), wktLat(col("wkt")).as("lat"))
        .orderBy("s_suppkey")
    }),

    "b23_stars_norm" -> ((s, dir) => {
      // B23: stars normalization from free text (build_hotels_yaml.py:83-88).
      orders(s, dir)
        .select(col("o_orderkey"), starsNorm(col("o_orderpriority")).as("stars"))
        .orderBy("o_orderkey")
    }),

    "b24_nn_join" -> ((s, dir) => {
      // B24: nearest-neighbor fallback join — broadcast cross join +
      // min(struct(d2, key)) argmin, no per-group sort
      // (build_hotels_yaml.py:228-258).
      val cust = customer(s, dir)
        .withColumn("x", pmod(col("c_custkey"), lit(100)) / 2.0)
        .withColumn("y", pmod(col("c_custkey"), lit(71)) / 2.0)
      val centers = nation(s, dir)
        .withColumn("cx", pmod(col("n_nationkey") * 7, lit(100)) / 2.0)
        .withColumn("cy", pmod(col("n_nationkey") * 11, lit(71)) / 2.0)
      EtlOps.nearestNeighborJoin(cust, centers,
          col("x"), col("y"), col("cx"), col("cy"),
          Seq("c_custkey"), "n_nationkey")
        .orderBy("c_custkey")
    }),

    "b25_radius_dedup" -> ((s, dir) => {
      // B25: greedy keep-first spatial dedup within 20 km per nation group —
      // the engine's one flatMapGroups (build_hotels_yaml.py:261-283).
      val pts = customer(s, dir).select(
        col("c_nationkey").cast("string").as("grp"),
        col("c_custkey").as("id"),
        (pmod(col("c_custkey"), lit(97)) / 20.0).as("lat"),
        (pmod(col("c_custkey") * 7, lit(89)) / 20.0).as("lon"))
      RadiusDedup(pts, 20.0).orderBy("grp", "id")
    }),

    "b26_haversine" -> ((s, dir) => {
      // B26: haversine great-circle distance as a pure column expression
      // (build_hotels_yaml.py:36-42).
      val lat = pmod(col("c_custkey"), lit(120)) / 2.0 - 30.0
      val lon = pmod(col("c_custkey"), lit(200)) / 2.0 - 50.0
      customer(s, dir)
        .select(col("c_custkey"),
          rnd3(haversineKm(lat, lon, lit(41.9), lit(12.5))).as("dist_km"))
        .orderBy("c_custkey")
    }),

    "b27_surrogate_id" -> ((s, dir) => {
      // B27: surrogate id {group}-{slug}-{zero-padded rank}
      // (build_hotels_yaml.py:286-291). Dimension-sized input: the global
      // row_number window is a deliberate single-partition step.
      val slug = regexp_replace(normalizeName(col("s_name")), " ", "-")
      supplier(s, dir)
        .select(col("s_suppkey"),
          EtlOps.surrogateId(col("s_nationkey"), slug, col("s_suppkey")).as("sid"))
        .orderBy("s_suppkey")
    }),

    "b29_profile" -> ((s, dir) => {
      // B29: metric-code profiling — distinct codes + frequencies
      // (peek_istr_lav.py:52-90); chunked scan subsumed by a hash aggregate.
      events(s, dir)
        .select(from_json(col("props"), "k INT", new java.util.HashMap[String, String]())
          .getField("k").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    "b31_bucketed_join" -> ((s, dir) => {
      // E22 through the gate: both sides written bucketed on the join key
      // (external tables under tmp), then joined — the join itself runs
      // with no exchange (asserted at plan level in JoinSpec); the oracle
      // proves the layout is invisible in the result. The timed cost
      // honestly includes the one-off bucketed writes (the
      // write-once-shuffle-never trade).
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_bkt")
      // the bucketed tables are the fixture, not a product: reclaim the
      // ~70MB-per-run layout at JVM exit (repeat bench runs were leaking
      // one copy each into the temp filesystem)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          val walk = java.nio.file.Files.walk(tmpDir)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally walk.close()
        } catch { case _: Throwable => () }
      }))
      val tmp = tmpDir.toString
      graft.operators.JoinOps.writeBucketed(
        lineitem(s, dir).select("l_suppkey", "l_quantity"),
        "graft_bkt_lineitem", Seq("l_suppkey"), 8, Some(s"$tmp/li"))
      graft.operators.JoinOps.writeBucketed(
        supplier(s, dir).select("s_suppkey", "s_nationkey"),
        "graft_bkt_supplier", Seq("s_suppkey"), 8, Some(s"$tmp/sup"))
      s.table("graft_bkt_lineitem")
        .join(s.table("graft_bkt_supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), decOut(sum(dec(col("l_quantity")))).as("qty"))
        .orderBy("s_nationkey")
    }),

    "b32_bloom_join" -> ((s, dir) => {
      // E27 through the gate: the big side is pre-pruned by a Bloom filter
      // built from the filtered orders' keys; false positives die in the
      // join, so the result must equal the plain (unpruned) SQL join.
      val hot = orders(s, dir).filter(col("o_totalprice") > 450000.0)
      graft.operators.JoinOps.bloomPrunedJoin(
          lineitem(s, dir), col("l_orderkey"),
          hot, col("o_orderkey"), expectedItems = 4000, fpp = 0.01)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), decOut(sum(dec(col("l_quantity")))).as("qty"))
        .orderBy("o_orderstatus")
    }),

    "b33_zorder" -> ((s, dir) => {
      // E31 through the gate: the 32-bit Morton key itself (quantize →
      // magic-mask spread → interleave) over the b26 synthesized coords —
      // pure integer/float built-ins, bit-reproducible cross-engine.
      val lat = pmod(col("c_custkey"), lit(120)) / 2.0 - 30.0
      val lon = pmod(col("c_custkey"), lit(200)) / 2.0 - 50.0
      customer(s, dir)
        .select(col("c_custkey"),
          graft.sources.DataLayout.zOrder2(lat, -30.0, 30.0, lon, -50.0, 50.0)
            .as("z"))
        .orderBy("c_custkey")
    }),

    "b34_cdc_upsert" -> ((s, dir) => {
      // E35 through the gate: a synthetic changelog derived from orders
      // (every 7th orderkey targets a NEW key -> insert; every 13th is a
      // delete tombstone; the rest overwrite) merges into the customer
      // snapshot — compaction window + one full-outer join on the key.
      val base = customer(s, dir).select("c_custkey", "c_name", "c_acctbal")
      val changelog = orders(s, dir).select(
        when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        concat(lit("n_"), col("o_orderkey").cast("string")).as("c_name"),
        col("o_totalprice").as("c_acctbal"))
      graft.operators.CdcOps.mergeChangelog(base, changelog,
          key = "c_custkey", seq = "seq", op = "op")
        .select(col("c_custkey"), col("c_name"),
          rnd(col("c_acctbal")).as("c_acctbal"))
        .orderBy("c_custkey")
    }),

    "b56_pit_lookup" -> ((s, dir) => {
      // E116: point-in-time lookup against the b47 SCD2 history — each
      // fact (order, at a deterministically shifted seq) picks the
      // dimension version valid AT ITS OWN seq; facts landing after a
      // delete tombstone come back null-attributed. Since r17 the plan is
      // pointInTimeHashed (shuffled-hash equi-join on the entity key,
      // validity interval as the residual — no facts ∪ versions sort):
      // the interleaved PitAb A/B has it winning at every decade on this
      // data's ~10-versions-per-key churn (sf100: 49.0 vs 69.4 s median),
      // and CdcSpec pins row-for-row equality with the as-of plan, which
      // remains the shipped operator for high-churn dimensions.
      val changelog = orders(s, dir).select(
        when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        concat(lit("n_"), col("o_orderkey").cast("string")).as("c_name"),
        col("o_totalprice").as("c_acctbal"))
      val hist = graft.operators.CdcOps.scd2History(changelog,
        Seq("c_custkey"), "seq", "op", Seq("c_name", "c_acctbal"))
      val facts = orders(s, dir).select(
        col("o_orderkey").as("fact_id"),
        when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        (col("o_orderkey") + col("o_orderkey") % 3).as("seq"))
      graft.operators.CdcOps.pointInTimeHashed(facts, hist, Seq("c_custkey"),
          "seq", Seq("c_name", "c_acctbal"))
        .select(col("fact_id"), col("c_custkey"), col("seq"),
          col("pit_c_name"), rnd(col("pit_c_acctbal")).as("pit_c_acctbal"))
        .orderBy("fact_id")
    }),

    "b47_scd2" -> ((s, dir) => {
      // E73: type-2 SCD history over the b34 changelog — one validity
      // interval per upsert, delete tombstones close without opening.
      val changelog = orders(s, dir).select(
        when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        concat(lit("n_"), col("o_orderkey").cast("string")).as("c_name"),
        col("o_totalprice").as("c_acctbal"))
      graft.operators.CdcOps.scd2History(changelog, Seq("c_custkey"),
          "seq", "op", Seq("c_name", "c_acctbal"))
        .select(col("c_custkey"), col("seq_from"), col("seq_to"),
          col("is_current").cast("int").as("is_current"), col("c_name"),
          rnd(col("c_acctbal")).as("c_acctbal"))
        .orderBy("c_custkey", "seq_from")
    }),

    "b35_snapshot_diff" -> ((s, dir) => {
      // E42 through the gate: diff two snapshot versions (every 11th key
      // deleted, every 3rd rebalanced, every 17th re-keyed in as an
      // insert) into a minimal I/U/D changelog — the inverse of b34's
      // merge; the round-trip law is asserted in CdcSpec/RandomizedSpec.
      val old = customer(s, dir).select("c_custkey", "c_name", "c_acctbal")
      val newer = old.filter(col("c_custkey") % 11 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 3 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")))
        .unionByName(old.filter(col("c_custkey") % 17 === 0)
          .select((col("c_custkey") + 500000L).as("c_custkey"),
            col("c_name"), col("c_acctbal")))
      graft.operators.CdcOps.diffSnapshots(old, newer, "c_custkey")
        .select(col("c_custkey"), col("op"), col("c_name"),
          rnd(col("c_acctbal")).as("c_acctbal"))
        .orderBy("c_custkey")
    }),

    "b43_unpivot" -> ((s, dir) => {
      // E69: wide→long melt of two part metrics — the inverse of b07's
      // pivot, planned as a narrow Expand (no shuffle, no UDF).
      EtlOps.unpivotLong(
          part(s, dir).select(col("p_partkey"),
            col("p_size").cast("double").as("size"),
            col("p_retailprice").cast("double").as("retailprice")),
          keys = Seq("p_partkey"), metrics = Seq("size", "retailprice"))
        .orderBy("p_partkey", "metric")
    }),

    "b44_jsonl_read" -> ((s, dir) => {
      // E70: corrupt-tolerant JSONL ingest — nation rendered to JSON lines
      // with every 3rd line truncated mid-record; PERMISSIVE read routes
      // bad lines to _corrupt instead of dropping (DROPMALFORMED) or
      // failing (FAILFAST). Summary = per-branch count + key checksum.
      import org.apache.spark.sql.types._
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_b44_jsonl").toString
      val line = to_json(struct(col("n_nationkey"), col("n_name"),
        col("n_regionkey")))
      nation(s, dir)
        .select(when(col("n_nationkey") % 3 === 0,
            substring(line, 1, 20)).otherwise(line).as("value"))
        .coalesce(1).write.mode("overwrite").text(tmp)
      val schema = StructType(Seq(
        StructField("n_nationkey", LongType), StructField("n_name", StringType),
        StructField("n_regionkey", LongType)))
      EtlOps.readJsonlPermissive(s, tmp, schema)
        .groupBy(when(col("_corrupt").isNull, "good").otherwise("corrupt")
          .as("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_nationkey")).as("key_sum"))
        .orderBy("status")
    }),

    "b51_orc_roundtrip" -> ((s, dir) => {
      // E77: ORC source/sink round-trip — columnar-format coverage beside
      // parquet (everywhere else) and CSV/JSONL (b01/b44). Reads back
      // with a projection + filter so the ORC reader's pushdown paths
      // execute, then aggregates.
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_b51_orc").toString
      customer(s, dir).write.mode("overwrite")
        .option("compression", "zlib").orc(tmp)
      s.read.orc(tmp)
        .filter(col("c_acctbal") > 0.0)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), decOut(sum(dec(col("c_acctbal")))).as("bal_sum"))
        .orderBy("c_mktsegment")
    }),

    "b52_sql_surface" -> ((s, dir) => {
      // E79: the SQL-string API surface — the same engine is a SQL engine:
      // register the tables as temp views and run ANSI SQL text through
      // spark.sql (same Catalyst plans as the DataFrame DSL; the oracle
      // twin is literally the same query). View names are scoped per
      // session; re-registration is idempotent.
      orders(s, dir).createOrReplaceTempView("orders_v")
      customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql(s"""
        SELECT c.c_mktsegment,
               year(o.o_orderdate) AS o_year,
               COUNT(*) AS n,
               round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) * 10000) / 10000 AS spend
        FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderpriority LIKE '1-%'
        GROUP BY 1, 2
        ORDER BY 1, 2""")
    }),

    "b30_salted_join" -> ((s, dir) => {
      // E21 through the gate: the salted plan must produce EXACTLY the
      // plain join's rows — oracle is the unsalted SQL join.
      graft.operators.JoinOps.saltedEquiJoin(
          lineitem(s, dir), supplier(s, dir),
          keys = Seq("l_suppkey" -> "s_suppkey"),
          saltBy = col("l_orderkey") * lit(8) + col("l_linenumber"),
          factor = 8)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n"))
        .orderBy("s_nationkey")
    })
  )

  // ---- oracle SQL ----------------------------------------------------------

  /** DuckDB twin of the euro-string parse in b04. Builds the same decimal
    * STRING and casts it — arithmetic (int + frac/100.0) would produce a
    * different last-ulp double than the string parse. */
  private val b04Value =
    "CASE WHEN l_linenumber = 7 THEN NULL ELSE TRY_CAST(" +
      "CAST(l_orderkey * 7 + l_linenumber AS VARCHAR) || '.' || lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0')" +
      " AS DOUBLE) END"

  val oracle: Map[String, String] = Map(
    "b01_csv_sniff" -> "SELECT r_regionkey, r_name FROM region ORDER BY 1",

    "b02_header_norm" -> "SELECT p_partkey, p_name FROM part ORDER BY 1",

    "b03_fuzzy_col" ->
      """SELECT * FROM (VALUES ('name', 'The Name'), ('partkey', 'Part-Key'),
        |  ('retailprice', 'Retail Price EUR')) t(candidate, resolved) ORDER BY 1""".stripMargin,

    "b04_locale_numeric" ->
      s"""SELECT l_orderkey, l_linenumber, $b04Value AS parsed
         |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "b05_regex_filter" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE NOT regexp_matches(o_orderpriority, '^[13]-')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "b06_latest_year" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n, ${decSumSql("o_totalprice")} AS spend
         |FROM orders
         |WHERE year(o_orderdate) = (SELECT max(year(o_orderdate)) FROM orders)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "b07_pivot" ->
      s"""SELECT l_returnflag,
         |  ${decSumSql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
         |  ${decSumSql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "b08_ratio" ->
      s"""SELECT c_nationkey,
         |  ${rnd3Sql("least(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) / COUNT(*), 1.0)")} AS neg_share
         |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "b09_rank_dedup" ->
      """SELECT p_name, p_partkey, p_type FROM (
        |  SELECT p_name, p_partkey, p_type,
        |    row_number() OVER (PARTITION BY p_name
        |      ORDER BY CASE p_type WHEN 'LARGE' THEN 3 WHEN 'MEDIUM' THEN 2 ELSE 1 END DESC,
        |               p_partkey) AS rn
        |  FROM part) WHERE rn = 1 ORDER BY p_name""".stripMargin,

    "b10_domain_filters" ->
      """SELECT p_brand, COUNT(*) AS n FROM part
        |WHERE p_size BETWEEN 10 AND 30
        |  AND p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
        |  AND regexp_matches(p_name, '^(red|small) ')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "b11_region_map" ->
      """SELECT n_nationkey, COALESCE(r_name, '(Unknown)') AS region_name
        |FROM nation LEFT JOIN region
        |  ON (CASE WHEN n_nationkey % 7 = 0 THEN 99 ELSE n_regionkey END) = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "b12_weighted_agg" ->
      s"""SELECT l_returnflag,
         |  ${rndSql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) / SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)")} AS w_avg_price,
         |  CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS big_lines
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "b13_name_norm" ->
      """SELECT c_custkey,
        |  trim(regexp_replace(strip_accents(lower(
        |    replace(replace(replace(c_name, 'a', chr(225)), 'e', chr(232)), 'o', chr(246))
        |  )), '[^a-z0-9]+', ' ', 'g')) AS norm_name
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "b14_unique_keys" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT o_custkey FROM orders GROUP BY 1 HAVING COUNT(*) = 1)
        |ORDER BY o_orderkey""".stripMargin,

    "b15_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "b16_multi_join" ->
      """SELECT c_custkey, COALESCE(n_name, '(n/a)') AS nation_name,
        |       COALESCE(r_name, '(n/a)') AS region_name
        |FROM customer
        |LEFT JOIN nation ON (CASE WHEN c_nationkey % 11 = 0 THEN c_nationkey + 100 ELSE c_nationkey END) = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,

    "b17_staged_join" ->
      """SELECT o_orderkey,
        |  COALESCE(c1.c_name, c2.c_name) AS c_name,
        |  COALESCE(c1.c_mktsegment, c2.c_mktsegment) AS c_mktsegment,
        |  CASE WHEN c1.c_custkey IS NOT NULL THEN 1
        |       WHEN c2.c_custkey IS NOT NULL THEN 2 END AS matched_stage
        |FROM orders
        |LEFT JOIN customer c1
        |  ON (CASE WHEN o_custkey % 13 = 0 THEN o_custkey + 1000000 ELSE o_custkey END) = c1.c_custkey
        |LEFT JOIN customer c2 ON o_custkey = c2.c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "b18_fallback_computed" ->
      s"""SELECT o_orderkey,
         |  ${rndSql("COALESCE(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END, o_totalprice / nullif(o_orderkey % 3, 0))")} AS price_filled
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "b19_keep_richest" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn = 1 ORDER BY c_nationkey""".stripMargin,

    "b20_quality_report" ->
      """SELECT c_custkey,
        |  CAST(c_custkey % 11 = 0 AS INT) AS missing_name_fld,
        |  CAST(c_custkey % 7 = 0 AS INT) AS missing_bal_fld,
        |  CAST(c_custkey % 13 = 0 AS INT) AS missing_seg_fld,
        |  (CAST(c_custkey % 11 = 0 AS INT) + CAST(c_custkey % 7 = 0 AS INT)
        |   + CAST(c_custkey % 13 = 0 AS INT)) AS missing_count
        |FROM customer ORDER BY missing_count DESC, c_custkey LIMIT 50""".stripMargin,

    "b21_int_coercion" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(floor(l_quantity + l_tax + 0.5) AS BIGINT)) AS BIGINT) AS sum_int,
        |  CAST(SUM(CASE WHEN l_quantity + l_tax <> floor(l_quantity + l_tax) THEN 1 ELSE 0 END) AS BIGINT) AS decimal_cells
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "b22_wkt_roundtrip" ->
      """SELECT s_suppkey,
        |  (s_suppkey * 13 % 144) / 4.0 - 18.0 AS lon,
        |  (s_suppkey * 7 % 180) / 4.0 - 22.0 AS lat
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "b23_stars_norm" ->
      """SELECT o_orderkey,
        |  TRY_CAST(nullif(regexp_extract(o_orderpriority, '([0-5](?:\.\d)?)', 1), '') AS DOUBLE) AS stars
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "b24_nn_join" -> {
      val dx = "((c_custkey % 100) / 2.0 - (n_nationkey * 7 % 100) / 2.0)"
      val dy = "((c_custkey % 71) / 2.0 - (n_nationkey * 11 % 71) / 2.0)"
      val d2 = s"($dx * $dx + $dy * $dy)"
      s"""SELECT c_custkey, n_nationkey AS nn_n_nationkey, d2 AS nn_d2 FROM (
         |  SELECT c_custkey, n_nationkey, $d2 AS d2,
         |    row_number() OVER (PARTITION BY c_custkey ORDER BY $d2, n_nationkey) AS rn
         |  FROM customer, nation) WHERE rn = 1 ORDER BY c_custkey""".stripMargin
    },

    "b25_radius_dedup" -> radiusDedupOracle,

    "b26_haversine" ->
      s"""SELECT c_custkey,
         |  ${rnd3Sql(havSql("((c_custkey % 120) / 2.0 - 30.0)", "((c_custkey % 200) / 2.0 - 50.0)", "41.9", "12.5"))} AS dist_km
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "b27_surrogate_id" ->
      """SELECT s_suppkey,
        |  s_nationkey || '-' ||
        |  replace(trim(regexp_replace(strip_accents(lower(s_name)), '[^a-z0-9]+', ' ', 'g')), ' ', '-')
        |  || '-' || lpad(CAST(row_number() OVER (ORDER BY s_suppkey) AS VARCHAR), 6, '0') AS sid
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "b29_profile" ->
      """SELECT TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the plain join — the bucketed layout must be invisible in the result
    "b31_bucketed_join" ->
      s"""SELECT s_nationkey, COUNT(*) AS n, ${decSumSql("l_quantity")} AS qty
         |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // twin of DataLayout.zOrder2: same quantization arithmetic, same
    // magic-mask spread chain, same interleave
    "b33_zorder" -> {
      def quant(e: String, lo: String, range: String) =
        s"least(65535, greatest(0, CAST(floor(($e - $lo) / $range * 65536.0) AS BIGINT)))"
      s"""WITH base AS (
         |  SELECT c_custkey,
         |    ${quant("((c_custkey % 120) / 2.0 - 30.0)", "-30.0", "60.0")} AS qx,
         |    ${quant("((c_custkey % 200) / 2.0 - 50.0)", "-50.0", "100.0")} AS qy
         |  FROM customer),
         |s0 AS (SELECT c_custkey, qx & 65535 AS ax, qy & 65535 AS ay FROM base),
         |s1 AS (SELECT c_custkey, (ax | (ax << 8)) & 16711935 AS bx, (ay | (ay << 8)) & 16711935 AS yb FROM s0),
         |s2 AS (SELECT c_custkey, (bx | (bx << 4)) & 252645135 AS cx, (yb | (yb << 4)) & 252645135 AS cy FROM s1),
         |s3 AS (SELECT c_custkey, (cx | (cx << 2)) & 858993459 AS dx, (cy | (cy << 2)) & 858993459 AS dy FROM s2),
         |s4 AS (SELECT c_custkey, (dx | (dx << 1)) & 1431655765 AS ex, (dy | (dy << 1)) & 1431655765 AS ey FROM s3)
         |SELECT c_custkey, ex | (ey << 1) AS z FROM s4 ORDER BY c_custkey""".stripMargin
    },

    // lead-window twin over the same changelog derivation
    // twin of pointInTime over the b47 history: DuckDB's ASOF LEFT JOIN
    // picks the greatest seq_from <= fact seq; validity (seq < seq_to,
    // open intervals unbounded) gates the payload exactly as the operator
    "b56_pit_lookup" ->
      s"""WITH ch AS (
         |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS c_custkey,
         |    o_orderkey AS seq,
         |    CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
         |    'n_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         |    o_totalprice AS c_acctbal
         |  FROM orders),
         |v0 AS (
         |  SELECT *, lead(seq) OVER (PARTITION BY c_custkey ORDER BY seq) AS seq_to
         |  FROM ch),
         |v AS (SELECT c_custkey, seq AS seq_from, seq_to, c_name, c_acctbal
         |      FROM v0 WHERE op <> 'D'),
         |f AS (
         |  SELECT o_orderkey AS fact_id,
         |    CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS c_custkey,
         |    o_orderkey + o_orderkey % 3 AS seq
         |  FROM orders)
         |SELECT f.fact_id, f.c_custkey, f.seq,
         |  CASE WHEN v.seq_to IS NULL OR f.seq < v.seq_to THEN v.c_name END AS pit_c_name,
         |  CASE WHEN v.seq_to IS NULL OR f.seq < v.seq_to THEN ${rndSql("v.c_acctbal")} END AS pit_c_acctbal
         |FROM f ASOF LEFT JOIN v
         |  ON f.c_custkey = v.c_custkey AND f.seq >= v.seq_from
         |ORDER BY fact_id""".stripMargin,

    "b47_scd2" ->
      s"""WITH ch AS (
         |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS c_custkey,
         |    o_orderkey AS seq,
         |    CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
         |    'n_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         |    o_totalprice AS c_acctbal
         |  FROM orders),
         |v AS (
         |  SELECT *, lead(seq) OVER (PARTITION BY c_custkey ORDER BY seq) AS seq_to
         |  FROM ch)
         |SELECT c_custkey, seq AS seq_from, seq_to,
         |  CAST(seq_to IS NULL AS INT) AS is_current, c_name,
         |  ${rndSql("c_acctbal")} AS c_acctbal
         |FROM v WHERE op <> 'D' ORDER BY c_custkey, seq_from""".stripMargin,

    // the SAME SQL text modulo view names — the surface demonstration
    "b52_sql_surface" ->
      """SELECT c.c_mktsegment, year(o.o_orderdate) AS o_year, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) * 10000) / 10000 AS spend
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderpriority LIKE '1-%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // format round-trip must be invisible: oracle recomputes straight
    // from the table
    "b51_orc_roundtrip" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, ${decSumSql("c_acctbal")} AS bal_sum
         |FROM customer WHERE c_acctbal > 0.0
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // UNION ALL twin of the Expand-planned unpivot
    "b43_unpivot" ->
      """SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    // every 3rd nation key truncated mid-JSON-line -> the corrupt branch;
    // key sums recomputed straight from the table
    "b44_jsonl_read" ->
      """SELECT 'corrupt' AS status, COUNT(*) AS n_rows, CAST(NULL AS BIGINT) AS key_sum
        |FROM nation WHERE n_nationkey % 3 = 0
        |UNION ALL
        |SELECT 'good' AS status, COUNT(*) AS n_rows, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation WHERE n_nationkey % 3 <> 0
        |ORDER BY status""".stripMargin,

    // the UNPRUNED join — bloom pruning must be invisible in the result
    "b32_bloom_join" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n, ${decSumSql("l_quantity")} AS qty
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_totalprice > 450000.0
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // twin of CdcOps.mergeChangelog: same changelog derivation, compaction
    // via row_number, full-outer merge with delete tombstones
    "b34_cdc_upsert" ->
      """WITH ch AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS c_custkey,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
        |    'n_' || CAST(o_orderkey AS VARCHAR) AS c_name,
        |    o_totalprice AS c_acctbal
        |  FROM orders),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT ch.*, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC, op ASC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT COALESCE(b.c_custkey, l.c_custkey) AS c_custkey,
        |  CASE WHEN l.c_custkey IS NOT NULL THEN l.c_name ELSE b.c_name END AS c_name,
        |  round((CASE WHEN l.c_custkey IS NOT NULL THEN l.c_acctbal ELSE b.c_acctbal END) * 10000) / 10000 AS c_acctbal
        |FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY c_custkey""".stripMargin,

    // twin of CdcOps.diffSnapshots: same snapshot derivation, full-outer
    // join, fieldwise IS DISTINCT FROM == the struct <=> negation
    "b35_snapshot_diff" ->
      """WITH oldt AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |newt AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 11 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 500000, c_name, c_acctbal FROM customer WHERE c_custkey % 17 = 0)
        |SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
        |  CASE WHEN o.c_custkey IS NULL THEN 'I'
        |       WHEN n.c_custkey IS NULL THEN 'D' ELSE 'U' END AS op,
        |  n.c_name AS c_name,
        |  round(n.c_acctbal * 10000) / 10000 AS c_acctbal
        |FROM oldt o FULL OUTER JOIN newt n ON o.c_custkey = n.c_custkey
        |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
        |   OR o.c_name IS DISTINCT FROM n.c_name
        |   OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
        |ORDER BY c_custkey""".stripMargin,

    // the UNSALTED join — salting must be invisible in the result
    "b30_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** Haversine SQL with the same operation tree as Exprs.haversineKm /
    * RadiusDedup (x*x multiplies, identical association) so both engines
    * produce bit-identical doubles. */
  private def havSql(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val sLat = s"sin(radians($lat2 - $lat1) / 2)"
    val sLon = s"sin(radians($lon2 - $lon1) / 2)"
    s"6371.0088 * 2 * asin(sqrt($sLat * $sLat + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * ($sLon * $sLon)))"
  }

  /** DuckDB twin of the greedy radius dedup: a recursive CTE walks each
    * group's rank order carrying the kept point set as list columns. */
  private lazy val radiusDedupOracle: String = {
    s"""WITH RECURSIVE pts AS (
       |  SELECT CAST(c_nationkey AS VARCHAR) AS grp, c_custkey AS id,
       |         (c_custkey % 97) / 20.0 AS lat, (c_custkey * 7 % 89) / 20.0 AS lon,
       |         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
       |  FROM customer),
       |counts AS (SELECT grp, max(rn) AS mx FROM pts GROUP BY 1),
       |step(grp, rn, ids, lats, lons) AS (
       |  SELECT grp, 0, CAST([] AS BIGINT[]), CAST([] AS DOUBLE[]), CAST([] AS DOUBLE[])
       |  FROM (SELECT DISTINCT grp FROM pts)
       |  UNION ALL
       |  SELECT t.grp, t.rn,
       |    CASE WHEN t.ok THEN list_append(t.ids, t.id) ELSE t.ids END,
       |    CASE WHEN t.ok THEN list_append(t.lats, t.lat) ELSE t.lats END,
       |    CASE WHEN t.ok THEN list_append(t.lons, t.lon) ELSE t.lons END
       |  FROM (
       |    SELECT s.grp AS grp, p.rn AS rn, s.ids AS ids, s.lats AS lats, s.lons AS lons,
       |      p.id AS id, p.lat AS lat, p.lon AS lon,
       |      len(list_filter(range(len(s.lats)),
       |        i -> ${havSql("s.lats[i + 1]", "s.lons[i + 1]", "p.lat", "p.lon")} <= 20.0)) = 0 AS ok
       |    FROM step s JOIN pts p ON p.grp = s.grp AND p.rn = s.rn + 1
       |  ) t)
       |SELECT s.grp AS grp, unnest(s.ids) AS id
       |FROM step s JOIN counts c ON s.grp = c.grp AND s.rn = c.mx
       |ORDER BY s.grp, id""".stripMargin
  }
}
