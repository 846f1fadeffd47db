package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.AnalyticsOps

/** Unit coverage for the OLAP analytics operators (SURVEY §2E E44-E51);
  * sf-scale behavior is covered by the Verify oracle gate. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val sales = Seq(
    (2024, "HIGH", 10.0), (2024, "HIGH", 20.0), (2024, "LOW", 5.0),
    (2025, "HIGH", 7.0), (2025, "LOW", 1.0), (2025, "LOW", 2.0)
  ).toDF("y", "prio", "amt")

  private def specs = Seq(
    ("n", count(lit(1)), (n: String) => sum(col(n))),
    ("amt_sum", sum(col("amt").cast("decimal(18,4)")), (n: String) => sum(col(n))))

  test("rollupAdditive matches the built-in rollup + grouping_id") {
    val ours = AnalyticsOps.rollupAdditive(sales,
        Seq("y" -> col("y"), "prio" -> col("prio")), specs)
      .select(col("y"), col("prio"), col("n"),
        col("amt_sum").cast("double").as("amt_sum"), col("lvl"))
      .orderBy("lvl", "y", "prio").collect().toSeq
    val builtin = sales.rollup(col("y"), col("prio"))
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(18,4)")).cast("double").as("amt_sum"),
        grouping_id().as("lvl"))
      .select(col("y"), col("prio"), col("n"), col("amt_sum"), col("lvl"))
      .orderBy("lvl", "y", "prio").collect().toSeq
    assert(ours === builtin)
  }

  test("cubeAdditive matches the built-in cube + grouping_id") {
    val ours = AnalyticsOps.cubeAdditive(sales,
        Seq("y" -> col("y"), "prio" -> col("prio")), specs)
      .select(col("y"), col("prio"), col("n"),
        col("amt_sum").cast("double").as("amt_sum"), col("lvl"))
      .orderBy("lvl", "y", "prio").collect().toSeq
    val builtin = sales.cube(col("y"), col("prio"))
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(18,4)")).cast("double").as("amt_sum"),
        grouping_id().as("lvl"))
      .select(col("y"), col("prio"), col("n"), col("amt_sum"), col("lvl"))
      .orderBy("lvl", "y", "prio").collect().toSeq
    assert(ours === builtin)
  }

  test("movingAgg: hand-checked 3-row frame, delta null on first row per key") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10.0), (2L, "2024-01-01 00:01:00", 20.0),
      (3L, "2024-01-01 00:02:00", 30.0), (4L, "2024-01-01 00:03:00", 40.0)
    ).toDF("id", "t", "v").withColumn("t", to_timestamp(col("t")))
    val out = AnalyticsOps.movingAgg(df, Seq(lit(1)), "t", col("id"),
        col("v"), lookback = 3)
      .orderBy("id")
      .select("moving_avg", "moving_min", "moving_max", "delta_prev")
      .collect()
    assert(out(0).getDouble(0) === 10.0 && out(0).isNullAt(3))
    assert(out(1).getDouble(0) === 15.0 && out(1).getDouble(3) === 10.0)
    assert(out(2).getDouble(0) === 20.0) // (10+20+30)/3
    assert(out(3).getDouble(0) === 30.0) // (20+30+40)/3 — frame slides
    assert(out(3).getDouble(1) === 20.0 && out(3).getDouble(2) === 40.0)
  }

  test("approxDistinctCount: within rsd-consistent error of exact on events") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", i % 701)).toDF("g", "v")
    val exact = AnalyticsOps.distinctCount(df, Seq(col("g")), col("v"), "u")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = AnalyticsOps.approxDistinctCount(df, Seq(col("g")), col("v"), "u")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val a = approx(g)
      assert(math.abs(a - n).toDouble / n < 0.15, s"group $g: exact=$n approx=$a")
    }
  }

  test("zscoreOutliers: flags tail values, degenerate groups yield null z") {
    val df = (Seq.fill(50)(10.0) ++ Seq(1000.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "g", "v")
      .unionByName(Seq((100L, "const", 5.0), (101L, "const", 5.0),
        (102L, "single", 7.0)).toDF("id", "g", "v"))
    val out = AnalyticsOps.zscoreOutliers(df, Seq("g"), col("v"), 2.0)
      .select("id", "z", "is_outlier").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), r.getBoolean(2))).toMap
    assert(out(50L)._2 === true)               // the 1000.0 outlier
    assert(out(0L)._2 === false)
    assert(out(100L)._1.isEmpty && !out(100L)._2) // constant group: sd=0
    assert(out(102L)._1.isEmpty && !out(102L)._2) // single row: sd null
  }

  test("membershipLabel: semi/anti partition the left side exactly") {
    val left = Seq(1, 2, 3, 4).toDF("k")
    val right = Seq(2, 2, 4).toDF("k") // dup on the right must not explode
    val out = AnalyticsOps.membershipLabel(left, right, Seq("k"), "m")
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq === Seq((1, "absent"), (2, "present"),
      (3, "absent"), (4, "present")))
  }

  test("fixedWidthHistogram: bin bounds and edge clamping") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, 150.0).toDF("v")
    val out = AnalyticsOps.fixedWidthHistogram(df, col("v"), 0.0, 100.0, 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // -5 clamps to bin 0; 150 clamps to bin 9; 10.0 goes to bin 1
    assert(out.toSeq === Seq(
      (0L, 0.0, 10.0, 3L), (1L, 10.0, 20.0, 1L), (2L, 20.0, 30.0, 1L),
      (9L, 90.0, 100.0, 2L)))
  }

  test("slidingWindowAgg: each event lands in duration/slide windows (batch)") {
    val df = Seq((ts("2024-01-01 00:07:00"), "a", 1.0))
      .toDF("ts", "k", "v")
    val out = AnalyticsOps.slidingWindowAgg(df, "ts", "10 minutes", "5 minutes",
        Seq(col("k")), Seq(count(lit(1)).as("cnt")))
      .select(unix_timestamp(col("window.start")).as("s"), col("cnt"))
      .orderBy("s").collect().map(r => (r.getLong(0), r.getLong(1)))
    // 00:07 is inside [00:00,00:10) and [00:05,00:15)
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    assert(out.toSeq === Seq((base, 1L), (base + 300, 1L)))
  }

  test("slidingWindowAgg: runs on a watermarked stream with state eviction") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agged = AnalyticsOps.slidingWindowAgg(
      mem.toDF().toDF("ts", "k", "v").withWatermark("ts", "10 seconds"),
      "ts", "10 minutes", "5 minutes",
      Seq(col("k")), Seq(count(lit(1)).as("cnt")))
    val q = agged.writeStream.format("memory").queryName("sliding_test")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:07:00"), "a", 1.0))
      q.processAllAvailable()
      // advance the watermark far past both windows to force emission
      mem.addData((ts("2024-01-01 01:00:00"), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sliding_test")
        .select(unix_timestamp(col("window.start")).as("s"), col("cnt"))
        .orderBy("s").collect().map(r => (r.getLong(0), r.getLong(1)))
      val base = ts("2024-01-01 00:00:00").getTime / 1000
      assert(rows.toSeq === Seq((base, 1L), (base + 300, 1L)))
    } finally q.stop()
  }

  test("quantileBuckets: deterministic ntile with remainder in leading buckets") {
    // 7 rows, 3 buckets -> sizes 3,2,2 in (score, id) order
    val df = (1 to 7).map(i => (i.toLong, "g", i * 1.0)).toDF("id", "g", "s")
    val out = AnalyticsOps.quantileBuckets(df, Seq(col("g")), col("s"),
        col("id"), n = 3, as = "b")
      .orderBy("id").collect().map(_.getInt(3))
    assert(out.toSeq === Seq(1, 1, 1, 2, 2, 3, 3))
  }

  test("sparseCosinePairs: identical docs cosine 1, no pairs without shared terms") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana cherry"),     // identical to 1
      (3L, "apple banana kiwi"),       // overlaps 1/2
      (4L, "totally unrelated words")
    ).toDF("doc_id", "text")
    val out = TextOps.sparseCosinePairs(docs, col("doc_id"), col("text"),
        threshold = 0.1, maxDf = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-9) // identical
    assert(out.contains((1L, 3L)) && out((1L, 3L)) < 1.0)
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L }) // no shared terms
  }

  test("sparseCosinePairs: maxDf prunes the stopword posting list") {
    import graft.operators.TextOps
    // 'the' appears in all 4 docs; with maxDf=3 it contributes no pairs
    val docs = Seq(
      (1L, "the aa bb"), (2L, "the aa bb"), (3L, "the cc dd"), (4L, "the ee ff")
    ).toDF("doc_id", "text")
    val out = TextOps.sparseCosinePairs(docs, col("doc_id"), col("text"),
        threshold = 0.01, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L))) // only the aa/bb overlap survives
  }

  test("sparseCosinePairsFrac: fractional cutoff scales with corpus size") {
    import graft.operators.TextOps
    // 10 docs: 'the' in all 10 (df 1.0), 'link' in 3 (df 0.3). With
    // frac=0.5 the cutoff is floor(0.5*10)=5: 'link' kept, 'the' pruned —
    // and doubling the corpus with unique-term docs keeps the SAME verdict
    // (an absolute cutoff of 5 would not survive the doubling if the
    // linking df doubled with it).
    def corpus(extra: Int) = (
      Seq((1L, "the link aa"), (2L, "the link bb"), (3L, "the link cc")) ++
      (4L to (7L + extra)).map(i => (i, s"the unique$i only$i"))
    ).toDF("doc_id", "text")
    def pairs(docs: org.apache.spark.sql.DataFrame) =
      TextOps.sparseCosinePairsFrac(docs, col("doc_id"), col("text"),
          threshold = 0.01, maxDfFrac = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val small = pairs(corpus(3))   // 10 docs, 'link' df 3 <= floor(5)
    assert(small === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // 20 docs: cutoff floor(0.5*20)=10, 'the' df 20 still pruned,
    // 'link' df 3 still kept — same pair set
    assert(pairs(corpus(13)) === small)
  }

  test("repairText: counts and fixes control chars, mojibake, whitespace runs") {
    import graft.operators.TextOps
    // doc 1: mojibake e-acute + a BEL control char; doc 2: mojibake
    // right-quote + a whitespace run
    val docs = Seq(
      (1L, "caf" + MojEacute + " is" + Bel + " nice"),
      (2L, "don" + MojRquote + "t  stop"),
      (3L, "clean text here")
    ).toDF("id", "text")
    val out = TextOps.repairText(docs, col("id"), col("text"))
      .orderBy("id").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(out(0) === (("caf" + Eacute + " is nice", 1, 1L, 0)))
    assert(out(1) === (("don't stop", 0, 1L, 1)))
    assert(out(2) === (("clean text here", 0, 0L, 0)))
  }

  test("repairText: multiple distinct mojibake sequences count per stage") {
    import graft.operators.TextOps
    val docs = Seq((1L, "x" + MojRquote + "y " + MojRdquote + "z"))
      .toDF("id", "text")
    val out = TextOps.repairText(docs, col("id"), col("text"))
      .collect().head
    assert(out.getString(1) === "x'y " + Rdquote + "z")
    assert(out.getLong(3) === 2L) // right single quote + right double quote
  }

  test("rollupAdditive: AQE reuses the finest-agg shuffle across level branches") {
    val df = AnalyticsOps.rollupAdditive(sales,
      Seq("y" -> col("y"), "prio" -> col("prio")), specs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // 3 levels, branches 2 and 3 must reuse branch 1's materialized
    // exchange - this is what makes the additive plan a 1x (not 3x) scan
    // of the fact table
    assert("ReusedExchange".r.findAllIn(plan).length >= 2, plan.take(2000))
  }

  test("tableChecksum: order-independent, content-sensitive, null-safe") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, null)).toDF("k", "v")
    val cols = Seq(col("k"), col("v"))
    def sum(df: org.apache.spark.sql.DataFrame) =
      AnalyticsOps.tableChecksum(df, cols).collect().head match {
        case r => (r.getLong(0), r.getString(1))
      }
    val base = sum(a)
    assert(sum(a.repartition(7)) === base)      // partition order irrelevant
    assert(sum(a.orderBy(desc("k"))) === base)  // row order irrelevant
    val changed = Seq((1L, "x"), (2L, "z"), (3L, null)).toDF("k", "v")
    assert(sum(changed) !== base)               // one value flips the sum
  }

  test("bigramPmi: planted collocation scores above chance, counts exact") {
    import graft.operators.TextOps
    // 'new york' always adjacent; 'aa'/'bb' co-occur only by chance
    val docs = (1 to 10).map(i => (i.toLong, s"new york aa$i bb${i % 3} filler"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramPmi(docs, col("doc_id"), col("text"), minCount = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    val (cAb, pmi) = out("new york")
    assert(cAb === 10L)
    assert(pmi > 1.5, s"collocation should beat independence: $pmi")
  }

  test("sampleFrames: stride, offsets, ragged tail slices") {
    import graft.operators.Multimodal
    // 10-byte payload, 3-byte frames -> frames 0..3 (tail = 1 byte);
    // stride 2 keeps frames 0 and 2
    val media = Seq((1L, "ABCDEFGHIJ")).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val out = Multimodal.sampleFrames(media, frameBytes = 3, stride = 2)
      .orderBy("frame_no").collect()
      .map(r => (r.getLong(1), r.getLong(2), new String(r.getAs[Array[Byte]](3), "UTF-8")))
    assert(out.toSeq === Seq((0L, 0L, "ABC"), (2L, 6L, "GHI")))
    // stride 1 exposes the ragged 1-byte tail
    val all = Multimodal.sampleFrames(media, frameBytes = 3, stride = 1)
      .orderBy("frame_no").collect()
      .map(r => new String(r.getAs[Array[Byte]](3), "UTF-8"))
    assert(all.toSeq === Seq("ABC", "DEF", "GHI", "J"))
    // empty payload -> no rows
    val empty = Seq((2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    assert(Multimodal.sampleFrames(empty, 3, 1).count() === 0)
  }

  test("charClassStats: exact fractions, empty doc all zeros") {
    import graft.operators.TextOps
    val docs = Seq((1L, "Ab1 !"), (2L, "")).toDF("id", "text")
    val out = TextOps.charClassStats(docs, col("id"), col("text"))
      .orderBy("id").collect()
    val r = out(0)
    assert(r.getAs[Int]("n_chars") === 5)
    assert(r.getAs[Double]("alpha_frac") === 0.4)  // A, b
    assert(r.getAs[Double]("digit_frac") === 0.2)  // 1
    assert(r.getAs[Double]("space_frac") === 0.2)
    assert(r.getAs[Double]("upper_frac") === 0.2)  // A
    assert(r.getAs[Double]("symbol_frac") === 0.2) // !
    val e = out(1)
    assert(e.getAs[Int]("n_chars") === 0 && e.getAs[Double]("alpha_frac") === 0.0)
  }

  test("extractDomains: lowercased hosts aggregate across docs, ports kept in URL not domain") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "x http://A.COM/p y https://b.org:8080/q"),
      (2L, "see http://a.com/other"),
      (3L, "no urls here")
    ).toDF("id", "text")
    val out = TextOps.extractDomains(docs, col("id"), col("text"))
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a.com", 2L, 2L), ("b.org", 1L, 1L)))
  }

  test("approx distinct runs as a windowed streaming aggregate (HLL is mergeable state)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agged = mem.toDF().toDF("ts", "uid")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(approx_count_distinct(col("uid")).as("u"))
    val q = agged.writeStream.format("memory").queryName("hll_stream")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:00:05"), 1L), (ts("2024-01-01 00:00:10"), 2L),
        (ts("2024-01-01 00:00:20"), 1L)) // dup uid within the window
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:05:00"), 9L)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("hll_stream").select("u").collect().map(_.getLong(0))
      assert(rows.toSeq === Seq(2L)) // exact at this cardinality
    } finally q.stop()
  }

  test("percentile_approx runs as a windowed streaming aggregate (sketch is mergeable state)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agged = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(percentile_approx(col("v"), lit(0.5), lit(10000)).as("p50"))
    val q = agged.writeStream.format("memory").queryName("pct_stream")
      .outputMode("append").start()
    try {
      mem.addData((1 to 9).map(i =>
        (ts(f"2024-01-01 00:00:${i * 5}%02d"), i.toDouble)): _*)
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:05:00"), 99.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("pct_stream").select("p50").collect().map(_.getDouble(0))
      assert(rows.toSeq === Seq(5.0)) // exact median at this cardinality
    } finally q.stop()
  }

  test("distinct-count state merges as an HLL sketch column (the E57 non-algebraic escape hatch)") {
    // exact distinct does NOT merge (distinct(base) + distinct(delta) !=
    // distinct(base ∪ delta)); a Datasketches HLL column does — this is
    // the sketch-as-state pattern mergeAggState's scaladoc prescribes for
    // non-algebraic metrics in an incremental metric store.
    import graft.operators.CdcOps
    val all = (1 to 400).map(i => (i % 3L, (i * 7) % 57L)) // dup users across halves
    val (base, delta) = all.splitAt(200)
    def sketchAgg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("k")).agg(expr("hll_sketch_agg(u)").as("uniq_sketch"))
    val merged = CdcOps.mergeAggState(
        sketchAgg(base.toDF("k", "u")), sketchAgg(delta.toDF("k", "u")),
        Seq("k"), Seq(("uniq_sketch", (n: String) => expr(s"hll_union_agg($n)"))))
      .select(col("k"), expr("hll_sketch_estimate(uniq_sketch)").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = all.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).distinct.size.toLong }
    // HLL is exact at this cardinality (sparse mode); the merge law holds
    assert(merged === exact)
  }

  test("funnel: greedy earliest traversal, strictly-after semantics, ties by id") {
    val df = Seq(
      // user 1: full funnel in order
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:01:00", 2L, "click"),
      (1L, "2024-01-01 00:02:00", 3L, "purchase"),
      // user 2: click BEFORE first view never counts; the later click does
      (2L, "2024-01-01 00:00:00", 4L, "click"),
      (2L, "2024-01-01 00:01:00", 5L, "view"),
      (2L, "2024-01-01 00:02:00", 6L, "click"),
      // user 3: purchase before click -> stalls at stage 1
      (3L, "2024-01-01 00:00:00", 7L, "view"),
      (3L, "2024-01-01 00:00:30", 8L, "purchase"),
      // user 4: same-ts tie — click with LOWER id than the view sorts
      // first and is skipped; the id-9 view starts the funnel, so the
      // id-8-tied click is gone and stage stays 1
      (4L, "2024-01-01 00:00:00", 8L, "click"),
      (4L, "2024-01-01 00:00:00", 9L, "view"),
      // user 5: only non-step events -> absent from output
      (5L, "2024-01-01 00:00:00", 10L, "error")
    ).toDF("uid", "t", "id", "ev").withColumn("t", to_timestamp(col("t")))
    val out = AnalyticsOps.funnel(df, col("uid"), col("t"), col("id"),
        col("ev"), Seq("view", "click", "purchase"))
      .select(col("user_id"), col("stage"), size(col("step_ts")).as("n_ts"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 3, 3), (2L, 2, 2), (3L, 1, 1), (4L, 1, 1)))
  }

  test("funnel: step_ts carries the reaching events' timestamps in order") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:00:10", 2L, "view"),  // later view ignored
      (1L, "2024-01-01 00:00:20", 3L, "click")
    ).toDF("uid", "t", "id", "ev").withColumn("t", to_timestamp(col("t")))
    val r = AnalyticsOps.funnel(df, col("uid"), col("t"), col("id"),
        col("ev"), Seq("view", "click", "purchase"))
      .select(col("step_ts")).collect().head.getSeq[Timestamp](0)
    assert(r === Seq(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:20")))
  }

  test("eventTransitions: consecutive pairs per user, ties by id, firsts excluded") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (1L, "2024-01-01 00:01:00", 2L, "b"),
      (1L, "2024-01-01 00:02:00", 3L, "a"),
      // user 2: same-ts tie ordered by id => a(4) then b(5)
      (2L, "2024-01-01 00:00:00", 4L, "a"),
      (2L, "2024-01-01 00:00:00", 5L, "b"),
      (3L, "2024-01-01 00:00:00", 6L, "c")   // single event: no transition
    ).toDF("uid", "t", "id", "ev").withColumn("t", to_timestamp(col("t")))
    val got = AnalyticsOps.eventTransitions(df, col("uid"), col("t"),
        col("id"), col("ev"))
      .orderBy("prev_event", "event").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("retentionCohorts: hand-checked hour cohorts and offsets") {
    val df = Seq(
      // user 1: cohort hour 00, active hours 00, 02 (two events in 02
      // collapse to one user-bucket)
      (1L, "2024-01-01 00:10:00"), (1L, "2024-01-01 02:05:00"),
      (1L, "2024-01-01 02:55:00"),
      // user 2: cohort hour 02, active hour 02 only
      (2L, "2024-01-01 02:30:00")
    ).toDF("uid", "t").withColumn("t", to_timestamp(col("t")))
    val out = AnalyticsOps.retentionCohorts(df, col("uid"), col("t"), "hour", 3600L)
      .orderBy("cohort_ts", "offset_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val h0 = ts("2024-01-01 00:00:00").getTime / 1000
    val h2 = ts("2024-01-01 02:00:00").getTime / 1000
    assert(out.toSeq === Seq((h0, 0L, 1L), (h0, 2L, 1L), (h2, 0L, 1L)))
  }

  test("partition checksum diff: added/removed/changed/same statuses") {
    val old = Seq(("p1", 1L, "a"), ("p1", 2L, "b"), ("p2", 3L, "c"),
      ("p3", 4L, "d")).toDF("pk", "id", "v")
    val neu = Seq(("p1", 1L, "a"), ("p1", 2L, "b"),      // p1 identical
      ("p2", 3L, "CHANGED"),                             // p2 content change
      ("p4", 9L, "x")                                    // p3 gone, p4 new
    ).toDF("pk", "id", "v")
    def ck(df: org.apache.spark.sql.DataFrame) =
      AnalyticsOps.partitionChecksum(df, col("pk"), Seq(col("id"), col("v")))
    val got = AnalyticsOps.diffPartitionChecksums(ck(old), ck(neu))
      .orderBy("part_key").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("p1", "same"), ("p2", "changed"),
      ("p3", "removed"), ("p4", "added")))
  }

  test("partition checksum: order-independent within a partition") {
    val a = Seq(("p", 1L, "x"), ("p", 2L, "y")).toDF("pk", "id", "v")
    val b = Seq(("p", 2L, "y"), ("p", 1L, "x")).toDF("pk", "id", "v")
    def ck(df: org.apache.spark.sql.DataFrame) =
      AnalyticsOps.partitionChecksum(df.repartition(3), col("pk"),
        Seq(col("id"), col("v")))
    assert(AnalyticsOps.diffPartitionChecksums(ck(a), ck(b))
      .collect().map(_.getString(1)).toSeq === Seq("same"))
  }

  test("decayedAgg: hand-checked half-life weights, null values, order independence") {
    val anchor = 1000000L
    val hl = 100L
    val rows = Seq(
      ("a", anchor, Some(10.0)),        // age 0: weight 1
      ("a", anchor - 100L, Some(10.0)), // one half-life: weight 0.5
      ("a", anchor - 200L, None),       // two half-lives, null value
      ("b", anchor - 300L, Some(8.0))   // weight 1/8
    )
    def frame(r: Seq[(String, Long, Option[Double])]) =
      r.toDF("k", "t", "value").withColumn("ts", timestamp_seconds(col("t")))
    val got = AnalyticsOps.decayedAgg(frame(rows), Seq(col("k")),
        col("ts"), col("value"), halfLifeSeconds = hl,
        anchorEpochSeconds = anchor)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // a: counts 1 + 0.5 + 0.25 (null value still weighs in the count),
    //    sum 10 + 5; b: count 0.125, sum 1
    assert(got.toSeq === Seq(("a", 3L, 1.75, 15.0), ("b", 1L, 0.125, 1.0)))
    // exact-long quantization => bitwise identical under any partitioning
    val shuffled = AnalyticsOps.decayedAgg(frame(rows).repartition(7),
        Seq(col("k")), col("ts"), col("value"), hl, anchor)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(shuffled.toSeq === got.toSeq)
  }

  test("distributionDrift: hand-checked buckets, eps clamp, zero drift on identical sides") {
    val eps = 1e-6
    val ref = Seq(1.0, 1.0, 2.0).toDF("v")
    val cur = Seq(2.0, 3.0).toDF("v")
    val got = AnalyticsOps.distributionDrift(ref, cur, col("v"),
        edges = Seq(2.0, 3.0), eps = eps)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // buckets: 0 = (-inf,2) holds ref {1,1}; 1 = [2,3) holds ref {2} and
    // cur {2}; 2 = [3,inf) holds cur {3}; one-sided buckets clamp at eps
    def terms(pr: Double, pc: Double) =
      ((pc - pr) * math.log(pc / pr), pc * math.log(pc / pr))
    val exp = Seq(
      (0, 2L, 0L, 2.0 / 3, eps), (1, 1L, 1L, 1.0 / 3, 0.5),
      (2, 0L, 1L, eps, 0.5))
    assert(got.length === 3)
    got.zip(exp).foreach { case ((b, nr, nc, pr, pc, psi, kl),
                                 (eb, enr, enc, epr, epc)) =>
      val (epsi, ekl) = terms(epr, epc)
      assert((b, nr, nc) === ((eb, enr, enc)))
      assert(math.abs(pr - epr) < 1e-12 && math.abs(pc - epc) < 1e-12)
      assert(math.abs(psi - epsi) < 1e-12, s"bucket $b psi")
      assert(math.abs(kl - ekl) < 1e-12, s"bucket $b kl")
    }
    // identical sides: every divergence term is exactly ln(1) = 0
    val zero = AnalyticsOps.distributionDrift(ref, ref, col("v"),
        edges = Seq(2.0, 3.0)).collect()
    assert(zero.nonEmpty)
    zero.foreach { r =>
      assert(r.getDouble(5) === 0.0 && r.getDouble(6) === 0.0)
    }
  }

  // non-ASCII fixtures via escapes so the test source stays ASCII-clean
  private val Bel = "\u0007"
  private val MojEacute = "\u00c3\u00a9"            // mojibake of e-acute
  private val Eacute = "\u00e9"
  private val MojRquote = "\u00e2\u20ac\u2122"     // mojibake right quote
  private val MojRdquote = "\u00e2\u20ac\u009d"     // mojibake right double quote
  private val Rdquote = "\u201d"

  test("madOutliers: hand fixture \u2014 lower medians, MAD, flags") {
    // key a: values 1,2,3,4,100 \u2192 med = 3 (lower median of 5), |v-med| =
    // 2,1,0,1,97 \u2192 mad = 1, outliers: |v-3| > 3*1 \u2192 only 100.
    // key b: values 10,20 (even n) \u2192 lower median = 10, |v-med| = 0,10 \u2192
    // mad = 0 \u2192 any v != med is an outlier \u2192 20 flagged.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0), ("b", 10.0), ("b", 20.0)).toDF("k", "v")
    val got = AnalyticsOps.madOutliers(df, Seq("k"), col("v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === Seq(("a", 5L, 3.0, 1.0, 1L), ("b", 2L, 10.0, 0.0, 1L)))
  }

  test("madOutliers: nulls excluded; exact medians resist the outlier") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(1.0)),
      ("a", Some(1e9))).toDF("k", "v")
    val r = AnalyticsOps.madOutliers(df, Seq("k"), col("v")).collect().head
    assert(r.getLong(1) === 3L)       // null dropped
    assert(r.getDouble(2) === 1.0)    // median unmoved by 1e9
    assert(r.getDouble(3) === 0.0)
    assert(r.getLong(4) === 1L)       // only 1e9 flagged
  }

  test("coOccurrence: pair counts, supports, lift; mega-basket dropped") {
    // baskets: 1 -> {x,y,z}, 2 -> {x,y}, 3 -> {x}, 4 -> mega (dropped)
    val rows = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"),
      (2L, "x"), // dup (basket,item) \u2014 distinct'd away
      (3L, "x")) ++ (1 to 5).map(i => (4L, s"m$i"))
    val df = rows.toDF("b", "i")
    val got = AnalyticsOps.coOccurrence(df, col("b"), col("i"),
        minPairCount = 2L, maxBasketSize = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // kept baskets B = 3; only (x,y) reaches 2 pairs; n_x = 3, n_y = 2
    // lift = (2 * 3) / (3 * 2) = 1.0
    assert(got.toSeq === Seq(("x", "y", 2L, 3L, 2L, 1.0)))
  }

  test("coOccurrence checkpoint placement: DISK_ONLY at or below 16 GiB " +
      "heap, serialized memory-first above (both measured regimes)") {
    import org.apache.spark.storage.StorageLevel
    val gib = 1024L * 1024 * 1024
    // the 8 g envelope regime (r16 A/B: ser OOMs, DISK_ONLY 42.8 s)
    assert(AnalyticsOps.cooccurCheckpointLevel(8 * gib) === StorageLevel.DISK_ONLY)
    assert(AnalyticsOps.cooccurCheckpointLevel(16 * gib) === StorageLevel.DISK_ONLY)
    // the sf100/64 g regime (r16: DISK_ONLY died 3/3 on disk budget;
    // the serialized pin is the r15-proven path)
    assert(AnalyticsOps.cooccurCheckpointLevel(17 * gib) ===
      StorageLevel.MEMORY_AND_DISK_SER)
    assert(AnalyticsOps.cooccurCheckpointLevel(64 * gib) ===
      StorageLevel.MEMORY_AND_DISK_SER)
  }

  test("executorHeapBytes: local mode reads this JVM's heap (driver == " +
      "executor there); the cluster branch parses spark.executor.memory") {
    // in local mode the checkpoint blocks live in THIS JVM, and local mode
    // ignores spark.executor.memory — Runtime.maxMemory is the only honest
    // signal (the r16 heuristic, now scoped to where it is true)
    assert(spark.sparkContext.master.startsWith("local"))
    assert(AnalyticsOps.executorHeapBytes(spark) ===
      Runtime.getRuntime.maxMemory)
    // the size-string parse the cluster branch feeds to the threshold
    // (spark.executor.memory is a Spark size string, default 1g)
    import org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    assert(byteStringAsBytes("8g") === 8L * 1024 * 1024 * 1024)
    assert(byteStringAsBytes("16384m") === 16L * 1024 * 1024 * 1024)
  }

  test("coOccurrence: deterministic across input partitionings") {
    val rows = (1L to 40L).flatMap(b =>
      (0 to (b % 5).toInt).map(k => (b, s"i${(b + k) % 7}")))
    val a = AnalyticsOps.coOccurrence(rows.toDF("b", "i").repartition(1),
      col("b"), col("i")).orderBy("item_a", "item_b").collect().toSeq
    val c = AnalyticsOps.coOccurrence(rows.toDF("b", "i").repartition(7),
      col("b"), col("i")).orderBy("item_a", "item_b").collect().toSeq
    assert(a === c && a.nonEmpty)
  }

  test("coOccurrence pins its items checkpoint SERIALIZED (the b55 8g " +
      "memory-envelope fix)") {
    // the deserialized default starved the pair-count partial aggregate
    // of execution memory at sf10 under the default 8g driver
    // (AGGREGATE_OUT_OF_MEMORY); the serialized pin is load-bearing, so
    // a storage-level regression must fail loudly, not resurface as an
    // OOM two decades out
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val rows = (1L to 20L).flatMap(b => Seq((b, "x"), (b, s"i${b % 3}")))
    AnalyticsOps.coOccurrence(rows.toDF("b", "i"), col("b"), col("i"))
      .collect()
    val fresh = sc.getPersistentRDDs.filterKeys(!before.contains(_)).values
    assert(fresh.nonEmpty, "coOccurrence left no checkpoint block")
    assert(fresh.forall { r =>
      val lvl = r.getStorageLevel
      lvl.useDisk && !lvl.deserialized
    }, s"items checkpoint not MEMORY_AND_DISK_SER: " +
      fresh.map(_.getStorageLevel).mkString(","))
    fresh.foreach(_.unpersist(false))
  }

  test("windowedTopK: per-window ranks, count ties break by key") {
    val rows = Seq(
      // window [0, 60): a x3, b x2, c x2, d x1 -> a, b, c (tie b<c)
      (0L, "a"), (1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"),
      (5L, "c"), (6L, "c"), (7L, "d"),
      // window [60, 120): d x2, a x1 -> d, a
      (60L, "d"), (61L, "d"), (62L, "a")
    ).toDF("sec", "k").withColumn("ts", timestamp_seconds(col("sec")))
    val got = AnalyticsOps.windowedTopK(rows, "ts", "1 minute", col("k"), 3)
      .orderBy("w_start", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 1, "a", 3L), (0L, 2, "b", 2L), (0L, 3, "c", 2L),
      (60L, 1, "d", 2L), (60L, 2, "a", 1L)))
  }

  test("lastTouchAttribution: window credit, organic conversions, same-ts tie by id") {
    val rows = Seq(
      (1L, 0L, 1L, "click"),     // touch
      (2L, 5L, 1L, "view"),      // later touch -> credited
      (3L, 10L, 1L, "purchase"), // within lookback 7 of view@5
      (4L, 99L, 1L, "error"),    // not a touch type
      (5L, 100L, 1L, "purchase"),// nothing within lookback -> organic
      (6L, 200L, 2L, "click"),   // same-ts touch, smaller id: in frame
      (7L, 200L, 2L, "purchase"),
      (8L, 300L, 3L, "purchase") // user with no touches at all
    ).toDF("event_id", "sec", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = AnalyticsOps.lastTouchAttribution(rows, "ts", "user_id",
        "event_type", "event_id", "purchase", Seq("click", "view"),
        lookbackSec = 7L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(5))))
    assert(got.toSeq === Seq(
      (3L, Some(2L), Some("view")),
      (5L, None, None),
      (7L, Some(6L), Some("click")),
      (8L, None, None)))
  }

  test("hllSketches: merge of any shard split equals the one-pass build; small sets exact") {
    // small cardinalities sit in the sketch's exact (list/set) mode
    val small = (0L until 300L).map(i => (s"k${i % 3}", i % 40)).toDF("k", "v")
    val smallEst = AnalyticsOps.hllEstimates(
        AnalyticsOps.hllSketches(small, Seq(col("k")), col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = small.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(smallEst === exact)
    // big enough to leave exact mode: estimates are approximate but the
    // merge law below must still hold EXACTLY (set semantics)
    val df = (0L until 3000L).map(i => (s"k${i % 3}", i % 700)).toDF("k", "v")
    val whole = AnalyticsOps.hllEstimates(
        AnalyticsOps.hllSketches(df, Seq(col("k")), col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approxOk = whole.forall { case (k, est) => math.abs(est - 700L) <= 35L }
    assert(approxOk, s"estimates off: $whole")
    // merge law: estimates of a shard-merge are within the sketch error
    // of the truth (HIP vs composite estimator: merged and one-pass can
    // differ slightly past exact mode — both must stay in bounds) and
    // merge ORDER is irrelevant
    val shards = Seq(
      df.filter(col("v") % 3 === 0), df.filter(col("v") % 3 === 1),
      df.filter(col("v") % 3 === 2))
      .map(s => AnalyticsOps.hllSketches(s, Seq(col("k")), col("v"))
        .localCheckpoint(true))
    val merged = AnalyticsOps.hllEstimates(
        AnalyticsOps.hllMergeSketches(Seq("k"), shards: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.forall { case (_, est) => math.abs(est - 700L) <= 35L },
      s"merged estimates off: $merged")
    val mergedRev = AnalyticsOps.hllEstimates(
        AnalyticsOps.hllMergeSketches(Seq("k"), shards.reverse: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedRev.forall { case (_, est) => math.abs(est - 700L) <= 35L },
      s"reverse-merge estimates off: $mergedRev")
  }

  test("kllSketches: exact below compaction, shard-merge exact, bounded above") {
    // inclusive-rank reference on fully-retained sketches
    def ref(sorted: Seq[Double], q: Double): Double =
      if (q <= 0.0) sorted.head
      else sorted(math.ceil(q * sorted.size).toInt - 1)
    val vals = (0 until 100).map(_.toDouble)
    val df = vals.map(v => ("a", v)).toDF("k", "v")
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val onePass = AnalyticsOps.kllQuantiles(
        AnalyticsOps.kllSketches(df, Seq(col("k")), col("v")), qs)
      .collect()(0).getSeq[Double](1)
    assert(onePass === qs.map(q => ref(vals, q)))
    // shard merge below the compaction threshold: exact and identical
    val shards = Seq(df.filter(col("v") < 50), df.filter(col("v") >= 50))
      .map(s => AnalyticsOps.kllSketches(s, Seq(col("k")), col("v"))
        .localCheckpoint(true))
    val merged = AnalyticsOps.kllQuantiles(
        AnalyticsOps.kllMergeSketches(Seq("k"), shards: _*), qs)
      .collect()(0).getSeq[Double](1)
    assert(merged === onePass)
    // past compaction: median within the published rank-error bound
    val big = (0 until 50000).map(_.toDouble).map(v => ("a", v)).toDF("k", "v")
    val med = AnalyticsOps.kllQuantiles(
        AnalyticsOps.kllSketches(big, Seq(col("k")), col("v")), Seq(0.5))
      .collect()(0).getSeq[Double](1).head
    assert(med > 50000 * 0.47 && med < 50000 * 0.53, s"median off: $med")
    // merging k=1000 shards through a matching-k buffer stays EXACT even
    // past k=200's capacity (the default buffer would silently cap to
    // 200 and randomize — the reviewed merge-k bug)
    val wide = (0 until 600).map(_.toDouble)
    val wideShards = Seq(wide.take(300), wide.drop(300)).map(part =>
      AnalyticsOps.kllSketches(part.map(v => ("a", v)).toDF("k", "v"),
        Seq(col("k")), col("v"), k = 1000).localCheckpoint(true))
    val wideMerged = AnalyticsOps.kllQuantiles(
        AnalyticsOps.kllMergeSketchesK(Seq("k"), 1000, wideShards: _*), qs)
      .collect()(0).getSeq[Double](1)
    assert(wideMerged === qs.map(q => ref(wide, q)))
    // the DEFAULT-k merge over those k=1000 shards must fail LOUDLY, not
    // silently degrade to k=200 accuracy (smallest-k-wins): the merge
    // aggregate reads each input's k from its header
    val ex = intercept[Exception] {
      AnalyticsOps.kllMergeSketches(Seq("k"), wideShards: _*).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("silently degrade"))),
      s"expected the loud k-mismatch failure, got: ${ex.getMessage}")
  }

  test("logisticScores matches the driver-side micro-grid GD reference") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = Seq(
      (0L, 1, 3.0, 0.0), (1L, 1, 2.0, 1.0), (2L, 0, 0.0, 3.0),
      (3L, 0, 1.0, 2.0), (4L, 1, 4.0, 1.0), (5L, 0, 0.0, 4.0))
    val df = rows.toDF("id", "y", "a", "b")
    val rounds = 5; val lrPpm = 200000L
    // reference: same micro quantization (HALF_UP away from zero, the
    // Spark round), same floor-div update, same left-to-right z
    def roundMicro(v: Double): Long =
      new JBD(v).setScale(0, RoundingMode.HALF_UP).longValue
    def floorDiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b; if (a % b != 0 && (a < 0) != (b < 0)) q - 1 else q
    }
    var w = Array(0L, 0L, 0L)
    def p(x1: Double, x2: Double): Double = {
      val z = w(0).toDouble / 1e6 + w(1).toDouble / 1e6 * x1 +
        w(2).toDouble / 1e6 * x2
      1.0 / (1.0 + math.exp(-z))
    }
    for (_ <- 0 until rounds) {
      val g = Array.fill(3)(BigInt(0))
      rows.foreach { case (_, y, x1, x2) =>
        val pr = p(x1, x2)
        g(0) += BigInt(roundMicro((pr - y) * 1.0 * 1e6))
        g(1) += BigInt(roundMicro((pr - y) * x1 * 1e6))
        g(2) += BigInt(roundMicro((pr - y) * x2 * 1e6))
      }
      w = w.zipWithIndex.map { case (wm, i) =>
        wm - floorDiv(BigInt(lrPpm) * g(i), BigInt(rows.size) * BigInt(1000000L)).toLong }
    }
    val want = rows.map { case (id, y, x1, x2) =>
      val pm = roundMicro(p(x1, x2) * 1e6)
      (id, y, pm, if (pm >= 500000L) 1 else 0) }.toSet
    val got = AnalyticsOps.logisticScores(df, col("id"),
        Seq(col("a"), col("b")), col("y"), rounds, lrPpm)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(got === want)
    // the fixture is separable on a - b; trained preds recover the labels
    assert(got.forall { case (_, y, _, pred) => pred == y })
  }
}
