package graft

import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.StreamOps
import graft.streaming.ChangeSuppress

/** True Structured-Streaming semantics: watermark + late-data drop and the
  * timestamp-repair rules, via MemoryStream (no broker needed).
  * Reference semantics: kafka_to_metrics.py:181-188 (repair), :204-214
  * (45s watermark), SURVEY.md §7.4.3-7.4.4. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed count drops events later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("event_time", "city_id")
      .withWatermark("event_time", "45 seconds")
      .groupBy(window($"event_time", "1 minute"), $"city_id")
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // batch 1: two on-time events at 10:00, plus one at 10:05 that pushes
      // the watermark to 10:04:15 once processed
      mem.addData((ts("2024-01-01 10:00:10"), "A"), (ts("2024-01-01 10:00:20"), "A"),
        (ts("2024-01-01 10:05:00"), "B"))
      q.processAllAvailable()
      // batch 2: a late event for the (closed) 10:00 window -> must be dropped
      mem.addData((ts("2024-01-01 10:00:30"), "A"))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to close and emit all windows
      mem.addData((ts("2024-01-01 10:30:00"), "C"))
      q.processAllAvailable()
      val out = spark.table("wm_out")
        .select(date_format($"window.start", "HH:mm").as("w"), $"city_id", $"cnt")
        .as[(String, String, Long)].collect().toSet
      assert(out.contains(("10:00", "A", 2L)), s"late event must not bump the count: $out")
      assert(!out.contains(("10:00", "A", 3L)))
    } finally q.stop()
  }

  test("repairTimestamps in a streaming plan: null event_ts falls back to kafka_ts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val parsed = StreamOps.repairTimestamps(
      mem.toDF().toDF("event_ts", "ingest_ts", "kafka_ts"))
    val q = parsed.writeStream.outputMode("append")
      .format("memory").queryName("rep_out").start()
    try {
      mem.addData(
        (null, "2024-01-01 10:00:05", ts("2024-01-01 10:00:00")),          // null event_ts
        ("2024-01-01 09:59:00", "2024-01-01 09:59:30", ts("2024-01-01 10:00:00"))) // ingest < kafka
      q.processAllAvailable()
      val rows = spark.table("rep_out")
        .select($"event_time".cast("string"), $"ingest_time".cast("string"))
        .as[(String, String)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "2024-01-01 10:00:05"),
        ("2024-01-01 09:59:00", "2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("streamDedup: duplicate keys across batches within the watermark emit once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val deduped = StreamOps.streamDedup(
      mem.toDF().toDF("ts", "k").withWatermark("ts", "1 minute"), Seq("k"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData((ts("2024-01-01 10:00:00"), "A"), (ts("2024-01-01 10:00:01"), "A"))
      q.processAllAvailable()
      // same key again in a later batch, still inside the watermark window
      mem.addData((ts("2024-01-01 10:00:30"), "A"), (ts("2024-01-01 10:00:31"), "B"))
      q.processAllAvailable()
      val ks = spark.table("dedup_out").select("k").as[String].collect().toSeq
      assert(ks.sorted == Seq("A", "B"), s"dup 'A' must be dropped across batches: $ks")
    } finally q.stop()
  }

  test("jsonFiles source: JSONL directory -> Kafka frame shape -> parse round trip") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    java.nio.file.Files.writeString(dir.resolve("part1.jsonl"),
      """{"city_id":"A","t_min":10.0,"t_max":20.0}
        |{"city_id":"B","t_min":5.0,"t_max":12.0}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "city_id STRING, t_min DOUBLE, t_max DOUBLE")
    val src = graft.sources.EventSources.jsonFiles(spark, dir.toString, schema,
      keyExpr = "city_id", tsExpr = "timestamp'2024-01-01 00:00:00'")
    val parsed = StreamOps.parseJson(src, schema)
    val q = parsed.writeStream.outputMode("append")
      .format("memory").queryName("jsonl_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      val rows = spark.table("jsonl_out")
        .select("key", "city_id", "t_max").as[(String, String, Double)]
        .collect().toSet
      assert(rows == Set(("A", "A", 20.0), ("B", "B", 12.0)))
    } finally q.stop()
  }

  test("runningTotalsTtl: idle key state evicts past the TTL, totals restart") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val agg = StreamOps.runningTotalsTtl(
      mem.toDF().toDF("ts", "user_id", "spend").withWatermark("ts", "0 seconds"),
      "user_id", "spend", "ts", ttl = "10 minutes")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("ttl_out").start()
    try {
      // batch 1: both keys live; watermark after the batch = 10:00
      mem.addData((ts("2024-01-01 10:00:00"), 1L, 10.0),
        (ts("2024-01-01 10:00:00"), 2L, 5.0))
      q.processAllAvailable()
      // batch 2: only key 1; watermark -> 10:30, key 2's timeout (10:00+10m)
      // is now in the past and fires on the next batch
      mem.addData((ts("2024-01-01 10:30:00"), 1L, 1.0))
      q.processAllAvailable()
      // batch 3: key 2 returns after eviction -> totals restart from zero
      mem.addData((ts("2024-01-01 10:40:00"), 2L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("ttl_out").as[(Long, Long, Double)].collect()
      // key 1 accumulated across batches (never idle past TTL)
      assert(rows.filter(_._1 == 1L).map(_._2).max == 2L)
      // key 2's last emission is a fresh (1, 2.0), not (2, 7.0)
      val k2 = rows.filter(_._1 == 2L)
      assert(k2.map(_._2).max == 1L, s"key 2 state must have been evicted: ${k2.toSeq}")
      assert(k2.map(_._3).max == 5.0) // 5.0 from batch 1, then restart at 2.0
    } finally q.stop()
  }

  test("A12 running totals on the RocksDB state store: spill-capable large state") {
    // SURVEY §7.4.2: the un-watermarked A12 agg holds one state row per key
    // FOREVER; the default HDFS-backed store keeps all of it on-heap, so at
    // 100x key cardinality the provider knob — not a code change — is the
    // production fix. This drives the same operator through RocksDB over a
    // key domain big enough to mean something and checks (a) totals stay
    // exact across micro-batches, (b) the query really ran on RocksDB
    // (provider-specific metrics present).
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      GraftSession.RocksDbProvider)
    try {
      val mem = MemoryStream[(Long, Double)]
      val agg = StreamOps.runningTotals(mem.toDF().toDF("user_id", "spend"),
        Seq($"user_id"), $"spend")
      val q = agg.writeStream.outputMode("update")
        .format("memory").queryName("rocks_out").start()
      try {
        val keys = 0L until 20000L
        mem.addData(keys.map(k => (k, 1.0)))
        q.processAllAvailable()
        mem.addData(keys.filter(_ % 2 == 0).map(k => (k, 2.0)))
        q.processAllAvailable()
        val rows = spark.table("rocks_out")
          .as[(Long, Long, Double)].collect()
        // update mode re-emits a key's row per updating batch: the final
        // (max-arrivals) row per key carries the running total
        val finalByKey = rows.groupBy(_._1).map { case (k, v) =>
          k -> v.maxBy(_._2) }
        assert(finalByKey.size === 20000)
        assert(finalByKey(0L) === ((0L, 2L, 3.0)))
        assert(finalByKey(1L) === ((1L, 1L, 1.0)))
        assert(finalByKey(19998L) === ((19998L, 2L, 3.0)))
        assert(finalByKey(19999L) === ((19999L, 1L, 1.0)))
        // the state operator reports RocksDB-specific custom metrics iff
        // the RocksDB provider actually backed the query
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
          s"no rocksdb metrics — provider not engaged: ${metrics.keySet}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("runningTotalsTtl: batch mode degrades to plain per-key totals") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 10.0),
      (ts("2024-01-01 11:00:00"), 1L, 5.0),
      (ts("2024-01-01 12:00:00"), 2L, 1.0)).toDF("ts", "user_id", "spend")
    val out = StreamOps.runningTotalsTtl(df, "user_id", "spend", "ts", "10 minutes")
      .orderBy("user_id").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 15.0), (2L, 1L, 1.0)))
  }

  test("streamIntervalJoin: two live streams pair within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val bookings = MemoryStream[(Timestamp, String, Double)]
    val weather = MemoryStream[(Timestamp, String, Double)]
    val joined = StreamOps.streamIntervalJoin(
      bookings.toDF().toDF("b_ts", "city", "spend").withWatermark("b_ts", "0 seconds"),
      weather.toDF().toDF("w_ts", "w_city", "temp").withWatermark("w_ts", "0 seconds"),
      keys = Seq("city" -> "w_city"), leftTs = "b_ts", rightTs = "w_ts",
      within = "10 minutes")
    val q = joined.select("city", "spend", "temp")
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      weather.addData((ts("2024-01-01 10:00:00"), "roma", 18.0),
        (ts("2024-01-01 09:00:00"), "roma", 11.0)) // outside the 10m bound
      bookings.addData((ts("2024-01-01 10:05:00"), "roma", 120.0),
        (ts("2024-01-01 10:05:00"), "milano", 80.0)) // no weather for milano
      q.processAllAvailable()
      val rows = spark.table("ssj_out").as[(String, Double, Double)].collect().toSet
      assert(rows === Set(("roma", 120.0, 18.0)))
    } finally q.stop()
  }

  test("runningTotalsTtl: string keys keep their identity (no long-cast collapse)") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "roma", 10.0),
      (ts("2024-01-01 11:00:00"), "roma", 5.0),
      (ts("2024-01-01 12:00:00"), "milano", 1.0)).toDF("ts", "city_id", "spend")
    val out = StreamOps.runningTotalsTtl(df, "city_id", "spend", "ts", "10 minutes")
    assert(out.schema("city_id").dataType.typeName === "string")
    val rows = out.orderBy("city_id").as[(String, Long, Double)].collect().toSeq
    assert(rows == Seq(("milano", 1L, 1.0), ("roma", 2L, 15.0)))
  }

  test("update-mode running totals over a stream (A12, unbounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val agg = StreamOps.runningTotals(mem.toDF().toDF("city_id", "spend"),
      Seq($"city_id"), $"spend")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("tot_out").start()
    try {
      mem.addData(("A", 10.0), ("A", 5.0), ("B", 1.0))
      q.processAllAvailable()
      mem.addData(("A", 1.0))
      q.processAllAvailable()
      // update mode re-emits the changed key; latest row per key wins
      val arr = spark.table("tot_out").as[(String, Long, Double)].collect()
      assert(arr.filter(_._1 == "A").map(_._2).max == 3L)
      assert(arr.filter(_._1 == "A").map(_._3).max == 16.0)
    } finally q.stop()
  }

  test("ChangeSuppress: one-row state suppresses repeats across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ChangeSuppress.Event]
    val suppressed = ChangeSuppress.suppress(
      mem.toDS().withWatermark("ts", "10 seconds").as[ChangeSuppress.Event])
    val q = suppressed.writeStream.outputMode("append")
      .format("memory").queryName("chsup_out").start()
    try {
      // batch 1: key 1 flips on/on/off -> emit on(10:00:00), off(10:00:20)
      mem.addData(
        ChangeSuppress.Event(1L, ts("2024-01-01 10:00:00"), "on"),
        ChangeSuppress.Event(1L, ts("2024-01-01 10:00:10"), "on"),
        ChangeSuppress.Event(1L, ts("2024-01-01 10:00:20"), "off"))
      q.processAllAvailable()
      // batch 2: "off" repeats from batch-1 STATE -> suppressed; then "on"
      mem.addData(
        ChangeSuppress.Event(1L, ts("2024-01-01 10:01:00"), "off"),
        ChangeSuppress.Event(1L, ts("2024-01-01 10:01:30"), "on"),
        ChangeSuppress.Event(2L, ts("2024-01-01 10:01:00"), "on"))
      q.processAllAvailable()
      val out = spark.table("chsup_out").as[ChangeSuppress.Event].collect()
        .map(e => (e.key, e.ts.toString.substring(11, 19), e.value)).toSet
      assert(out === Set(
        (1L, "10:00:00", "on"), (1L, "10:00:20", "off"),
        (1L, "10:01:30", "on"), (2L, "10:01:00", "on")))
    } finally q.stop()
  }

  test("ChangeSuppress: evicted key re-emits as a first observation after the TTL") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ChangeSuppress.Event]
    val suppressed = ChangeSuppress.suppress(
      mem.toDS().withWatermark("ts", "1 second").as[ChangeSuppress.Event],
      ttlMillis = 60 * 1000L)
    val q = suppressed.writeStream.outputMode("append")
      .format("memory").queryName("chsup_ttl_out").start()
    try {
      mem.addData(ChangeSuppress.Event(1L, ts("2024-01-01 10:00:00"), "on"))
      q.processAllAvailable()
      // push the watermark far past key 1's (ts + ttl) so its state times out
      mem.addData(ChangeSuppress.Event(9L, ts("2024-01-01 11:00:00"), "x"))
      q.processAllAvailable()
      mem.addData(ChangeSuppress.Event(9L, ts("2024-01-01 11:00:05"), "x"))
      q.processAllAvailable() // timeout fires in the batch after the advance
      // same value "on" again — state was evicted, so it emits as first-seen
      mem.addData(ChangeSuppress.Event(1L, ts("2024-01-01 11:00:10"), "on"))
      q.processAllAvailable()
      val key1 = spark.table("chsup_ttl_out").as[ChangeSuppress.Event]
        .collect().filter(_.key == 1L).map(_.ts.toString.substring(11, 19)).toSet
      assert(key1 === Set("10:00:00", "11:00:10"),
        s"evicted key must re-emit its unchanged value: $key1")
    } finally q.stop()
  }

  test("sessionize merges sessions across micro-batches and emits on watermark close") {
    import graft.operators.TemporalOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sessions = TemporalOps.sessionize(
      mem.toDF().toDF("ts", "user").withWatermark("ts", "10 seconds"),
      "ts", "5 minutes", Seq($"user"), Seq(count(lit(1)).as("n_events")))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 1: two events 2 min apart — one open session for u1
      mem.addData((ts("2024-01-01 10:00:00"), "u1"), (ts("2024-01-01 10:02:00"), "u1"))
      q.processAllAvailable()
      // batch 2: a third event inside the gap must MERGE into that session
      // (state-store session merge across micro-batches), even arriving in
      // a later batch
      mem.addData((ts("2024-01-01 10:04:00"), "u1"))
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty) // watermark hasn't closed it
      // batch 3: push the watermark past 10:09 + gap -> session emits once
      mem.addData((ts("2024-01-01 10:30:00"), "u2"))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .select(date_format($"session_window.start", "HH:mm:ss").as("s"),
          date_format($"session_window.end", "HH:mm:ss").as("e"),
          $"user", $"n_events")
        .as[(String, String, String, Long)].collect().toSet
      // one merged 3-event session spanning [first, last + gap)
      assert(out === Set(("10:00:00", "10:09:00", "u1", 3L)), s"got $out")
    } finally q.stop()
  }

  test("DecayedCounter: incremental half-life state matches the batch aggregate") {
    import graft.streaming.DecayedCounter
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DecayedCounter.Event]
    val counted = DecayedCounter.count(
      mem.toDS().withWatermark("ts", "10 seconds").as[DecayedCounter.Event],
      halfLifeSeconds = 60L)
    val q = counted.writeStream.outputMode("update")
      .format("memory").queryName("decay_out").start()
    try {
      mem.addData(DecayedCounter.Event(1L, ts("2024-01-01 10:00:00"), 10.0))
      q.processAllAvailable()
      // one half-life later: key 1's held sum halves before the new event
      // folds in; key 2 starts fresh in a later micro-batch
      mem.addData(
        DecayedCounter.Event(1L, ts("2024-01-01 10:01:00"), 10.0),
        DecayedCounter.Event(2L, ts("2024-01-01 10:01:00"), 4.0))
      q.processAllAvailable()
      val latest = spark.table("decay_out").as[DecayedCounter.Counter]
        .collect().groupBy(_.key).map { case (k, rs) =>
          k -> rs.maxBy(_.asOf.getTime) }
      assert(math.abs(latest(1L).decayed_sum - 15.0) < 1e-6, s"$latest")
      assert(math.abs(latest(1L).decayed_count - 1.5) < 1e-6)
      assert(math.abs(latest(2L).decayed_sum - 4.0) < 1e-6)
      // batch-twin agreement: decayedAgg anchored at the key's clock sees
      // the same weights (per-step quantization allows ~1e-6 per event)
      val batch = graft.operators.AnalyticsOps.decayedAgg(
        Seq((1L, ts("2024-01-01 10:00:00"), 10.0),
            (1L, ts("2024-01-01 10:01:00"), 10.0)).toDF("key", "ts", "value"),
        Seq(col("key")), col("ts"), col("value"), halfLifeSeconds = 60L,
        anchorEpochSeconds = ts("2024-01-01 10:01:00").getTime / 1000L)
        .collect().head
      assert(math.abs(batch.getDouble(3) - latest(1L).decayed_sum) < 1e-5)
    } finally q.stop()
  }

  test("StreamingFunnel: out-of-order arrival yields the batch fold's stages") {
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.StepEvent
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StepEvent]
    // watermark delay must cover the arrival disorder: batch 2 delivers an
    // event 10 s older than batch 1's newest, so a 5 s delay would drop it
    val staged = StreamingFunnel.funnelStages(
      mem.toDS().withWatermark("ts", "1 minute").as[StepEvent],
      quietMillis = 30 * 1000L)
    val q = staged.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      // user 1's step-1 event (step index 1) arrives a BATCH BEFORE its
      // step-0 event; a fold-on-arrival would miss the funnel entirely.
      // user 2 stalls at stage 1 (step 2 precedes step 1 in event time).
      mem.addData(
        StepEvent(1L, ts("2024-01-01 10:00:10"), 2L, 1),
        StepEvent(2L, ts("2024-01-01 10:00:00"), 3L, 0))
      q.processAllAvailable()
      mem.addData(
        StepEvent(1L, ts("2024-01-01 10:00:00"), 1L, 0),
        StepEvent(1L, ts("2024-01-01 10:00:20"), 4L, 2),
        StepEvent(2L, ts("2024-01-01 10:00:05"), 5L, 2))
      q.processAllAvailable()
      // advance the watermark far past (newest event + quiet horizon) so
      // both users' buffers time out and emit
      mem.addData(StepEvent(9L, ts("2024-01-01 11:00:00"), 9L, 0))
      q.processAllAvailable()
      mem.addData(StepEvent(9L, ts("2024-01-01 11:00:05"), 10L, 0))
      q.processAllAvailable() // timeout fires the batch after the advance
      val out = spark.table("funnel_out").as[StreamingFunnel.FunnelResult]
        .collect().map(r => r.user -> r.stage).toMap
      assert(out.get(1L) === Some(3)) // full funnel despite arrival order
      assert(out.get(2L) === Some(1)) // event-time order stalls at 1
    } finally q.stop()
  }

  test("skewReport as a foreachBatch monitor: merged per-batch counts equal the batch report") {
    import graft.operators.AnalyticsOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    // per-trigger partial (key, cnt) tables merge additively — the monitor
    // state is key-sized, never the stream history
    var state = Seq.empty[(Long, Long)].toDF("key", "cnt")
    val q = mem.toDF().toDF("key").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = batch.groupBy($"key").agg(count(lit(1)).as("cnt"))
        state = state.union(partial).groupBy($"key")
          .agg(sum($"cnt").as("cnt")).localCheckpoint(true)
      }.start()
    try {
      // skewed key 7 split ACROSS batches — a per-batch-only report would
      // undercount it; the merged state must not
      mem.addData(Seq(7L, 7L, 7L, 1L, 2L): _*)
      q.processAllAvailable()
      mem.addData(Seq(7L, 7L, 3L, 3L, 2L): _*)
      q.processAllAvailable()
      val streamed = AnalyticsOps.skewReportFromCounts(state, topN = 3)
        .collect().map(_.toString).toSeq
      val batch = AnalyticsOps.skewReport(
        Seq(7L, 7L, 7L, 1L, 2L, 7L, 7L, 3L, 3L, 2L).toDF("key"), $"key", topN = 3)
        .collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batch)
    } finally q.stop()
  }

  test("distributionDrift as a foreachBatch monitor: merged bucket counts equal the batch report") {
    import graft.operators.AnalyticsOps
    implicit val sqlCtx = spark.sqlContext
    val edges = Seq(10.0, 20.0)
    val ref = Seq(5.0, 15.0, 15.0, 25.0).toDF("v")
    // ref buckets are fixed once; only the cur side streams
    val refCounts = ref.groupBy(AnalyticsOps.driftBucket($"v", edges).as("bucket"))
      .agg(count(lit(1)).as("n_ref")).localCheckpoint(true)
    val mem = MemoryStream[Double]
    var curCounts = Seq.empty[(Int, Long)].toDF("bucket", "n_cur")
    val q = mem.toDF().toDF("v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = batch.filter($"v".isNotNull)
          .groupBy(AnalyticsOps.driftBucket($"v", edges).as("bucket"))
          .agg(count(lit(1)).as("n_cur"))
        curCounts = curCounts.union(partial).groupBy($"bucket")
          .agg(sum($"n_cur").as("n_cur")).localCheckpoint(true)
      }.start()
    try {
      mem.addData(5.0, 25.0, 25.0)
      q.processAllAvailable()
      mem.addData(25.0, 15.0)
      q.processAllAvailable()
      val merged = refCounts.join(curCounts, Seq("bucket"), "full")
        .select($"bucket", coalesce($"n_ref", lit(0L)).as("n_ref"),
          coalesce($"n_cur", lit(0L)).as("n_cur"))
      val streamed = AnalyticsOps.driftFromBucketCounts(merged)
        .orderBy("bucket").collect().map(_.toString).toSeq
      val batch = AnalyticsOps.distributionDrift(ref,
          Seq(5.0, 25.0, 25.0, 25.0, 15.0).toDF("v"), $"v", edges)
        .orderBy("bucket").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batch)
    } finally q.stop()
  }

  test("substringDupStats as a foreachBatch monitor: merged window counts equal the batch stats") {
    import graft.operators.DedupOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // monitor state: additive (key, doc_id, n_occ) partials + the doc-id
    // registry (re-admits short docs) — both key/doc-sized, never the
    // corpus history
    var counts = Seq.empty[(Long, Long, Long)].toDF("key", "doc_id", "n_occ")
    var docIds = Seq.empty[Long].toDF("doc_id")
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = DedupOps.substringWindowCounts(batch, $"doc_id",
          $"text", window = 10, stride = 5)
        counts = counts.union(partial).groupBy($"key", $"doc_id")
          .agg(sum($"n_occ").as("n_occ")).localCheckpoint(true)
        docIds = docIds.union(batch.select($"doc_id")).distinct()
          .localCheckpoint(true)
      }.start()
    try {
      // the shared 20-char span is SPLIT across batches: doc 11 arrives a
      // batch after doc 10, so a per-batch-only report would never see the
      // cross-doc duplication; the merged state must
      val span = "ABCDEFGHIJKLMNOPQRST"
      mem.addData((10L, span + "uvwxyz0123"), (13L, "short"))
      q.processAllAvailable()
      mem.addData((11L, span), (12L, "zyxwvutsrqponmlkjihgfedcba"))
      q.processAllAvailable()
      val streamed = DedupOps.substringDupStatsFromCounts(counts, docIds)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val batchAll = DedupOps.substringDupStats(
          Seq((10L, span + "uvwxyz0123"), (13L, "short"), (11L, span),
            (12L, "zyxwvutsrqponmlkjihgfedcba")).toDF("doc_id", "text"),
          $"doc_id", $"text", window = 10, stride = 5)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batchAll)
    } finally q.stop()
  }

  test("crossSubstringContam as a foreachBatch monitor: static bench keys vs merged corpus partials") {
    // E94's streaming-monitor split: the benchmark key set is computed ONCE
    // (static artifact), each trigger merges its corpus window partials into
    // additive state, and the report re-joins state against the bench keys.
    import graft.operators.DedupOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val span = "ABCDEFGHIJKLMNOPQRST" // lives in the benchmark
    val bench = Seq((1L, "xx" + span + "yy")).toDF("bench_id", "text")
    val benchKeys = DedupOps.benchKeySet(bench, $"text", window = 10)
      .localCheckpoint(true)
    var counts = Seq.empty[(Long, Long, Long)].toDF("key", "doc_id", "n_occ")
    var docIds = Seq.empty[Long].toDF("doc_id")
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = DedupOps.substringWindowCounts(batch, $"doc_id",
          $"text", window = 10, stride = 5)
        counts = counts.union(partial).groupBy($"key", $"doc_id")
          .agg(sum($"n_occ").as("n_occ")).localCheckpoint(true)
        docIds = docIds.union(batch.select($"doc_id")).distinct()
          .localCheckpoint(true)
      }.start()
    try {
      // doc 20 copies the span at an ODD alignment (stride-1 bench keys
      // must still catch it); doc 21 is clean; doc 22 is sub-window short
      val docs = Seq((20L, "z" + span + "0123456789"),
        (21L, "qrstuvwxyzqrstuvwxyz"), (22L, "tiny"))
      mem.addData(docs(0))
      q.processAllAvailable()
      mem.addData(docs(1), docs(2))
      q.processAllAvailable()
      val streamed = DedupOps.crossSubstringContamFromCounts(
          counts, docIds, benchKeys)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val batchAll = DedupOps.crossSubstringContam(
          docs.toDF("doc_id", "text"), $"doc_id", $"text",
          bench, $"text", window = 10, stride = 5)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batchAll)
      // and the signal is real: the copying doc is contaminated, the
      // clean doc is not, the short doc re-admits with zeros
      val byDoc = DedupOps.crossSubstringContamFromCounts(
          counts, docIds, benchKeys)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(byDoc(20L) > 0L, s"misaligned copy missed: $byDoc")
      assert(byDoc(21L) === 0L && byDoc(22L) === 0L)
    } finally q.stop()
  }

  test("image dedup as incremental ingestion: per-trigger sketches vs the static corpus sketch table") {
    // the E123 pattern for pixels: the corpus's aHash table is the
    // persisted artifact; each trigger hashes only its new images and
    // cross-chunk-joins against it. Union over triggers == one batch run.
    import graft.operators.{DedupOps, Multimodal}
    implicit val sqlCtx = spark.sqlContext
    // corpus = variant-0 images of groups 0..2; new shards = later variants
    val corpus = Multimodal.demoBmpCorpus(
      Seq(0L, 4L, 8L).toDF("doc_id"), $"doc_id")
    val corpSketch = Multimodal.imageHashes(corpus, $"doc_id", $"payload")
      .localCheckpoint(true)
    val newIds = Seq(1L, 2L, 5L, 9L) // variants of groups 0, 0, 1, 2
    val mem = MemoryStream[Long]
    var streamed = Seq.empty[(Long, Long)]
    val q = mem.toDF().toDF("doc_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val imgs = Multimodal.demoBmpCorpus(batch, $"doc_id")
        streamed = streamed ++ DedupOps.simhashPairsCross(
            Multimodal.imageHashes(imgs, $"doc_id", $"payload"),
            corpSketch, maxHamming = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }.start()
    try {
      mem.addData(newIds(0), newIds(1))
      q.processAllAvailable()
      mem.addData(newIds(2), newIds(3))
      q.processAllAvailable()
      val batchAll = DedupOps.simhashPairsCross(
          Multimodal.imageHashes(
            Multimodal.demoBmpCorpus(newIds.toDF("doc_id"), $"doc_id"),
            $"doc_id", $"payload"),
          corpSketch, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.toSet === batchAll.toSet)
      // the adjacent variants land on their group's corpus anchor; no
      // cross-group pair exists
      assert(streamed.toSet.contains((1L, 0L)) &&
        streamed.toSet.contains((5L, 4L)) && streamed.toSet.contains((9L, 8L)),
        s"planted anchors missed: $streamed")
      assert(streamed.forall { case (a, b) => a / 4 == b / 4 })
    } finally q.stop()
  }

  test("cross-corpus dedup as incremental ingestion: per-trigger pairs union to the batch result") {
    // the retrieval-side incremental story, driven the way E85 claims it
    // deploys: the corpus bucket + hashed-shingle tables are built ONCE
    // (the persisted artifact) and each trigger hashes/signs/buckets only
    // its OWN docs before joining the standing tables — the corpus never
    // rescans; results append with no cross-trigger state beyond the
    // output itself. The union over triggers must equal one batch run.
    import graft.operators.DedupOps
    implicit val sqlCtx = spark.sqlContext
    val corpusDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight"),
      (102L, "red orange yellow green blue indigo violet white"))
      .toDF("doc_id", "text")
    val corpSh = DedupOps.shingleSets(corpusDocs, $"doc_id", $"text", 3)
      .localCheckpoint(true)
    // the artifact: computed once, pinned across triggers (at scale:
    // written tables)
    val (corpHashed, corpBuckets) = DedupOps.corpusDedupArtifact(corpSh)
    val pinnedBuckets = corpBuckets.localCheckpoint(true)
    val newDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),   // dup of 100
      (2L, "completely different text with no overlap at all"),
      (3L, "one two three four five six seven eight"),          // dup of 101
      (4L, "red orange yellow green blue indigo violet white")) // dup of 102
    val mem = MemoryStream[(Long, String)]
    var streamed = Seq.empty[(Long, Long)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val nh = DedupOps.hashedShingleSets(
          DedupOps.shingleSets(batch, $"doc_id", $"text", 3))
        streamed = streamed ++ DedupOps
          .crossNearDupPairsFromArtifact(nh, corpHashed, pinnedBuckets, 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }.start()
    try {
      mem.addData(newDocs(0), newDocs(1))
      q.processAllAvailable()
      mem.addData(newDocs(2), newDocs(3))
      q.processAllAvailable()
      val batchAll = DedupOps.crossNearDupPairs(
          DedupOps.shingleSets(newDocs.toDF("doc_id", "text"),
            $"doc_id", $"text", 3),
          corpSh, 0.8, release = false)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.toSet === batchAll.toSet)
      assert(streamed.toSet === Set((1L, 100L), (3L, 101L), (4L, 102L)))
    } finally q.stop()
  }

  test("cross-corpus embedding dedup as incremental ingestion: per-trigger sketches vs the static corpus artifact") {
    // the E123 claim driven end-to-end: the corpus (vectors, sketch
    // table) artifact is built once; each micro-batch prepares and
    // sketches only its own vectors (same hash-derived planes), joins
    // the standing sketch table, and verifies cosine against the
    // standing vectors. Union over triggers ≡ batch
    // crossEmbeddingNearDupPairs, and pairs stay CROSS-side only (the
    // internal dup inside the new stream is never emitted).
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    def vec(seed: Int): Array[Double] = Array.tabulate(16) { d =>
      ((graft.functions.Hashing.hash60Scalar(s"sinc_${seed}_$d") % 2001) - 1000) / 1000.0
    }
    val corpus = Seq((100L, vec(1)), (101L, vec(2)), (102L, vec(3)))
      .toDF("vec_id", "embedding")
    val (corpVecs, corpSketch) =
      SimilarityOps.corpusEmbeddingArtifact(corpus, dim = 16)
    // new side: dups of corpus 100/101/102, one stranger, and an INTERNAL
    // dup pair (1, 5 both = vec(1)) split across triggers
    val newVecs = Seq((1L, vec(1)), (2L, vec(9)), (3L, vec(2)),
      (4L, vec(3)), (5L, vec(1)))
    val mem = MemoryStream[Long]
    var streamed = Seq.empty[(Long, Long)]
    val q = mem.toDF().toDF("vec_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val shard = batch.join(newVecs.toDF("vec_id", "embedding"), "vec_id")
        streamed = streamed ++ SimilarityOps
          .crossEmbeddingNearDupPairsFromArtifact(shard, corpVecs,
            corpSketch, threshold = 0.95, maxHamming = 3, dim = 16)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }.start()
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      mem.addData(3L, 4L, 5L)
      q.processAllAvailable()
      val batchAll = SimilarityOps.crossEmbeddingNearDupPairs(
          newVecs.toDF("vec_id", "embedding"), corpus,
          threshold = 0.95, maxHamming = 3, dim = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.toSet === batchAll.toSet)
      // exact copies land on their corpus anchors; the stranger pairs with
      // nothing; the internal (1, 5) dup is NOT emitted (cross-side only)
      assert(streamed.toSet === Set((1L, 100L), (3L, 101L), (4L, 102L),
        (5L, 100L)), s"got $streamed")
    } finally q.stop()
  }

  test("coOccurrence as a foreachBatch monitor: merged pair counts equal the batch report") {
    import graft.operators.AnalyticsOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // additive state: (item_a, item_b, n_ab) pairs, (item, n_i) supports,
    // and the basket count — baskets arrive WHOLE per trigger
    var pairs = Seq.empty[(String, String, Long)].toDF("item_a", "item_b", "n_ab")
    var itemCounts = Seq.empty[(String, Long)].toDF("item", "n_i")
    var nBaskets = 0L
    val q = mem.toDF().toDF("basket", "item").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = batch.select($"basket", $"item").distinct()
        pairs = pairs.union(AnalyticsOps.coOccurrencePairCounts(kept))
          .groupBy($"item_a", $"item_b").agg(sum($"n_ab").as("n_ab"))
          .localCheckpoint(true)
        itemCounts = itemCounts
          .union(kept.groupBy($"item").agg(count(lit(1)).as("n_i")))
          .groupBy($"item").agg(sum($"n_i").as("n_i")).localCheckpoint(true)
        nBaskets += kept.select($"basket").distinct().count()
      }.start()
    try {
      mem.addData((1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"))
      q.processAllAvailable()
      mem.addData((3L, "x"), (3L, "y"), (4L, "z"), (4L, "x"))
      q.processAllAvailable()
      val streamed = AnalyticsOps.coOccurrenceFromCounts(pairs, itemCounts,
          nBaskets, minPairCount = 1L)
        .orderBy("item_a", "item_b").collect().map(_.toString).toSeq
      val batchAll = AnalyticsOps.coOccurrence(
          Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"),
            (3L, "x"), (3L, "y"), (4L, "z"), (4L, "x")).toDF("basket", "item"),
          $"basket", $"item", minPairCount = 1L)
        .orderBy("item_a", "item_b").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batchAll)
    } finally q.stop()
  }

  test("hll sketches as a foreachBatch monitor: per-trigger unions equal the batch estimates") {
    import graft.operators.AnalyticsOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    // monitor state: the sketch TABLE — per-trigger sketches fold in by
    // hll_union_agg; re-delivered values are absorbed (set semantics),
    // and history is never rescanned
    var state: org.apache.spark.sql.DataFrame = null
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = AnalyticsOps.hllSketches(batch, Seq($"k"), $"v")
        state = (if (state == null) part
          else AnalyticsOps.hllMergeSketches(Seq("k"), state, part))
          .localCheckpoint(true)
      }.start()
    try {
      mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      mem.addData(("a", 2L), ("a", 3L), ("b", 10L), ("b", 11L))
      q.processAllAvailable()
      val streamed = AnalyticsOps.hllEstimates(state)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchAll = AnalyticsOps.hllEstimates(AnalyticsOps.hllSketches(
          Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("b", 10L),
            ("b", 10L), ("b", 11L)).toDF("k", "v"),
          Seq($"k"), $"v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === Map("a" -> 3L, "b" -> 2L) && streamed === batchAll)
    } finally q.stop()
  }

  test("windowedTopK as a streaming monitor: watermarked window counts + foreachBatch rank equal the batch ranks") {
    // the E118 streaming story: the (window, key) COUNTS are the
    // engine-managed watermark state (a plain streaming agg in update
    // mode); the rank is a per-trigger foreachBatch pass over the
    // count table — additive merge by (window, key), rank recomputed
    import graft.operators.AnalyticsOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    var counts = Seq.empty[(Long, String, Long)].toDF("w_start", "key", "n")
    val q = mem.toDF().toDF("sec", "k")
      .withColumn("ts", timestamp_seconds($"sec"))
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute"), $"k")
      .count()
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = batch.select(
          unix_timestamp($"window.start").as("w_start"),
          $"k".as("key"), $"count".as("n"))
        // update-mode rows REPLACE the (window, key) state, not add to it
        counts = counts.join(part.select($"w_start", $"key"),
            Seq("w_start", "key"), "left_anti")
          .unionByName(part).localCheckpoint(true)
      }.start()
    try {
      mem.addData((0L, "a"), (1L, "a"), (2L, "b"), (62L, "d"))
      q.processAllAvailable()
      mem.addData((3L, "a"), (5L, "c"), (6L, "c"), (61L, "d"), (63L, "a"))
      q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"w_start").orderBy($"n".desc, $"key".asc)
      val streamed = counts.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 2).select("w_start", "rank", "key", "n")
        .orderBy("w_start", "rank").collect().map(_.toString).toSeq
      val batchAll = AnalyticsOps.windowedTopK(
          Seq((0L, "a"), (1L, "a"), (2L, "b"), (62L, "d"), (3L, "a"),
            (5L, "c"), (6L, "c"), (61L, "d"), (63L, "a")).toDF("sec", "k")
            .withColumn("ts", timestamp_seconds($"sec")),
          "ts", "1 minute", $"k", k = 2)
        .orderBy("w_start", "rank").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batchAll)
    } finally q.stop()
  }

  test("pointInTime as streaming fact enrichment: per-trigger lookups union to the batch result") {
    // the E116 streaming story: the SCD2 history is a static artifact
    // (rebuilt by the dimension pipeline, not by the fact stream); each
    // trigger enriches only its new facts — per-fact row semantics make
    // per-batch union trivially equal to the batch run
    import graft.operators.CdcOps
    implicit val sqlCtx = spark.sqlContext
    val hist = CdcOps.scd2History(
      Seq((1L, 1L, "U", "v1"), (1L, 5L, "U", "v2"), (1L, 9L, "D", "x"))
        .toDF("k", "seq", "op", "name"),
      Seq("k"), "seq", "op", Seq("name")).localCheckpoint(true)
    val mem = MemoryStream[(Long, Long, Long)]
    var outs = Seq.empty[String]
    val q = mem.toDF().toDF("fact_id", "k", "seq").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        outs = outs ++ CdcOps.pointInTime(batch, hist, Seq("k"), "seq",
          Seq("name")).collect().map(_.toString)
      }.start()
    try {
      mem.addData((10L, 1L, 0L), (11L, 1L, 1L))
      q.processAllAvailable()
      mem.addData((13L, 1L, 5L), (14L, 1L, 10L), (15L, 2L, 3L))
      q.processAllAvailable()
      val batchAll = CdcOps.pointInTime(
          Seq((10L, 1L, 0L), (11L, 1L, 1L), (13L, 1L, 5L), (14L, 1L, 10L),
            (15L, 2L, 3L)).toDF("fact_id", "k", "seq"),
          hist, Seq("k"), "seq", Seq("name"))
        .collect().map(_.toString)
      assert(outs.nonEmpty && outs.sorted.toSeq === batchAll.sorted.toSeq)
    } finally q.stop()
  }

  test("kll sketches as a foreachBatch monitor: per-trigger unions equal the batch quantiles") {
    import graft.operators.AnalyticsOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    var state: org.apache.spark.sql.DataFrame = null
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val part = AnalyticsOps.kllSketches(batch, Seq($"k"), $"v")
        state = (if (state == null) part
          else AnalyticsOps.kllMergeSketches(Seq("k"), state, part))
          .localCheckpoint(true)
      }.start()
    try {
      mem.addData((0 until 40).map(v => ("a", v.toDouble)): _*)
      q.processAllAvailable()
      mem.addData((40 until 80).map(v => ("a", v.toDouble)): _*)
      q.processAllAvailable()
      val qs = Seq(0.1, 0.5, 0.99)
      val streamed = AnalyticsOps.kllQuantiles(state, qs)
        .collect()(0).getSeq[Double](1)
      val batchAll = AnalyticsOps.kllQuantiles(AnalyticsOps.kllSketches(
          (0 until 80).map(v => ("a", v.toDouble)).toDF("k", "v"),
          Seq($"k"), $"v"), qs)
        .collect()(0).getSeq[Double](1)
      // 80 items < k = 200: exact mode, bit-identical across the split
      assert(streamed === batchAll && streamed === Seq(7.0, 39.0, 79.0))
    } finally q.stop()
  }

  test("sourceOverlap as a foreachBatch monitor: set-union key state equals the batch matrix") {
    import graft.operators.DedupOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    // monitor state: the distinct (key, src) SET — union + dropDuplicates
    // is idempotent, so re-delivered docs are absorbed (unlike the
    // additive-count monitors, where a replay would double-count)
    var keys = Seq.empty[(String, Long)].toDF("src", "key")
    val q = mem.toDF().toDF("src", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = DedupOps.sourceKeySet(batch, $"src", $"text", k = 3)
        keys = keys.union(partial).dropDuplicates("key", "src")
          .localCheckpoint(true)
      }.start()
    try {
      // source A's vocabulary arrives across two triggers; the second
      // trigger re-delivers A's first doc (idempotence) and introduces B
      mem.addData(("A", "one two three four"))
      q.processAllAvailable()
      mem.addData(("A", "one two three four"), ("A", "one two three"),
        ("B", "two three four five"), ("C", "alpha beta gamma delta"))
      q.processAllAvailable()
      val streamed = DedupOps.sourceOverlapFromKeys(keys)
        .orderBy("src_a", "src_b").collect().map(_.toString).toSeq
      val batchAll = DedupOps.sourceOverlap(
          Seq(("A", "one two three four"), ("A", "one two three"),
            ("B", "two three four five"), ("C", "alpha beta gamma delta"))
            .toDF("src", "text"),
          $"src", $"text", k = 3)
        .orderBy("src_a", "src_b").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batchAll)
    } finally q.stop()
  }

  test("containmentPairs as a foreachBatch monitor: df-prune re-runs over state") {
    import graft.operators.DedupOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    var keys = Seq.empty[(Long, Long)].toDF("doc_id", "key")
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = DedupOps.docKeySet(batch, $"doc_id", $"text", k = 3)
        keys = keys.union(partial).dropDuplicates("key", "doc_id")
          .localCheckpoint(true)
      }.start()
    try {
      // doc 1 is a subset of doc 2, which arrives a trigger later — a
      // per-batch-only report could never pair them; df counts (and any
      // maxDf prune) recompute over the merged state, not per batch
      mem.addData((1L, "one two three four five"))
      q.processAllAvailable()
      mem.addData((2L, "zero one two three four five six"),
        (3L, "alpha beta gamma delta"))
      q.processAllAvailable()
      val streamed = DedupOps.containmentFromKeys(keys,
          thresholdPpm = 600000L)
        .orderBy("doc_a", "doc_b").collect().map(_.toString).toSeq
      val batchAll = DedupOps.containmentPairs(
          Seq((1L, "one two three four five"),
            (2L, "zero one two three four five six"),
            (3L, "alpha beta gamma delta")).toDF("doc_id", "text"),
          $"doc_id", $"text", k = 3, thresholdPpm = 600000L)
        .orderBy("doc_a", "doc_b").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batchAll)
    } finally q.stop()
  }

  test("IVF-PQ index artifact: shard-stream appends are union-equal to a " +
      "full rebuild, and the served search matches") {
    // the E134 drive: the artifact is built once from a base corpus and
    // every arriving embedding shard encodes ONLY ITSELF (fixed codebooks)
    // and appends its (vec_id, sub, code, cell) rows; after two streamed
    // shards, the stored table must equal a from-scratch index of the
    // full corpus row-for-row, and a search served FROM the artifact
    // must equal the in-memory ivfPqTopK over everything.
    import graft.operators.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .localCheckpoint(true)
    val ivfCb = SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)
    val pqCb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val path = java.nio.file.Files
      .createTempDirectory("ivfpq_artifact_spec").toString
    // base corpus artifact: vec_id % 3 == 0
    SimilarityOps.ivfPqIndexWrite(
      SimilarityOps.ivfPqIndex(emb.filter($"vec_id" % 3 === 0), ivfCb, pqCb),
      ivfCb, pqCb, path)
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("vec_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val shard = emb.join(batch, "vec_id")
        SimilarityOps.ivfPqIndexWrite(
          SimilarityOps.ivfPqIndex(shard, ivfCb, pqCb), ivfCb, pqCb,
          path, append = true)
      }.start()
    try {
      val ids = emb.select($"vec_id").as[Long].collect()
      mem.addData(ids.filter(_ % 3 == 1).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(ids.filter(_ % 3 == 2).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val (index, icb, pcb) = SimilarityOps.ivfPqIndexRead(spark, path)
    // stored rows == full rebuild, row-for-row (the structural-union
    // contract: per-vector encode under frozen codebooks)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "sub", "code", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .toSet
    val rebuilt = SimilarityOps.ivfPqIndex(emb, ivfCb, pqCb)
    assert(rows(index) === rows(rebuilt))
    // the at-rest layout is the inverted list: one partition dir per cell
    val cellDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes table not partitioned by cell")
    // served search == in-memory search over the full corpus
    val queries = emb.filter($"vec_id" < 5)
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val served = SimilarityOps.ivfPqTopKFromIndex(index, queries, icb, pcb,
      topK = 5, nProbe = 4)
    val direct = SimilarityOps.ivfPqTopK(
      SimilarityOps.pqEncode(emb, pqCb),
      SimilarityOps.ivfAssign(emb, ivfCb).select("vec_id", "cell"),
      queries, ivfCb, pqCb, topK = 5, nProbe = 4)
    assert(topk(served) === topk(direct) && served.count() > 0)
  }
}
