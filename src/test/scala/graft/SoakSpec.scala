package graft

import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.gen.EventGen
import graft.streaming.{StreamJob, StreamJobConfig}

/** Bounded wall-clock soak of the reference's operating mode: all 14
  * streaming queries running CONCURRENTLY for minutes (not micro-batch
  * assertions — StreamJobSpec covers those), fed by EventGen's realtime
  * clock through a spooling file source (one JSON file batch per
  * simulated day, the per-day slices GenSpec proves ≡ the timewarp batch
  * rendering). Sampled every few seconds per query: state-store rows,
  * watermark, per-trigger duration. Asserts at the end:
  *
  *  - every query is still alive (no StreamingQueryException),
  *  - every query kept making progress (batches advanced),
  *  - event-time watermarks advanced with the simulated clock,
  *  - NO UNBOUNDED STATE GROWTH: per query, the max state-row count over
  *    the last quarter of samples must not exceed 1.3× the max over the
  *    middle half (+64 rows slack) — with a 45 s watermark and a
  *    day-per-second simulated clock, every windowed aggregate must
  *    evict old windows as fast as new ones open. (The documented A12
  *    caveat — running totals over an UNBOUNDED key space need the TTL
  *    escape hatch — does not bite here: the generators' key space is
  *    the fixed city set, which is exactly why the plateau must hold.)
  *  - trigger durations must not degrade: median over the last third
  *    ≤ 5× median over the first third (a leak that slips past the
  *    state-row check — e.g. file-source backlog — shows up here).
  *
  * EXCLUDED from the default suite (it sleeps for real wall time):
  * cancels unless GRAFT_SOAK_SECONDS is set. The r13 SCALING entry
  * records a 600 s run:
  *   GRAFT_SOAK_SECONDS=600 sbt "testOnly graft.SoakSpec"
  */
class SoakSpec extends SparkSpec {

  test("14 concurrent streaming queries soak without state growth or " +
      "trigger degradation") {
    assume(sys.env.contains("GRAFT_SOAK_SECONDS"),
      "soak is opt-in: GRAFT_SOAK_SECONDS=600 sbt 'testOnly graft.SoakSpec'")
    val soakSec = sys.env("GRAFT_SOAK_SECONDS").toInt
    val dir = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val pushes = new java.util.concurrent.atomic.AtomicLong(0L)
    val job = new StreamJob(spark,
      StreamJobConfig(trigger = Some("2 seconds"),
        checkpointRoot = s"$dir/chk", debugStream = false),
      _ => pushes.incrementAndGet())

    val cityDim = EventGen.cities(spark, 20).localCheckpoint(true)
    val clock = new EventGen.RealtimeClock("2024-01-01", timewarp = 86400.0)

    def emitDay(d: java.time.LocalDate): Unit = {
      val day = d.toString
      Seq(
        "weather" -> EventGen.weather(spark, cityDim, day, 1),
        "flight" -> EventGen.flights(spark, cityDim, day, 1),
        "booking" -> EventGen.bookings(spark, cityDim, day, 1)
      ).foreach { case (name, events) =>
        EventGen.toKafkaFrame(events).coalesce(1)
          .write.mode("append").json(s"$dir/$name")
      }
    }
    emitDay(clock.poll(0.0).get) // dirs must exist before the sources start

    val frameSchema = "key STRING, value STRING, kafka_ts TIMESTAMP"
    def src(name: String) =
      spark.readStream.schema(frameSchema).json(s"$dir/$name")
    val plans = job.plans(src("weather"), src("flight"), src("booking"))
    val queries = plans.toSeq.sortBy(_._1).map { case (name, (df, mode, fn)) =>
      name -> job.startQuery(df, name, mode, fn)
    }
    info(s"${queries.size} queries started; soaking ${soakSec}s at 1 sim day/s")

    // (wallSec, name, batchId, stateRows, triggerMs, watermark)
    val samples = mutable.Buffer[(Long, String, Long, Long, Long, String)]()
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    try {
      var lastSample = 0.0
      while (elapsed < soakSec) {
        clock.poll(elapsed).foreach(emitDay)
        if (elapsed - lastSample >= 5.0) {
          lastSample = elapsed
          queries.foreach { case (name, q) =>
            val p = q.lastProgress
            if (p != null) {
              val stateRows = p.stateOperators.map(_.numRowsTotal).sum
              val trigMs = Option(p.durationMs.get("triggerExecution"))
                .map(_.longValue).getOrElse(0L)
              val wm = Option(p.eventTime.get("watermark")).getOrElse("")
              samples += ((elapsed.toLong, name, p.batchId, stateRows,
                trigMs, wm))
            }
          }
        }
        Thread.sleep(250)
      }

      // liveness: no query died, every query kept batching
      queries.foreach { case (name, q) =>
        assert(q.exception.isEmpty, s"$name died: ${q.exception}")
        assert(q.isActive, s"$name stopped early")
      }
      val byName = samples.groupBy(_._2)
      queries.foreach { case (name, _) =>
        val s = byName.getOrElse(name, mutable.Buffer.empty)
        assert(s.nonEmpty, s"$name produced no progress samples")
        val batches = s.map(_._3)
        assert(batches.last > batches.head,
          s"$name stalled: batch ${batches.head} -> ${batches.last}")
      }
      // watermarks advanced with the simulated clock (event-time queries)
      val wmAdvanced = byName.values.count { s =>
        val wms = s.map(_._6).filter(_.nonEmpty)
        wms.size >= 2 && wms.last > wms.head
      }
      info(s"watermark advanced on $wmAdvanced/${byName.size} queries")
      assert(wmAdvanced >= 1, "no query's event-time watermark ever advanced")

      // the headline assertion: state plateaus. Quarters by SAMPLE INDEX
      // (every query is sampled on the same ticks, so index ≈ wall time).
      val report = mutable.Buffer[String]()
      byName.toSeq.sortBy(_._1).foreach { case (name, s) =>
        val rows = s.map(_._4)
        val n = rows.size
        if (n >= 8 && rows.max > 0) {
          val mid = rows.slice(n / 4, 3 * n / 4).max
          val last = rows.drop(3 * n / 4).max
          report += f"$name%-22s state mid=$mid last=$last " +
            f"trig_ms_med=${median(s.map(_._5))}"
          assert(last <= 1.3 * mid + 64,
            s"$name state grew past the plateau: mid-half max $mid, " +
              s"last-quarter max $last over ${soakSec}s")
        }
      }
      report.foreach(r => info(r))
      // trigger-duration degradation
      byName.toSeq.sortBy(_._1).foreach { case (name, s) =>
        val t = s.map(_._5).filter(_ > 0)
        if (t.size >= 9) {
          val first = median(t.take(t.size / 3))
          val lastT = median(t.drop(2 * t.size / 3))
          assert(lastT <= 5 * first + 500,
            s"$name trigger duration degraded: median ${first}ms -> ${lastT}ms")
        }
      }
      val days = samples.map(_._6).filter(_.nonEmpty).distinct.size
      info(s"pushes=${pushes.get()} samples=${samples.size} " +
        s"distinct_watermarks=$days")
      assert(pushes.get() > 0, "no metrics were ever pushed")
    } finally queries.foreach(_._2.stop())
  }

  /** The 100 TB streaming-state story's OTHER half (VERDICT r13 task 5):
    * the first soak proves the fixed-city key space plateaus on the
    * default HDFS-backed (heap) store; this one exercises the two
    * documented escape hatches for key spaces that DON'T stay fixed —
    * the RocksDB state-store backend (GraftSession's `stateStore` knob,
    * state off-heap on local disk) and the A12 TTL hatch
    * ([[graft.operators.StreamOps.runningTotalsTtl]]). The generator
    * emits a GROWING key space (fresh user ids every simulated day, plus
    * a handful of stable keys), and two running-totals queries consume
    * the same stream concurrently on RocksDB:
    *
    *  - WITH the TTL hatch (48 h event-time TTL at 1 sim day/s): state
    *    must PLATEAU — eviction keeps only the keys active within the
    *    TTL horizon, so boundedness comes from the TTL, not key-space
    *    luck (the inverse of the first soak's premise);
    *  - WITHOUT it (the reference's keep-everything semantics): state
    *    must GROW monotonically with the day count — asserting the
    *    growth proves the fixture actually generates an unbounded key
    *    space (a plateau here would mean the TTL assertion is vacuous).
    *
    * Both queries must run on the RocksDB provider for real (asserted on
    * the progress customMetrics, not the conf). Opt-in like the main
    * soak: GRAFT_SOAK_ROCKSDB_SECONDS=240 sbt "testOnly graft.SoakSpec". */
  test("RocksDB soak: TTL bounds an unbounded key space; no-TTL control grows") {
    assume(sys.env.contains("GRAFT_SOAK_ROCKSDB_SECONDS"),
      "opt-in: GRAFT_SOAK_ROCKSDB_SECONDS=240 sbt 'testOnly graft.SoakSpec'")
    val soakSec = sys.env("GRAFT_SOAK_ROCKSDB_SECONDS").toInt
    val dir = java.nio.file.Files.createTempDirectory("graft_soak_rdb").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, GraftSession.RocksDbProvider)
    val clock = new EventGen.RealtimeClock("2024-01-01", timewarp = 86400.0)
    val newKeysPerDay = 120

    def emitDay(d: java.time.LocalDate): Unit = {
      import spark.implicits._
      val day = d.toString
      val fresh = (0 until newKeysPerDay).map(i => (s"u_${day}_$i", 10.0,
        java.sql.Timestamp.valueOf(s"$day 12:00:00")))
      val stable = (0 until 5).map(i => (s"stable_$i", 1.0,
        java.sql.Timestamp.valueOf(s"$day 12:00:00")))
      (fresh ++ stable).toDF("user_id", "spend", "ts").coalesce(1)
        .write.mode("append").json(s"$dir/events")
    }
    emitDay(clock.poll(0.0).get)

    val schema = "user_id STRING, spend DOUBLE, ts TIMESTAMP"
    def src() = spark.readStream.schema(schema).json(s"$dir/events")
    import graft.operators.StreamOps
    val ttlQ = StreamOps.runningTotalsTtl(
        src().withWatermark("ts", "45 seconds"),
        "user_id", "spend", "ts", ttl = "48 hours")
      .writeStream.queryName("rdb_ttl_totals").format("noop")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/chk_ttl").start()
    val rawQ = StreamOps.runningTotals(src(),
        Seq(col("user_id")), col("spend"))
      .writeStream.queryName("rdb_raw_totals").format("noop")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/chk_raw").start()
    val queries = Seq("ttl" -> ttlQ, "raw" -> rawQ)

    val samples = mutable.Buffer[(String, Long)]() // (name, stateRows)
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    try {
      var lastSample = 0.0
      var sawRocksDb = false
      while (elapsed < soakSec) {
        clock.poll(elapsed).foreach(emitDay)
        if (elapsed - lastSample >= 5.0) {
          lastSample = elapsed
          queries.foreach { case (name, q) =>
            val p = q.lastProgress
            if (p != null && p.stateOperators.nonEmpty) {
              samples += ((name, p.stateOperators.map(_.numRowsTotal).sum))
              if (p.stateOperators.exists(_.customMetrics.keySet.toArray
                  .exists(_.toString.toLowerCase.contains("rocksdb"))))
                sawRocksDb = true
            }
          }
        }
        Thread.sleep(250)
      }
      queries.foreach { case (name, q) =>
        assert(q.exception.isEmpty, s"$name died: ${q.exception}")
        assert(q.isActive, s"$name stopped early")
      }
      assert(sawRocksDb,
        "no rocksdb* custom metric ever appeared — queries did not run on " +
          "the RocksDB state store")
      val byName = samples.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val ttlRows = byName.getOrElse("ttl", mutable.Buffer.empty)
      val rawRows = byName.getOrElse("raw", mutable.Buffer.empty)
      assert(ttlRows.size >= 8 && rawRows.size >= 8,
        s"too few samples: ttl=${ttlRows.size} raw=${rawRows.size}")
      info(s"ttl state curve: ${ttlRows.mkString(",")}")
      info(s"raw state curve: ${rawRows.mkString(",")}")
      // TTL: plateau (same rule as the main soak)
      val n = ttlRows.size
      val mid = ttlRows.slice(n / 4, 3 * n / 4).max
      val last = ttlRows.drop(3 * n / 4).max
      assert(last <= 1.3 * mid + 64,
        s"TTL state grew past the plateau: mid-half max $mid, " +
          s"last-quarter max $last over ${soakSec}s")
      // control: the key space really is unbounded — state must grow
      val firstQ = rawRows.take(math.max(rawRows.size / 4, 1)).max
      val lastQ = rawRows.drop(3 * rawRows.size / 4).max
      assert(lastQ >= 2 * firstQ,
        s"no-TTL control failed to grow ($firstQ -> $lastQ): the " +
          "unbounded-key fixture is broken, the TTL plateau proves nothing")
    } finally {
      queries.foreach(_._2.stop())
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  private def median(xs: collection.Seq[Long]): Long = {
    val s = xs.sorted
    if (s.isEmpty) 0L else s(s.size / 2)
  }
}
