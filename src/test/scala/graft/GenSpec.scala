package graft

import org.apache.spark.sql.functions._
import graft.gen.EventGen

/** §2C generator coverage: determinism (hash-keyed randomness is independent
  * of partitioning), reference-shaped distributions, Kafka-frame round trip. */
class GenSpec extends SparkSpec {

  private lazy val dim = EventGen.cities(spark, 12)

  test("generation is deterministic and partitioning-independent") {
    val a = EventGen.bookings(spark, dim, "2024-05-01", 10)
    val b = EventGen.bookings(spark, dim.repartition(7), "2024-05-01", 10)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("weather: one row per (city, day), conditions follow precip thresholds") {
    val w = EventGen.weather(spark, dim, "2024-05-01", 20)
    assert(w.count() === 12 * 20)
    val bad = w.filter(
      (col("condition") === "storm" && col("precip_mm") <= 10.0) ||
      (col("condition") === "rain" && (col("precip_mm") <= 2.0 || col("precip_mm") > 10.0)) ||
      (col("condition") === "clear" && col("precip_mm") > 2.0)).count()
    assert(bad === 0)
    assert(w.filter(col("t_max") <= col("t_min")).count() === 0)
  }

  test("flights: cancelled implies null delay; cancel rate small but nonzero") {
    val f = EventGen.flights(spark, dim, "2024-01-01", 60)
    assert(f.filter(col("status") === "cancelled" && col("delay_min").isNotNull).count() === 0)
    assert(f.filter(col("status") === "arrived" && col("delay_min").isNull).count() === 0)
    val rate = f.filter(col("status") === "cancelled").count().toDouble / f.count()
    assert(rate > 0.0 && rate < 0.3)
  }

  test("bookings: adr floor, nights domain, channel mix ordering") {
    val b = EventGen.bookings(spark, dim, "2024-05-01", 30)
    assert(b.filter(col("adr_proxy") < 30.0).count() === 0)
    assert(b.filter(!col("nights").isin(1, 2, 3, 4)).count() === 0)
    val byChannel = b.groupBy("channel").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChannel.getOrElse("ota", 0L) > byChannel.getOrElse("corporate", 0L))
  }

  test("kafka frame round trip: key, JSON value, ts") {
    val w = EventGen.weather(spark, dim, "2024-05-01", 2)
    val frame = EventGen.toKafkaFrame(w)
    assert(frame.columns.toSet === Set("key", "value", "kafka_ts"))
    val parsed = graft.operators.StreamOps.parseJson(frame, w.schema)
    assert(parsed.filter(col("city_id").isNull).count() === 0)
    assert(parsed.count() === w.count())
  }

  test("realtime clock mode: per-simulated-day emission matches the timewarp batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // the timewarp batch rendering: 3 simulated days in one frame
    val batch = EventGen.toKafkaFrame(
      EventGen.bookings(spark, dim, "2023-01-01", days = 3))
    val batchByDay = batch.select(col("key"), col("value"),
        to_date(col("kafka_ts")).cast("string").as("day")).collect()
      .groupBy(_.getString(2))
      .map { case (d, rows) => d -> rows.map(r => (r.getString(0), r.getString(1))).toSet }
    assert(batchByDay.keySet === Set("2023-01-01", "2023-01-02", "2023-01-03"))

    // realtime pacing: timewarp 86400x => 1 wall second per simulated day;
    // wall time injected, dense polls so no day is skipped
    val clock = new EventGen.RealtimeClock("2023-01-01", timewarp = 86400.0)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = stream.toDF().toDF("key", "value", "kafka_ts")
      .writeStream.format("memory").queryName("rt_sink").outputMode("append").start()
    try {
      var emitted = Vector.empty[(String, Long)] // (day, rows in sink after its batch)
      for (elapsed <- Seq(0.0, 0.25, 0.7, 1.0, 1.3, 1.9, 2.0, 2.6)) {
        clock.poll(elapsed).foreach { day =>
          // one-day slice from the same deterministic generator: columns
          // derive from hash(entity, calendar day), so slice == batch rows
          val slice = EventGen.toKafkaFrame(
              EventGen.bookings(spark, dim, day.toString, days = 1))
            .as[(String, String, java.sql.Timestamp)].collect()
          stream.addData(slice.toIndexedSeq)
          q.processAllAvailable()
          emitted :+= (day.toString, spark.table("rt_sink").count())
        }
      }
      // cadence: exactly one emission per simulated day, in order, and the
      // sink grew by exactly that day's batch rows at each emission
      assert(emitted.map(_._1) === Vector("2023-01-01", "2023-01-02", "2023-01-03"))
      val sizes = emitted.map(_._2)
      val perDay = sizes.zip(0L +: sizes.dropRight(1)).map { case (a, b) => a - b }
      assert(perDay === emitted.map(t => batchByDay(t._1).size.toLong))
      // duplicate polls within one simulated day emit nothing
      assert(clock.poll(2.9).isEmpty)
      // content: the union of realtime emissions IS the timewarp batch
      val got = spark.table("rt_sink").select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === batchByDay.values.reduce(_ ++ _))
    } finally q.stop()
  }

  test("realtime clock mode: sparse polls skip days like the reference loop") {
    val clock = new EventGen.RealtimeClock("2023-01-01", timewarp = 86400.0)
    assert(clock.poll(0.0).map(_.toString).contains("2023-01-01"))
    // next poll lands two simulated days later: day 2 is skipped, the
    // CURRENT day emits (reference: `if last_emitted_date != sim_date`)
    assert(clock.poll(2.2).map(_.toString).contains("2023-01-03"))
    assert(clock.poll(2.4).isEmpty)
    // timewarp floors at 1x like the reference's max(1.0, timewarp)
    val slow = new EventGen.RealtimeClock("2023-01-01", timewarp = 0.001)
    assert(slow.simDate(86400.0).toString === "2023-01-02")
  }
}
