package graft

import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamJob, StreamJobConfig}

/** End-to-end: JSON events through parse → repair → watermark → agg →
  * foreachBatch → exposition-format push, no Kafka/HTTP involved. */
class StreamJobSpec extends SparkSpec {
  import spark.implicits._

  private val pushed = mutable.Buffer[String]()
  private lazy val job = new StreamJob(spark,
    StreamJobConfig(trigger = None,
      checkpointRoot = java.nio.file.Files.createTempDirectory("chk").toString + "/chk",
      debugStream = false),
    body => pushed.synchronized { pushed += body })

  private def ts(s: String) = Timestamp.valueOf(s)

  private def bookingJson(cityId: String, cityName: String, adr: Double,
                          checkin: String, eventTs: String): String =
    s"""{"schema_version":"v1","event_type":"booking_created","event_ts":"$eventTs",
       |"ingest_ts":"$eventTs","booking_id":"BKG-1","hotel_id":"h1","city_id":"$cityId",
       |"city_name":"$cityName","checkin_date":"$checkin","nights":2,"guests":2,"rooms":1,
       |"channel":"ota","lead_time_days":5,"adr_proxy":$adr,"currency":"EUR",
       |"is_refundable":true,"status":"active","cancel_ts":null,
       |"flight_anchor":{"predicted_inbound":3}}""".stripMargin.replaceAll("\n", "")

  test("booking monitor + top-cities + geomap queries emit exposition metrics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val raw = mem.toDF().toDF("key", "value", "kafka_ts")
    // dummy raw frames for the other two streams (no data needed here)
    val empty = MemoryStream[(String, String, Timestamp)].toDF()
      .toDF("key", "value", "kafka_ts")
    val plans = job.plans(empty, empty, raw)

    val names = Seq("bookings_cnt", "top_cities_minute", "cities_geomap")
    val qs = names.map { n =>
      val (df, mode, fn) = plans(n)
      job.startQuery(df, n, mode, fn)
    }
    try {
      mem.addData(
        ("3165524|2024-07-01", bookingJson("3165524", "Roma", 120.0, "2024-07-01", "2024-06-20T10:00:00Z"), ts("2024-06-20 10:00:01")),
        ("3165524|2024-07-01", bookingJson("3165524", "Roma", 80.0, "2024-07-01", "2024-06-20T10:00:05Z"), ts("2024-06-20 10:00:06")),
        ("9999999|2024-07-02", bookingJson("9999999", "Nowhere", 50.0, "2024-07-02", "2024-06-20T10:00:10Z"), ts("2024-06-20 10:00:11")))
      qs.foreach(_.processAllAvailable())
      val all = pushed.synchronized(pushed.mkString("\n"))
      // monitor: 3 bookings in the 10:00 minute, avg adr (120+80+50)/3
      assert(all.contains("tourism_booking_msgs_per_min 3.0"), all)
      assert(all.contains("tourism_booking_adr_avg 83.33333333333333"), all)
      // top cities: Roma has 2 bookings with period label
      assert(all.contains("""tourism_city_bookings_top{city_id="3165524",period="1m",city_name="Roma"} 2.0"""), all)
      // geomap: Roma resolved via broadcast lookup; unknown city filtered out
      assert(all.contains("""tourism_city_bookings_geo{city_id="3165524",city_name="Roma",lat="41.90280",lon="12.49640"} 2.0"""), all)
      assert(!all.contains("9999999") || !all.contains("tourism_city_bookings_geo{city_id=\"9999999\""), all)
    } finally qs.foreach(_.stop())
  }

  test("season rollup from event-time branch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val raw = mem.toDF().toDF("key", "value", "kafka_ts")
    val empty = MemoryStream[(String, String, Timestamp)].toDF()
      .toDF("key", "value", "kafka_ts")
    val (df, mode, fn) = job.plans(empty, empty, raw)("season_roll_365")
    val q = job.startQuery(df, "season_roll_365_t", mode, fn)
    try {
      pushed.synchronized(pushed.clear())
      mem.addData(
        ("a", bookingJson("1", "A", 100.0, "2024-07-15", "2024-07-01T00:00:00Z"), ts("2024-07-01 00:00:01")),
        ("b", bookingJson("2", "B", 100.0, "2024-01-15", "2024-07-01T00:00:10Z"), ts("2024-07-01 00:00:11")))
      q.processAllAvailable()
      val all = pushed.synchronized(pushed.mkString("\n"))
      assert(all.contains("""tourism_season_bookings_rolling{season="summer"} 1.0"""), all)
      assert(all.contains("""tourism_season_bookings_rolling{season="winter"} 1.0"""), all)
      // spend = adr*rooms*nights = 100*1*2
      assert(all.contains("""tourism_season_spend_rolling_eur{season="summer"} 200.0"""), all)
    } finally q.stop()
  }

  private def flightJson(dest: String, origin: String, status: String,
                         delay: Option[Int], eventTs: String): String =
    s"""{"schema_version":"v1","event_type":"flight_arrival","event_ts":"$eventTs",
       |"ingest_ts":"$eventTs","flight_id":"FL1","airline":"AZ","service_date":"2024-06-20",
       |"origin_iata":"$origin","destination_iata":"$dest","destination_city_id":"3165524",
       |"status":"$status","delay_min":${delay.map(_.toString).getOrElse("null")},
       |"load_factor":0.8,"seats":180,"weather_factor":0.1,"airport_congestion":0.2}"""
      .stripMargin.replaceAll("\n", "")

  test("flight monitor + airport top-N emit cancel rate, delay avg, totals, directions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val raw = mem.toDF().toDF("key", "value", "kafka_ts")
    val empty = MemoryStream[(String, String, Timestamp)].toDF()
      .toDF("key", "value", "kafka_ts")
    val plans = job.plans(empty, raw, empty)
    val names = Seq("flights_cnt", "airports_inbound", "airports_outbound")
    val qs = names.map { n =>
      val (df, mode, fn) = plans(n)
      job.startQuery(df, n + "_f", mode, fn)
    }
    try {
      pushed.synchronized(pushed.clear())
      mem.addData(
        ("FCO|1", flightJson("FCO", "LIN", "arrived", Some(10), "2024-06-20T10:00:00Z"), ts("2024-06-20 10:00:01")),
        ("FCO|2", flightJson("FCO", "LIN", "arrived", Some(20), "2024-06-20T10:00:05Z"), ts("2024-06-20 10:00:06")),
        ("MXP|3", flightJson("MXP", "FCO", "cancelled", None, "2024-06-20T10:00:10Z"), ts("2024-06-20 10:00:11")),
        ("FCO|4", flightJson("FCO", "MXP", "arrived", Some(0), "2024-06-20T10:00:15Z"), ts("2024-06-20 10:00:16")))
      qs.foreach(_.processAllAvailable())
      val all = pushed.synchronized(pushed.mkString("\n"))
      assert(all.contains("tourism_flight_msgs_per_min 4.0"), all)
      assert(all.contains("tourism_flight_cancel_rate 0.25"), all)
      assert(all.contains("tourism_flight_delay_min_avg 10.0"), all) // (10+20+0)/3 non-null
      assert(all.contains("tourism_flights_total_per_min 4.0"), all)
      assert(all.contains("""tourism_airport_flights_per_min{airport="FCO",direction="inbound"} 3.0"""), all)
      assert(all.contains("""tourism_airport_flights_per_min{airport="LIN",direction="outbound"} 2.0"""), all)
    } finally qs.foreach(_.stop())
  }

  test("duplicate (name, labels) samples collapse before push (Pushgateway rejects dups)") {
    // two windows of the same unlabeled monitor metric in one micro-batch
    val df = Seq(Tuple1(10L), Tuple1(20L)).toDF("weather_count")
    pushed.synchronized(pushed.clear())
    job.pushBatchCounts(df, 0L)
    val body = pushed.synchronized(pushed.mkString)
    assert(body.linesIterator.count(_.startsWith("tourism_weather_msgs_per_min")) === 1, body)
  }

  test("kafka source: plan construction either resolves the connector or fails with the clean DATA_SOURCE_NOT_FOUND") {
    // /opt/spark/jars ships without spark-sql-kafka; this smoke pins the
    // failure mode so a classpath regression (or a future jar addition)
    // surfaces here instead of at deploy time. Both outcomes are legal; a
    // crash with an unrelated error is not.
    val connectorPresent =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    if (connectorPresent) {
      val df = graft.sources.EventSources.kafka(spark, "smoke.topic")
      assert(df.isStreaming && df.columns.toSeq == Seq("key", "value", "kafka_ts"))
    } else {
      val e = intercept[Exception] {
        graft.sources.EventSources.kafka(spark, "smoke.topic")
      }
      assert(e.getMessage != null && e.getMessage.toLowerCase.contains("kafka"),
        s"expected a clean data-source-not-found error naming kafka, got: $e")
    }
  }

  test("prometheus renderer escapes labels and renders bare metrics") {
    import graft.metrics.Prometheus
    val body = Prometheus.render(Seq(
      ("m_total", Nil, 5.0),
      ("m_city", Seq("name" -> "it\"quote\\slash"), 1.5)))
    assert(body ==
      "m_total 5.0\nm_city{name=\"it\\\"quote\\\\slash\"} 1.5\n")
  }
}
