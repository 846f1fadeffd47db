package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Exprs._
import graft.metrics.Prometheus
import graft.model.Schemas
import graft.operators.{SeasonScore, StreamOps}

/** The 14-query streaming KPI job — Scala/Spark-native re-expression of the
  * reference's single PySpark app (spark/kafka_to_metrics.py:564-601,
  * traced in SURVEY.md §3.1-3.2).
  *
  * Differences from the reference, by design (SURVEY.md §7.4):
  *  - top-K ordering/limit happens in the PLAN (TakeOrderedAndProject)
  *    before collect, so driver memory stays bounded at any scale (§7.4.6);
  *  - the metric sink is pluggable (Pushgateway / file / in-memory capture)
  *    so the whole job is testable without HTTP or Kafka;
  *  - windows/watermark/trigger/topN are constructor parameters with the
  *    reference's env defaults (kafka_to_metrics.py:20-34).
  */
final case class StreamJobConfig(
    trigger: Option[String] = Some(sys.env.getOrElse("TRIGGER", "10 seconds")),
    watermark: String = sys.env.getOrElse("WATERMARK", "45 seconds"),
    windowMinute: String = sys.env.getOrElse("WINDOW_SIZE", "1 minute"),
    window30d: String = sys.env.getOrElse("WINDOW_30D", "30 days"),
    window365d: String = sys.env.getOrElse("WINDOW_365D", "365 days"),
    topN: Int = sys.env.getOrElse("TOPN", "10").toInt,
    checkpointRoot: String = sys.env.getOrElse("CHECKPOINT_ROOT", "/tmp/chk"),
    debugStream: Boolean = sys.env.get("DEBUG_STREAM").contains("1"))

class StreamJob(spark: SparkSession, config: StreamJobConfig,
                pushFn: String => Unit) {
  import StreamOps._

  type Push = Seq[(String, Seq[(String, String)], Double)] => Unit

  /** Collapse duplicate (name, labels) samples before rendering — a
    * micro-batch can update two windows of the same unlabeled monitor metric
    * (e.g. a trigger straddling a minute boundary), and Pushgateway rejects
    * bodies with duplicate samples. Last value wins, insertion order kept
    * (the reference's dict-keyed metrics map, kafka_to_metrics.py:524-548). */
  private val push: Push = ms => if (ms.nonEmpty) {
    val deduped = scala.collection.mutable.LinkedHashMap
      .empty[(String, Seq[(String, String)]), Double]
    ms.foreach { case (n, ls, v) => deduped((n, ls)) = v }
    pushFn(Prometheus.render(deduped.map { case ((n, ls), v) => (n, ls, v) }.toSeq))
  }

  /** 20-row static geo lookup (kafka_to_metrics.py:372-394). */
  def cityLookup: DataFrame = {
    import spark.implicits._
    Seq(
      ("3165524", "Roma", 41.9028, 12.4964), ("3173435", "Milano", 45.4642, 9.1900),
      ("3183560", "Torino", 45.0703, 7.6869), ("3169070", "Napoli", 40.8518, 14.2681),
      ("3164603", "Palermo", 38.1157, 13.3613), ("3172394", "Bologna", 44.4949, 11.3426),
      ("3176959", "Firenze", 43.7699, 11.2556), ("3176219", "Genova", 44.4056, 8.9463),
      ("3170647", "Bari", 41.1171, 16.8719), ("3164527", "Verona", 45.4384, 10.9916),
      ("3164600", "Venezia", 45.4408, 12.3155), ("3183299", "Trieste", 45.6495, 13.7768),
      ("3176217", "Padova", 45.4064, 11.8768), ("3172397", "Bergamo", 45.6983, 9.6773),
      ("3176218", "Parma", 44.8015, 10.3279), ("3176958", "Ferrara", 44.8381, 11.6198),
      ("3172395", "Brescia", 45.5416, 10.2118), ("3171457", "Catania", 37.5079, 15.0830),
      ("3173331", "Messina", 38.1938, 15.5540), ("3171180", "Bolzano", 46.4983, 11.3548)
    ).toDF("city_id", "g_name", "g_lat", "g_lon")
  }

  // ---- plan construction (pure, also usable in batch tests) ---------------

  /** parse + repair for one raw Kafka-shaped frame. */
  def parsed(raw: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    repairTimestamps(parseJson(raw, schema))

  def plans(weatherRaw: DataFrame, flightRaw: DataFrame, bookingRaw: DataFrame)
      : Map[String, (DataFrame, String, (DataFrame, Long) => Unit)] = {
    val weatherBase = parsed(weatherRaw, Schemas.weather)
    val flightsBase = parsed(flightRaw, Schemas.flight)
    val bookingsBase = parsed(bookingRaw, Schemas.booking)
    val bookingsEnriched = enrichBooking(bookingsBase)

    // dual-clock watermark branches (kafka_to_metrics.py:204-214)
    val weatherIng = weatherBase.withWatermark("ingest_time", config.watermark)
    val flightsIng = flightsBase.withWatermark("ingest_time", config.watermark)
    val bookingsIng = bookingsBase.withWatermark("ingest_time", config.watermark)
    val weatherEvt = weatherBase.withWatermark("event_time", config.watermark)
    val flightsEvt = flightsBase.withWatermark("event_time", config.watermark)
      .withColumnRenamed("destination_city_id", "city_id")
    val bookingsEvt = bookingsEnriched.withWatermark("event_time", config.watermark)

    val ingestCounter = globalCount(weatherIng.select(lit(1).as("one")), "records_in_trigger")

    val wCnt = weatherIng.groupBy(window(col("ingest_time"), config.windowMinute))
      .agg(count(lit(1)).as("weather_count"))
    val fCnt = flightsIng.groupBy(window(col("ingest_time"), config.windowMinute))
      .agg(count(lit(1)).as("flights_count"),
        sum(when(col("status") === "cancelled", 1).otherwise(0)).as("flights_cancelled"),
        avg(when(col("delay_min").isNotNull, col("delay_min"))).as("avg_delay_min"))
    val bCnt = bookingsIng.groupBy(window(col("ingest_time"), config.windowMinute))
      .agg(count(lit(1)).as("bookings_count"), avg(col("adr_proxy")).as("avg_adr"))

    val inboundByAirport = flightsIng
      .groupBy(window(col("ingest_time"), config.windowMinute),
        col("destination_iata").as("airport"))
      .agg(count(lit(1)).as("inbound"))
    val outboundByAirport = flightsIng
      .groupBy(window(col("ingest_time"), config.windowMinute),
        col("origin_iata").as("airport"))
      .agg(count(lit(1)).as("outbound"))

    val arrivalsToday = runningTotals(
      bookingsEnriched.filter(col("arrival_day") === current_date()),
      Seq(col("city_id"), col("city_name")), col("spend_eur"))
      .withColumnsRenamed(Map("arrivals" -> "arrivals_today", "spend_sum" -> "spend_today_eur"))

    val bCityMin = bookingsIng
      .groupBy(window(col("ingest_time"), config.windowMinute), col("city_id"), col("city_name"))
      .agg(count(lit(1)).as("bookings"))
    val bCity30d = bookingsEvt
      .groupBy(window(col("event_time"), config.window30d), col("city_id"), col("city_name"))
      .agg(count(lit(1)).as("bookings_30d"))
    val bCity365d = bookingsEvt
      .groupBy(window(col("event_time"), config.window365d), col("city_id"), col("city_name"))
      .agg(count(lit(1)).as("bookings_365d"))

    val monthRoll = monthRollup(bookingsEvt.withColumn("arr_month", month(col("arrival_day"))),
      "event_time", config.window365d, col("arrival_day"), col("spend_eur"))
      .withColumnsRenamed(Map("bookings" -> "bookings_m", "spend_sum" -> "spend_m_eur"))
    val seasonRoll = seasonRollup(bookingsEvt, "event_time", config.window365d,
      col("arrival_day"), col("spend_eur"))
      .withColumnsRenamed(Map("bookings" -> "bookings_s", "spend_sum" -> "spend_s_eur"))

    val bCityMinGeo = broadcastLookupJoin(bCityMin, cityLookup, Seq("city_id"))
      .withColumn("g_name_final",
        when(col("g_name").isNotNull, col("g_name")).otherwise(col("city_name")))

    val csScore = SeasonScore(
      addSeason(bookingsEvt, col("arrival_day")),
      addSeason(weatherEvt, to_date(col("event_time"))),
      addSeason(flightsEvt, to_date(col("event_time"))),
      config.window365d)

    Map(
      "ingest_counter" -> ((ingestCounter, "update", pushBatchCounts _)),
      "weather_cnt" -> ((wCnt, "update", pushBatchCounts _)),
      "flights_cnt" -> ((fCnt, "update",
        (df: DataFrame, bid: Long) => { pushBatchCounts(df, bid); pushTotalFlights(df) })),
      "bookings_cnt" -> ((bCnt, "update", pushBatchCounts _)),
      "airports_inbound" -> ((inboundByAirport, "update",
        (df: DataFrame, _: Long) => pushAirportsTop(df, "inbound"))),
      "airports_outbound" -> ((outboundByAirport, "update",
        (df: DataFrame, _: Long) => pushAirportsTop(df, "outbound"))),
      "city_today" -> ((arrivalsToday, "update",
        (df: DataFrame, _: Long) => pushCityToday(df))),
      "top_cities_minute" -> ((bCityMin, "update",
        (df: DataFrame, _: Long) => pushCityTopN(df, "tourism_city_bookings_top", "bookings", "1m"))),
      "top_cities_30d" -> ((bCity30d, "update",
        (df: DataFrame, _: Long) => pushCityTopN(df, "tourism_city_bookings_top", "bookings_30d", "30d"))),
      "top_cities_365d" -> ((bCity365d, "update",
        (df: DataFrame, _: Long) => pushCityTopN(df, "tourism_city_bookings_top", "bookings_365d", "365d"))),
      "month_roll_365" -> ((monthRoll, "update", (df: DataFrame, _: Long) => pushMonthRoll(df))),
      "season_roll_365" -> ((seasonRoll, "update", (df: DataFrame, _: Long) => pushSeasonRoll(df))),
      "cities_geomap" -> ((bCityMinGeo, "update", (df: DataFrame, _: Long) => pushCityGeomap(df))),
      "season_score" -> ((csScore, "append", (df: DataFrame, _: Long) => pushSeasonScore(df)))
    )
  }

  /** add_season (kafka_to_metrics.py:315-323). */
  def addSeason(df: DataFrame, dateCol: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("season", seasonOf(dateCol))

  // ---- foreachBatch metric emitters (kafka_to_metrics.py:521-548 etc.) ----

  private def optD(r: org.apache.spark.sql.Row, c: String): Option[Double] =
    if (r.schema.fieldNames.contains(c) && !r.isNullAt(r.fieldIndex(c)))
      Some(r.get(r.fieldIndex(c)) match {
        case n: Number => n.doubleValue()
        case x => x.toString.toDouble
      })
    else None
  private def optS(r: org.apache.spark.sql.Row, c: String): Option[String] =
    if (r.schema.fieldNames.contains(c) && !r.isNullAt(r.fieldIndex(c)))
      Some(r.get(r.fieldIndex(c)).toString)
    else None

  def pushBatchCounts(df: DataFrame, batchId: Long): Unit = {
    val ms = df.collect().flatMap { r =>
      val b = Seq.newBuilder[(String, Seq[(String, String)], Double)]
      optD(r, "records_in_trigger").foreach(v => b += (("tourism_ingest_records_per_trigger", Nil, v)))
      optD(r, "weather_count").foreach(v => b += (("tourism_weather_msgs_per_min", Nil, v)))
      optD(r, "flights_count").foreach { total =>
        b += (("tourism_flight_msgs_per_min", Nil, total))
        val canc = optD(r, "flights_cancelled").getOrElse(0.0)
        if (total > 0) b += (("tourism_flight_cancel_rate", Nil, canc / total))
        optD(r, "avg_delay_min").foreach(v => b += (("tourism_flight_delay_min_avg", Nil, v)))
      }
      optD(r, "bookings_count").foreach { v =>
        b += (("tourism_booking_msgs_per_min", Nil, v))
        optD(r, "avg_adr").foreach(a => b += (("tourism_booking_adr_avg", Nil, a)))
      }
      b.result()
    }
    push(ms.toSeq)
  }

  def pushTotalFlights(df: DataFrame): Unit =
    globalSum(df, col("flights_count"), "t").collect().headOption
      .flatMap(r => optD(r, "t"))
      .foreach(t => push(Seq(("tourism_flights_total_per_min", Nil, t))))

  def pushAirportsTop(df: DataFrame, direction: String): Unit = {
    val valCol = if (direction == "inbound") "inbound" else "outbound"
    val ms = topK(df, col(valCol), config.topN, col("airport")).collect().map { r =>
      ("tourism_airport_flights_per_min",
        Seq("airport" -> optS(r, "airport").getOrElse("UNK"), "direction" -> direction),
        optD(r, valCol).getOrElse(0.0))
    }
    push(ms.toSeq)
  }

  def pushCityToday(df: DataFrame): Unit = {
    val ms = topK(df, col("arrivals_today"), config.topN, col("city_id")).collect().flatMap { r =>
      val labels = Seq("city_id" -> optS(r, "city_id").getOrElse("NA")) ++
        optS(r, "city_name").map("city_name" -> _)
      optD(r, "arrivals_today").map(v => ("tourism_city_arrivals_today", labels, v)) ++
        optD(r, "spend_today_eur").map(v => ("tourism_city_spend_today_eur", labels, v))
    }
    push(ms.toSeq)
  }

  def pushCityTopN(df: DataFrame, metric: String, valueCol: String, period: String): Unit = {
    val ms = topK(df, col(valueCol), config.topN, col("city_id")).collect().map { r =>
      val labels = Seq("city_id" -> optS(r, "city_id").getOrElse("NA"), "period" -> period) ++
        optS(r, "city_name").map("city_name" -> _)
      (metric, labels, optD(r, valueCol).getOrElse(0.0))
    }
    push(ms.toSeq)
  }

  def pushMonthRoll(df: DataFrame): Unit = {
    val ms = df.collect().flatMap { r =>
      optD(r, "arr_month").map(_.toInt).toSeq.flatMap { m =>
        val labels = Seq("month" -> f"$m%02d")
        optD(r, "bookings_m").map(v => ("tourism_month_bookings_rolling", labels, v)) ++
          optD(r, "spend_m_eur").map(v => ("tourism_month_spend_rolling_eur", labels, v))
      }
    }
    push(ms.toSeq)
  }

  def pushSeasonRoll(df: DataFrame): Unit = {
    val ms = df.collect().flatMap { r =>
      optS(r, "season").toSeq.flatMap { s =>
        val labels = Seq("season" -> s)
        optD(r, "bookings_s").map(v => ("tourism_season_bookings_rolling", labels, v)) ++
          optD(r, "spend_s_eur").map(v => ("tourism_season_spend_rolling_eur", labels, v))
      }
    }
    push(ms.toSeq)
  }

  def pushCityGeomap(df: DataFrame): Unit = {
    val ms = topK(notNullFilter(df, Seq("g_lat", "g_lon")), col("bookings"),
      config.topN, col("city_id")).collect().map { r =>
      ("tourism_city_bookings_geo",
        Seq(
          "city_id" -> optS(r, "city_id").getOrElse("NA"),
          "city_name" -> optS(r, "g_name_final").orElse(optS(r, "city_name")).getOrElse("NA"),
          // Locale.ROOT: the f interpolator is default-locale-dependent and a
          // comma-decimal JVM would alter the label values (time-series identity)
          "lat" -> String.format(java.util.Locale.ROOT, "%.5f",
            Double.box(optD(r, "g_lat").getOrElse(0.0))),
          "lon" -> String.format(java.util.Locale.ROOT, "%.5f",
            Double.box(optD(r, "g_lon").getOrElse(0.0)))),
        optD(r, "bookings").getOrElse(0.0))
    }
    push(ms.toSeq)
  }

  def pushSeasonScore(df: DataFrame): Unit = {
    val ms = topK(df, col("season_score"), config.topN * 4, col("city_id"), col("season"))
      .collect().map { r =>
        ("tourism_season_score",
          Seq(
            "city_id" -> optS(r, "city_id").getOrElse("NA"),
            "city_name" -> optS(r, "city_name").getOrElse("NA"),
            "season" -> optS(r, "season").getOrElse("NA")),
          optD(r, "season_score").getOrElse(0.0))
      }
    push(ms.toSeq)
  }

  // ---- wiring (A27): start all queries --------------------------------------

  /** Start one query: foreachBatch sink, per-query checkpoint, trigger
    * (kafka_to_metrics.py:552-561). */
  def startQuery(df: DataFrame, name: String, mode: String,
                 fn: (DataFrame, Long) => Unit): StreamingQuery = {
    var w = df.writeStream
      .outputMode(mode)
      .foreachBatch(fn)
      .option("checkpointLocation", s"${config.checkpointRoot}_$name")
      .queryName(name)
    config.trigger.foreach(t => w = w.trigger(Trigger.ProcessingTime(t)))
    w.start()
  }

  /** Start the full 14-query job (+ optional debug console sink, A29). */
  def startAll(weatherRaw: DataFrame, flightRaw: DataFrame,
               bookingRaw: DataFrame): Seq[StreamingQuery] = {
    val qs = plans(weatherRaw, flightRaw, bookingRaw).toSeq.map {
      case (name, (df, mode, fn)) => startQuery(df, name, mode, fn)
    }
    val debug = if (config.debugStream) {
      val be = enrichBooking(parsed(bookingRaw, Schemas.booking))
      Some(be.select("kafka_ts", "event_ts", "ingest_ts", "event_time", "ingest_time",
        "arrival_day", "event_day", "spend_eur", "city_id", "city_name")
        .writeStream.format("console").outputMode("append")
        .option("truncate", "false").option("numRows", "20").start())
    } else None
    qs ++ debug
  }
}

/** Entry point: Kafka topics → 14 streaming queries → Pushgateway.
  * Env knobs mirror the reference (kafka_to_metrics.py:20-34). */
object StreamJob {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("graft-stream-job")
    val gw = sys.env.getOrElse("PUSHGATEWAY", "http://localhost:9091")
    val job = new StreamJob(spark, StreamJobConfig(),
      body => Prometheus.push(gw, "tourism_stream", "local", body))
    import graft.sources.EventSources.kafka
    job.startAll(
      kafka(spark, sys.env.getOrElse("WEATHER_TOPIC", "weather.events.v1")),
      kafka(spark, sys.env.getOrElse("FLIGHT_TOPIC", "flight.events.v1")),
      kafka(spark, sys.env.getOrElse("BOOKING_TOPIC", "booking.events.v1")))
    spark.streams.awaitAnyTermination()
  }
}
