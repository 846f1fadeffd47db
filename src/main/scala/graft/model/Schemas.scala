package graft.model

import org.apache.spark.sql.types._

/** Event schemas for the three tourism streams, fixed and explicit (no
  * streaming-path inference), mirroring the reference's StructType literals.
  *
  * Reference: spark/kafka_to_metrics.py:73-90 (weather), :92-116 (flight),
  * :118-142 (booking); common envelope :73-79. Timestamps arrive as ISO-8601
  * strings and are parsed in the engine (producers/orchestrator_producers.py:25-29).
  */
object Schemas {

  /** Envelope fields shared by all three event types (kafka_to_metrics.py:73-79). */
  private val envelope: Seq[StructField] = Seq(
    StructField("schema_version", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", StringType),
    StructField("ingest_ts", StringType),
    StructField("trace_id", StringType),
    StructField("producer", StringType)
  )

  /** weather.events.v1 (kafka_to_metrics.py:73-90). */
  val weather: StructType = StructType(envelope ++ Seq(
    StructField("city_id", StringType),
    StructField("date", StringType),
    StructField("t_min", DoubleType),
    StructField("t_max", DoubleType),
    StructField("precip_mm", DoubleType),
    StructField("wind_kph", DoubleType),
    StructField("humidity", DoubleType),
    StructField("condition", StringType),
    StructField("is_peak_season", BooleanType),
    StructField("holiday_flag", BooleanType)
  ))

  /** flight.events.v1 (kafka_to_metrics.py:92-116). */
  val flight: StructType = StructType(envelope ++ Seq(
    StructField("flight_id", StringType),
    StructField("airline", StringType),
    StructField("service_date", StringType),
    StructField("origin_iata", StringType),
    StructField("destination_iata", StringType),
    StructField("destination_city_id", StringType),
    StructField("scheduled_departure", StringType),
    StructField("actual_departure", StringType),
    StructField("scheduled_arrival", StringType),
    StructField("actual_arrival", StringType),
    StructField("status", StringType),
    StructField("delay_min", IntegerType),
    StructField("load_factor", DoubleType),
    StructField("aircraft_type", StringType),
    StructField("seats", IntegerType),
    StructField("weather_factor", DoubleType),
    StructField("airport_congestion", DoubleType)
  ))

  /** booking.events.v1 (kafka_to_metrics.py:118-142); `flight_anchor` is the
    * only nested field, a map like {"predicted_inbound": n}. */
  val booking: StructType = StructType(envelope ++ Seq(
    StructField("booking_id", StringType),
    StructField("hotel_id", StringType),
    StructField("city_id", StringType),
    StructField("city_name", StringType),
    StructField("checkin_date", StringType),
    StructField("checkout_date", StringType),
    StructField("nights", IntegerType),
    StructField("guests", IntegerType),
    StructField("rooms", IntegerType),
    StructField("channel", StringType),
    StructField("lead_time_days", IntegerType),
    StructField("adr_proxy", DoubleType),
    StructField("currency", StringType),
    StructField("is_refundable", BooleanType),
    StructField("status", StringType),
    StructField("cancel_ts", StringType),
    StructField("flight_anchor", MapType(StringType, IntegerType))
  ))

  /** Dimension-table schemas (batch side; SURVEY.md §1.3). */
  val hotels: StructType = StructType(Seq(
    StructField("hotel_id", StringType), StructField("name", StringType),
    StructField("kind", StringType), StructField("stars_num", DoubleType),
    StructField("city_id", StringType), StructField("city_name", StringType),
    StructField("region", StringType), StructField("lat", DoubleType),
    StructField("lon", DoubleType), StructField("addr_street", StringType),
    StructField("phone", StringType), StructField("website", StringType)
  ))

  val airports: StructType = StructType(Seq(
    StructField("airport_code", StringType), StructField("icao_code", StringType),
    StructField("name", StringType), StructField("type", StringType),
    StructField("lat", DoubleType), StructField("lon", DoubleType),
    StructField("city_name", StringType), StructField("region_code", StringType),
    StructField("ident", StringType)
  ))
}
