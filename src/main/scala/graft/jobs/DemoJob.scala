package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{StreamJob, StreamJobConfig}

/** Self-contained demo of the full 14-query streaming job — no Kafka, no
  * Pushgateway: three rate-source streams synthesize schema-conforming
  * events (EventGen-style hash-derived values), run through the real
  * StreamJob plans, and metrics print to stdout (or append to
  * $METRICS_FILE).
  *
  * Run: sbt "runMain graft.jobs.DemoJob" (env: DEMO_SECONDS, RATE,
  * TRIGGER). This is the reference's docker demo loop collapsed into one
  * process (README.md:150-239) — the operator plans are identical to the
  * Kafka deployment, only the source/sink bindings differ.
  */
object DemoJob {

  /** Map rate-source ticks to a Kafka-shaped frame of JSON events. */
  private def synth(spark: SparkSession, rate: Int, kind: String): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString).load()
    val cityIdx = pmod(col("value"), lit(20))
    // real cityLookup ids so the geomap broadcast join resolves coordinates
    // (kafka_to_metrics.py:372-394 id set)
    val lookupIds = Seq("3165524", "3173435", "3183560", "3169070", "3164603",
      "3172394", "3176959", "3176219", "3170647", "3164527", "3164600", "3183299",
      "3176217", "3172397", "3176218", "3176958", "3172395", "3171457", "3173331",
      "3171180")
    val cityId = element_at(array(lookupIds.map(lit): _*), cityIdx.cast("int") + 1)
    val eventTs = date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val payload = kind match {
      case "booking" => struct(
        lit("v1").as("schema_version"), lit("booking_created").as("event_type"),
        eventTs.as("event_ts"), eventTs.as("ingest_ts"),
        concat(lit("BKG-"), col("value").cast("string")).as("booking_id"),
        cityId.as("city_id"), concat(lit("city_"), cityIdx.cast("string")).as("city_name"),
        // a third of bookings arrive today so the current_date()-filtered
        // city_today query has data to emit
        when(pmod(col("value"), lit(3)) === 0,
          date_format(col("timestamp"), "yyyy-MM-dd"))
          .otherwise(date_format(col("timestamp") + expr("INTERVAL 7 DAYS"), "yyyy-MM-dd"))
          .as("checkin_date"),
        (pmod(col("value"), lit(4)) + 1).cast("int").as("nights"),
        (pmod(col("value"), lit(3)) + 1).cast("int").as("rooms"),
        (pmod(col("value"), lit(4)) + 1).cast("int").as("guests"),
        (lit(60.0) + pmod(col("value") * 37, lit(200))).as("adr_proxy"),
        lit("ota").as("channel"), lit("active").as("status"))
      case "weather" => struct(
        lit("v1").as("schema_version"), lit("weather_obs").as("event_type"),
        eventTs.as("event_ts"), eventTs.as("ingest_ts"),
        cityId.as("city_id"),
        (lit(10.0) + pmod(col("value"), lit(15))).as("t_min"),
        (lit(18.0) + pmod(col("value"), lit(15))).as("t_max"),
        pmod(col("value") * 3, lit(120)).cast("double").divide(10).as("precip_mm"),
        lit("clear").as("condition"))
      case "flight" => struct(
        lit("v1").as("schema_version"), lit("flight_arrival").as("event_type"),
        eventTs.as("event_ts"), eventTs.as("ingest_ts"),
        concat(lit("FL"), col("value").cast("string")).as("flight_id"),
        concat(lit("AP"), pmod(col("value"), lit(10)).cast("string")).as("origin_iata"),
        concat(lit("AP"), pmod(col("value") + 3, lit(10)).cast("string")).as("destination_iata"),
        cityId.as("destination_city_id"),
        when(pmod(col("value"), lit(50)) === 0, "cancelled").otherwise("arrived").as("status"),
        when(pmod(col("value"), lit(50)) === 0, lit(null).cast("int"))
          .otherwise(pmod(col("value"), lit(45)).cast("int")).as("delay_min"))
    }
    base.select(
      cityId.as("key"),
      to_json(payload).as("value"),
      col("timestamp").as("kafka_ts"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("graft-demo", cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val seconds = sys.env.getOrElse("DEMO_SECONDS", "30").toInt
    val rate = sys.env.getOrElse("RATE", "50").toInt
    val sink: String => Unit = sys.env.get("METRICS_FILE") match {
      case Some(f) => body => graft.metrics.Prometheus.pushToFile(f, body)
      case None => body => println(body)
    }
    val job = new StreamJob(spark,
      StreamJobConfig(
        trigger = Some(sys.env.getOrElse("TRIGGER", "5 seconds")),
        checkpointRoot = java.nio.file.Files.createTempDirectory("demo_chk").toString + "/chk"),
      sink)
    val queries = job.startAll(
      synth(spark, rate, "weather"),
      synth(spark, rate, "flight"),
      synth(spark, rate, "booking"))
    Thread.sleep(seconds * 1000L)
    queries.foreach(_.stop())
    spark.stop()
  }
}
