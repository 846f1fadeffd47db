package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.SeasonScore

/** SURVEY.md §7.4.1 — the season-score pipeline chains agg → join → agg →
  * join inside ONE streaming query (multi-stateful-operator support,
  * Spark 3.4+). This spec runs the real SeasonScore operator as a streaming
  * query with minute-scale windows (the window size is a parameter — the
  * reference's env knob, kafka_to_metrics.py:28-30) and checks rows emit
  * with correct scores once the watermark closes the windows. */
class MultiStatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("season score as a single streaming query: agg → join → agg → join emits on window close") {
    implicit val sqlCtx = spark.sqlContext

    // (event_time, city_id, city_name, season, adr_proxy)
    val bMem = MemoryStream[(Timestamp, String, String, String, Double)]
    val bookings = bMem.toDF().toDF("event_time", "city_id", "city_name", "season", "adr_proxy")
      .withWatermark("event_time", "1 second")
    // (event_time, city_id, season, t_min, t_max, precip_mm)
    val wMem = MemoryStream[(Timestamp, String, String, Double, Double, Double)]
    val weather = wMem.toDF().toDF("event_time", "city_id", "season", "t_min", "t_max", "precip_mm")
      .withWatermark("event_time", "1 second")
    // (event_time, city_id, season, status, delay_min)
    val fMem = MemoryStream[(Timestamp, String, String, String, Int)]
    val flights = fMem.toDF().toDF("event_time", "city_id", "season", "status", "delay_min")
      .withWatermark("event_time", "1 second")

    val scored = SeasonScore(bookings, weather, flights, "1 minute")
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("mstate_out").start()
    try {
      val w0 = "2024-07-01 10:00:"
      // two cities × one season in the 10:00 window
      bMem.addData(
        (ts(w0 + "05"), "A", "city_A", "summer", 100.0),
        (ts(w0 + "10"), "A", "city_A", "summer", 140.0),
        (ts(w0 + "15"), "B", "city_B", "summer", 60.0))
      wMem.addData(
        (ts(w0 + "05"), "A", "summer", 18.0, 24.0, 0.0),
        (ts(w0 + "06"), "B", "summer", 10.0, 14.0, 12.0))
      fMem.addData(
        (ts(w0 + "07"), "A", "summer", "arrived", 5),
        (ts(w0 + "08"), "B", "summer", "cancelled", 0))
      q.processAllAvailable()
      // advance all three watermarks past the window end to force emission
      bMem.addData((ts("2024-07-01 10:10:00"), "Z", "city_Z", "summer", 1.0))
      wMem.addData((ts("2024-07-01 10:10:00"), "Z", "summer", 1.0, 1.0, 0.0))
      fMem.addData((ts("2024-07-01 10:10:00"), "Z", "summer", "arrived", 1))
      q.processAllAvailable()

      val out = spark.table("mstate_out")
        .select("city_id", "season", "season_score")
        .as[(String, String, Double)].collect()
      val byCity = out.groupBy(_._1).view.mapValues(_.head._3).toMap
      assert(byCity.contains("A") && byCity.contains("B"),
        s"both 10:00-window cities must emit after watermark passes: ${out.toSeq}")
      out.foreach { case (_, _, score) =>
        assert(score >= 0.0 && score <= 100.0, s"score out of range: $score")
      }
      // A: cheaper-relative-index is per-city percentile-normalized; with a
      // single season per city the norms degenerate to 0.5 -> both cities
      // get the same structural score unless weather differs; B has rain +
      // a cancellation, so B's weather/reliability indexes can only be <= A's
      val a = out.find(_._1 == "A").get._3
      val b = out.find(_._1 == "B").get._3
      assert(a >= b, s"city A (dry, reliable) must score >= city B (rain, cancel): A=$a B=$b")
    } finally q.stop()
  }
}
