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

  test("365-day windows: emission timing across many micro-batches, late data dropped") {
    // §7.4.1 at the reference's REAL cadence: the production window is
    // 365 days (kafka_to_metrics.py:28-30), so a row must emit exactly
    // when the watermark crosses a YEAR boundary — never early (no
    // partial-year score leaks), and a late event behind the watermark
    // must be discarded, not re-open the closed window. Event time drives
    // everything, so the year-scale horizon runs in milliseconds.
    // Epoch-aligned 365d windows around these dates:
    //   W1 = [2023-12-19, 2024-12-18), W2 = [2024-12-18, 2025-12-18).
    implicit val sqlCtx = spark.sqlContext
    val bMem = MemoryStream[(Timestamp, String, String, String, Double)]
    val bookings = bMem.toDF().toDF("event_time", "city_id", "city_name", "season", "adr_proxy")
      .withWatermark("event_time", "1 second")
    val wMem = MemoryStream[(Timestamp, String, String, Double, Double, Double)]
    val weather = wMem.toDF().toDF("event_time", "city_id", "season", "t_min", "t_max", "precip_mm")
      .withWatermark("event_time", "1 second")
    val fMem = MemoryStream[(Timestamp, String, String, String, Int)]
    val flights = fMem.toDF().toDF("event_time", "city_id", "season", "status", "delay_min")
      .withWatermark("event_time", "1 second")

    val scored = SeasonScore(bookings, weather, flights, "365 days")
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("mstate_year_out").start()
    try {
      def cities(): Set[String] = spark.table("mstate_year_out")
        .select("city_id").as[String].collect().toSet
      def addAll(t: String, city: String, rain: Double = 0.0): Unit = {
        bMem.addData((ts(t), city, s"city_$city", "summer", 100.0))
        wMem.addData((ts(t), city, "summer", 15.0, 25.0, rain))
        fMem.addData((ts(t), city, "summer", "arrived", 3))
      }
      // micro-batch 1 + 2: W1 data for cities A and B, spread across
      // triggers — the window must NOT emit while the watermark is inside it
      addAll("2024-03-10 00:00:00", "A")
      q.processAllAvailable()
      addAll("2024-06-15 00:00:00", "B", rain = 8.0)
      q.processAllAvailable()
      assert(cities() === Set.empty,
        "partial-year rows leaked before the watermark crossed the window end")
      // micro-batch 3: W2 data for city C pushes the watermark past W1's
      // end (2024-12-18) -> exactly the W1 cities emit; W2 stays open
      addAll("2025-06-01 00:00:00", "C")
      q.processAllAvailable()
      assert(cities() === Set("A", "B"),
        s"W1 must close (A, B) and W2 stay open, got ${cities()}")
      // late data: a W1-timestamped city arriving AFTER W1 closed must be
      // dropped by the watermark, not re-open the window
      addAll("2024-05-05 00:00:00", "L")
      q.processAllAvailable()
      assert(cities() === Set("A", "B"),
        s"late W1 event re-opened a closed window: ${cities()}")
      // micro-batch 5: advance past W2's end (2025-12-18) -> C emits
      addAll("2026-06-01 00:00:00", "Z")
      q.processAllAvailable()
      assert(cities() === Set("A", "B", "C"), s"got ${cities()}")
      // window starts pin the rows to their years (UTC session tz)
      val rows = spark.table("mstate_year_out")
        .select($"city_id", $"window.start".cast("date").cast("string"))
        .as[(String, String)].collect().toMap
      assert(rows("A") === "2023-12-19" && rows("B") === "2023-12-19" &&
        rows("C") === "2024-12-18", s"wrong window assignment: $rows")
      // and the scores emitted at close are complete-window scores
      spark.table("mstate_year_out").select("season_score").as[Double]
        .collect().foreach(s => assert(s >= 0.0 && s <= 100.0))
    } finally q.stop()
  }
}
