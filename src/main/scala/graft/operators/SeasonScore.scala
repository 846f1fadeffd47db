package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Exprs._
import StreamOps.pct

/** A18-A23: the season-score pipeline — the reference's deepest dataflow
  * (kafka_to_metrics.py:417-520, traced in SURVEY.md §3.2).
  *
  * Shape: 3 windowed stat aggregates → 2 left joins on
  * (window, city_id, season) → percentile aggregate per (window, city_id)
  * → re-join → pure-expression score projection. No UDFs anywhere
  * (reference note :476).
  *
  * Scale notes: the three stat frames and the percentile frame all hash-
  * partition on (window, city_id[, season]) — Catalyst reuses the exchange
  * where keys are compatible, and every aggregate does map-side partial
  * aggregation. Percentiles use the mergeable ApproximatePercentile sketch
  * by default (single pass, no per-group sort); `exact = true` switches to
  * exact percentile for oracle-checked runs at small SF.
  */
object SeasonScore {

  /** bookings stats per (window, city_id, season, city_name)
    * (kafka_to_metrics.py:442-448). Input needs: tsCol, city_id, city_name,
    * season, adr_proxy. */
  def bookingStats(df: DataFrame, tsCol: String, dur: String): DataFrame =
    df.groupBy(window(col(tsCol), dur), col("city_id"), col("season"), col("city_name"))
      .agg(count(lit(1)).as("bookings"), avg(col("adr_proxy")).as("adr_avg"))

  /** weather stats per (window, city_id, season) (kafka_to_metrics.py:434-440). */
  def weatherStats(df: DataFrame, tsCol: String, dur: String): DataFrame =
    df.groupBy(window(col(tsCol), dur), col("city_id"), col("season"))
      .agg(
        avg((col("t_max") + col("t_min")) / 2.0).as("t_avg"),
        avg(col("precip_mm")).as("precip_avg"))

  /** flight stats per (window, city_id, season) with guarded cancel_rate
    * (kafka_to_metrics.py:424-432). */
  def flightStats(df: DataFrame, tsCol: String, dur: String): DataFrame =
    df.groupBy(window(col(tsCol), dur), col("city_id"), col("season"))
      .agg(
        count(lit(1)).as("flights_total"),
        sum(when(col("status") === "cancelled", 1).otherwise(0)).as("flights_cancelled"),
        avg(col("delay_min")).as("delay_avg"))
      .withColumn("cancel_rate",
        when(col("flights_total") > 0,
          col("flights_cancelled") / col("flights_total")).otherwise(lit(0.0)))

  /** cs_join: bookings ⟕ weather ⟕ flights on [window, city_id, season]
    * (kafka_to_metrics.py:451-455). */
  def joinStats(bookingsCs: DataFrame, weatherCs: DataFrame,
                flightsCs: DataFrame): DataFrame =
    bookingsCs
      .join(weatherCs, Seq("window", "city_id", "season"), "left")
      .join(flightsCs, Seq("window", "city_id", "season"), "left")

  /** city_percentiles: p10/p90 of 5 stats per (window, city_id), i.e.
    * across that city's seasons (kafka_to_metrics.py:458-472). */
  def cityPercentiles(csJoin: DataFrame, exact: Boolean): DataFrame = {
    def p(c: String, q: Double, as: String) = pct(col(c), q, exact).as(as)
    csJoin.groupBy(col("window"), col("city_id"))
      .agg(
        p("adr_avg", 0.10, "adr_p10"), p("adr_avg", 0.90, "adr_p90"),
        p("bookings", 0.10, "book_p10"), p("bookings", 0.90, "book_p90"),
        p("precip_avg", 0.10, "rain_p10"), p("precip_avg", 0.90, "rain_p90"),
        p("cancel_rate", 0.10, "cancel_p10"), p("cancel_rate", 0.90, "cancel_p90"),
        p("delay_avg", 0.10, "delay_p10"), p("delay_avg", 0.90, "delay_p90"))
  }

  /** Indexes + final score projection (kafka_to_metrics.py:478-520):
    * score = 100*(0.40*price + 0.35*weather + 0.15*crowd + 0.10*reliab). */
  def score(csWithP: DataFrame): DataFrame = {
    val priceIdx = lit(1.0) - minmaxNorm(col("adr_avg"), col("adr_p10"), col("adr_p90"))
    val crowdIdx = lit(1.0) - minmaxNorm(col("bookings"), col("book_p10"), col("book_p90"))
    val tempPenalty = least(abs(coalesce(col("t_avg"), lit(21.0)) - lit(21.0)) / lit(12.0), lit(1.0))
    val rainNorm = minmaxNorm(coalesce(col("precip_avg"), lit(0.0)), col("rain_p10"), col("rain_p90"))
    val weatherIdx = lit(1.0) - (lit(0.6) * tempPenalty + lit(0.4) * rainNorm)
    val cancelNorm = minmaxNorm(coalesce(col("cancel_rate"), lit(0.0)), col("cancel_p10"), col("cancel_p90"))
    val delayNorm = minmaxNorm(coalesce(col("delay_avg"), lit(0.0)), col("delay_p10"), col("delay_p90"))
    val reliabIdx = lit(1.0) - (lit(0.7) * cancelNorm + lit(0.3) * delayNorm)
    val seasonScore = lit(100.0) * (lit(0.40) * priceIdx + lit(0.35) * weatherIdx +
      lit(0.15) * crowdIdx + lit(0.10) * reliabIdx)
    csWithP.select(
      col("window"), col("city_id"), col("season"), col("city_name"),
      priceIdx.as("price_idx"), weatherIdx.as("weather_idx"),
      crowdIdx.as("crowd_idx"), reliabIdx.as("reliab_idx"),
      seasonScore.as("season_score"))
  }

  /** Full pipeline from enriched (season-tagged) event frames.
    *
    * `roundStats`: when set, intermediate stats and percentiles are rounded
    * to that many decimals before scoring. Production runs leave it None;
    * oracle-checked runs use Some(6) so both engines' final score arithmetic
    * sees identical inputs (double avg/percentile results differ across
    * engines in the last ulps, which can flip a rounded 4-decimal output). */
  def apply(bookings: DataFrame, weather: DataFrame, flights: DataFrame,
            dur: String, bookingTs: String = "event_time",
            exact: Boolean = false, roundStats: Option[Int] = None): DataFrame = {
    // scale-multiply rounding (round(x*10^n)/10^n) so an oracle engine
    // computing the same expression on the same doubles rounds identically —
    // round(x, n) implementations disagree on exact .5*10^-n boundaries.
    def r(df: DataFrame, cols: Seq[String]): DataFrame = roundStats match {
      case Some(n) =>
        val p = math.pow(10, n)
        cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c) * p) / p))
      case None => df
    }
    val b = r(bookingStats(bookings, bookingTs, dur), Seq("adr_avg"))
    val w = r(weatherStats(weather, "event_time", dur), Seq("t_avg", "precip_avg"))
    val f = r(flightStats(flights, "event_time", dur), Seq("delay_avg", "cancel_rate"))
    val cs = joinStats(b, w, f)
    val p = r(cityPercentiles(cs, exact),
      Seq("adr_p10", "adr_p90", "book_p10", "book_p90", "rain_p10", "rain_p90",
        "cancel_p10", "cancel_p90", "delay_p10", "delay_p90"))
    score(cs.join(p, Seq("window", "city_id"), "left"))
  }
}
