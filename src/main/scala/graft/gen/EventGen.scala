package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** §2C: deterministic re-implementation of the reference's event producers
  * (producers/orchestrator_producers.py) as distributed Spark generators for
  * fixtures and demos.
  *
  * The reference uses unseeded random/np.random (SURVEY.md §7.4.7); here ALL
  * randomness derives from the portable 60-bit hash of (seed, entity-id,
  * tag) — generation is deterministic regardless of partitioning or
  * parallelism, and any engine can regenerate the same rows. Distribution
  * notes:
  *  - uniforms: hash60 / 2^60;
  *  - gaussians: Box-Muller over two uniforms;
  *  - exponential: inverse CDF;
  *  - Poisson (booking volume): normal approximation N(λ, √λ) clamped ≥ 1
  *    (the reference clamps with max(1, ·) as well; exact Poisson sampling
  *    is iterative and not worth a UDF for fixture data).
  */
object EventGen {

  private val Two60 = math.pow(2.0, 60).toLong

  /** Deterministic uniform in [0, 1) keyed by (seed, id, tag). */
  private def u(seed: Long, id: Column, tag: String): Column =
    Hashing.hash60(concat_ws("_", lit(seed), id, lit(tag))).cast("double") / lit(Two60.toDouble)

  /** Box-Muller standard gaussian from two tagged uniforms. */
  private def gauss(seed: Long, id: Column, tag: String): Column =
    sqrt(lit(-2.0) * log(lit(1.0) - u(seed, id, tag + "_u1"))) *
      cos(lit(2.0 * math.Pi) * u(seed, id, tag + "_u2"))

  /** Synthetic city dimension: (city_id, city_name, pop, lat, lon).
    * Distributed spark.range — no driver-side data. */
  def cities(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val id = col("id")
    spark.range(n.toLong).select(
      concat(lit("C"), lpad(id.cast("string"), 4, "0")).as("city_id"),
      concat(lit("city_"), id.cast("string")).as("city_name"),
      (lit(5000.0) + u(seed, id, "pop") * 2995000.0).cast("long").as("pop"),
      (u(seed, id, "lat") * 10.0 + 36.0).as("lat"),
      (u(seed, id, "lon") * 12.0 + 7.0).as("lon"))
  }

  /** C1: seasonality factor — ×1.4 in peak months, ×1.15 weekends,
    * ×(1 + log1p(pop)/12) (orchestrator_producers.py:41-51). */
  def seasonality(month: Column, isWeekend: Column, pop: Column): Column =
    when(month.isin(6, 7, 8, 12), 1.4).otherwise(1.0) *
      when(isWeekend, 1.15).otherwise(1.0) *
      (lit(1.0) + log1p(pop) / 12.0)

  /** C2: lead-time mixture — 35% business Exp(mean 5), else leisure
    * max(1, N(30, 20)) (orchestrator_producers.py:34-39). */
  def leadTimeDays(seed: Long, id: Column): Column =
    when(u(seed, id, "lt_mix") < 0.35,
      greatest(lit(1.0), -log(lit(1.0) - u(seed, id, "lt_exp")) * 5.0))
      .otherwise(greatest(lit(1.0), gauss(seed, id, "lt_n") * 20.0 + 30.0))
      .cast("int")

  /** C3: weather events — one per (city, day)
    * (orchestrator_producers.py:122-161). */
  def weather(spark: SparkSession, cityDim: DataFrame, startDate: String,
              days: Int, seed: Long = 42L): DataFrame = {
    val d = spark.range(days.toLong).select(
      date_add(to_date(lit(startDate)), col("id").cast("int")).as("day"))
    val rows = cityDim.crossJoin(d)
    val id = concat_ws("|", col("city_id"), col("day"))
    val m = month(col("day"))
    val tBase = lit(5.0) + m.cast("double") / 12.0 * 20.0 + gauss(seed, id, "t") * 3.0
    val precip = greatest(lit(0.0),
      gauss(seed, id, "p") * 5.0 + (lit(2.0) + (lit(12.0) - m.cast("double")) / 6.0))
    rows.select(
      id.as("key"),
      col("city_id"), col("city_name"),
      date_format(col("day"), "yyyy-MM-dd'T'00:00:00'Z'").as("event_ts"),
      round(tBase - (lit(2.0) + u(seed, id, "dt1") * 4.0), 1).as("t_min"),
      round(tBase + (lit(2.0) + u(seed, id, "dt2") * 4.0), 1).as("t_max"),
      round(precip, 1).as("precip_mm"),
      round(u(seed, id, "w") * 60.0, 1).as("wind_kph"),
      round(lit(40.0) + u(seed, id, "h") * 55.0, 0).as("humidity"),
      when(precip > 10.0, "storm").when(precip > 2.0, "rain").otherwise("clear")
        .as("condition"))
  }

  /** C4: flight events — expected arrivals scale with pop·seasonality;
    * delay N(5,10) + weather·60; cancel prob 0.01 + weather_factor·0.5,
    * cancelled ⇒ delay null (orchestrator_producers.py:164-230). */
  def flights(spark: SparkSession, cityDim: DataFrame, startDate: String,
              days: Int, flightsPerCityDay: Int = 3, seed: Long = 42L): DataFrame = {
    val d = spark.range(days.toLong).select(
      date_add(to_date(lit(startDate)), col("id").cast("int")).as("day"))
    val f = spark.range(flightsPerCityDay.toLong).select(col("id").as("fno"))
    val rows = cityDim.crossJoin(d).crossJoin(f)
    val id = concat_ws("|", col("city_id"), col("day"), col("fno"))
    val weekend = dayofweek(col("day")).isin(1, 7)
    val wFactor = u(seed, id, "wf") * 0.2
    val delay = gauss(seed, id, "dl") * 10.0 + 5.0 + wFactor * 60.0
    val cancelled = u(seed, id, "cx") < (lit(0.01) + wFactor * 0.5)
    rows.select(
      concat_ws("|", col("city_id"), col("fno")).as("key"),
      concat(lit("FL"), (Hashing.hash60(id) % 100000).cast("string")).as("flight_id"),
      col("city_id").as("destination_city_id"),
      concat(lit("AP"), col("city_id")).as("destination_iata"),
      concat(lit("AP"),
        pmod(Hashing.hash60(concat(id, lit("org"))), lit(50)).cast("string")).as("origin_iata"),
      date_format(col("day"), "yyyy-MM-dd'T'12:00:00'Z'").as("event_ts"),
      greatest(lit(1.0),
        col("pop").cast("double") / 2000.0 *
          seasonality(month(col("day")), weekend, col("pop")) / 100.0)
        .cast("int").as("expected_arrivals"),
      when(cancelled, "cancelled").otherwise("arrived").as("status"),
      when(cancelled, lit(null).cast("int")).otherwise(round(delay, 0).cast("int"))
        .as("delay_min"),
      (lit(120) + (Hashing.hash60(concat(id, lit("seats"))) % 120)).cast("int").as("seats"))
  }

  /** C5: booking events — volume ~ Poisson(pop/1e5·10·s) via normal approx,
    * adr = max(30, stars·30 + N(0,20) + 5s), nights ∈ {1,1,2,2,3,4},
    * channel weighted 0.4/0.5/0.1, 0.5% cancelled
    * (orchestrator_producers.py:232-277). */
  def bookings(spark: SparkSession, cityDim: DataFrame, startDate: String,
               days: Int, maxPerCityDay: Int = 8, seed: Long = 42L): DataFrame = {
    val d = spark.range(days.toLong).select(
      date_add(to_date(lit(startDate)), col("id").cast("int")).as("day"))
    val b = spark.range(maxPerCityDay.toLong).select(col("id").as("bno"))
    val rows = cityDim.crossJoin(d).crossJoin(b)
    val cdId = concat_ws("|", col("city_id"), col("day"))
    val id = concat_ws("|", cdId, col("bno"))
    val weekend = dayofweek(col("day")).isin(1, 7)
    val s = seasonality(month(col("day")), weekend, col("pop"))
    val lambda = greatest(lit(0.5), col("pop").cast("double") / 100000.0 * 10.0 * s / 10.0)
    // Poisson(λ) ≈ round(N(λ, √λ)) clamped to [1, maxPerCityDay]
    val volume = greatest(lit(1.0),
      least(lit(maxPerCityDay.toDouble), gauss(seed, cdId, "vol") * sqrt(lambda) + lambda))
    val stars = (lit(1) + pmod(Hashing.hash60(concat(id, lit("st"))), lit(5))).cast("double")
    val lead = leadTimeDays(seed, id)
    rows
      .filter(col("bno") < volume.cast("long"))
      .select(
        concat_ws("|", col("city_id"),
          date_format(date_add(col("day"), lead), "yyyy-MM-dd")).as("key"),
        col("city_id"), col("city_name"),
        date_format(col("day"), "yyyy-MM-dd'T'09:00:00'Z'").as("event_ts"),
        date_format(date_add(col("day"), lead), "yyyy-MM-dd").as("checkin_date"),
        element_at(array(lit(1), lit(1), lit(2), lit(2), lit(3), lit(4)),
          (pmod(Hashing.hash60(concat(id, lit("n"))), lit(6)) + 1).cast("int")).as("nights"),
        (lit(1) + pmod(Hashing.hash60(concat(id, lit("g"))), lit(4))).cast("int").as("guests"),
        (lit(1) + pmod(Hashing.hash60(concat(id, lit("r"))), lit(2))).cast("int").as("rooms"),
        greatest(lit(30.0),
          round(stars * 30.0 + gauss(seed, id, "adr") * 20.0 + s * 5.0, 2)).as("adr_proxy"),
        when(u(seed, id, "ch") < 0.4, "direct")
          .when(u(seed, id, "ch") < 0.9, "ota").otherwise("corporate").as("channel"),
        when(u(seed, id, "cx") < 0.005, "cancelled").otherwise("confirmed").as("status"),
        lead.as("lead_time_days"))
  }

  /** C6/C7: timewarped emission — N simulated days rendered as a
    * Kafka-shaped frame (key, JSON value, ts) via EventSources.fromBatch.
    * The realtime clock mode is [[RealtimeClock]] + per-day slices of the
    * same generators (equivalence proven in GenSpec). */
  def toKafkaFrame(events: DataFrame): DataFrame =
    graft.sources.EventSources.fromBatch(events, keyExpr = "key",
      tsExpr = "to_timestamp(event_ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")")

  /** C6 realtime clock mode (orchestrator_producers.py:279-386): the
    * simulated clock runs at `timewarp`× wall speed (floored at 1×, as the
    * reference's `max(1.0, timewarp)`), and each poll emits the CURRENT
    * simulated day exactly once — `if last_emitted_date != sim_date` in the
    * reference loop, which also means a poll gap longer than one simulated
    * day SKIPS days rather than backfilling them; this class reproduces
    * that contract bit for bit. Wall time is INJECTED (elapsed seconds
    * since the loop started), not read from a system clock, so tests and
    * production pacing loops share the same date arithmetic and the
    * emission cadence is provable without sleeping.
    *
    * Per-day emission equals the timewarp batch rendering because every
    * generator column derives from hash(entity-id, calendar day): a
    * one-day slice generated at `day` is row-identical to the `day` rows
    * of a multi-day batch (GenSpec "realtime clock mode"). */
  final class RealtimeClock(simStart: String, timewarp: Double) {
    private val start = java.time.LocalDate.parse(simStart)
    private var lastEmitted: Option[java.time.LocalDate] = None
    /** Simulated date after `elapsedSec` real seconds. */
    def simDate(elapsedSec: Double): java.time.LocalDate = {
      require(elapsedSec >= 0.0, s"elapsed wall time must be >= 0: $elapsedSec")
      start.plusDays((elapsedSec * math.max(1.0, timewarp) / 86400.0).toLong)
    }
    /** The simulated day due for emission at this poll — None if the
      * current simulated day was already emitted. */
    def poll(elapsedSec: Double): Option[java.time.LocalDate] = {
      val d = simDate(elapsedSec)
      if (lastEmitted.contains(d)) None
      else { lastEmitted = Some(d); Some(d) }
    }
  }
}
