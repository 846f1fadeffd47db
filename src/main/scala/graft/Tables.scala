package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access + tourism-schema analog frames.
  *
  * The driver's testdata (TESTDATA.md) is a TPC-H-ish star schema plus an
  * `events` stream table. The correctness gate runs SparkEntry.queries over
  * these tables with a DuckDB oracle; to exercise the REAL tourism operators
  * (graft.operators) we map `events` onto the reference's booking/weather/
  * flight schemas deterministically (pure column expressions, so the same
  * mapping is expressible in the oracle SQL).
  */
object Tables {

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize an events frame's `ts` to TimestampType regardless of how the
    * parquet stored it. Two formats exist in the wild: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects; sessions set
    * spark.sql.legacy.parquet.nanosAsLong so it surfaces as int64 nanos and
    * we convert — integer `div`, double division would lose precision) and
    * plain timestamp[us], which is already the type we want. Truncation to
    * micros floors, matching the oracle's floor(epoch(ts)) convention. Works
    * on batch and streaming frames alike (only consults the schema), so the
    * gate's streaming harness MUST route through this same function — an
    * unconditional conversion in either path breaks when the testdata
    * regenerates with the other format. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] parquet surfaces as TIMESTAMP_NTZ, which
        // withWatermark rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
        // cast to TIMESTAMP — value-identical under the UTC session
        // timezone every graft session pins, and the type r1-r5 produced
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(t(spark, sfDir, "events"))
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")

  /** Deterministic "season" analog: the events table spans one month, so the
    * real month->season mapping would collapse to a single season; bucket by
    * day-of-month mod 4 instead (same CASE-WHEN shape as
    * kafka_to_metrics.py:315-323, SQL-expressible for the oracle). */
  def seasonAnalog(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val b = pmod(dayofmonth(ts), lit(4))
    when(b === 0, "winter").when(b === 1, "spring")
      .when(b === 2, "summer").otherwise("autumn")
  }

  /** events(purchase) -> booking-shaped frame (event_time, city_id,
    * city_name, season, adr_proxy). */
  def bookingsAnalog(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(
        col("ts").as("event_time"),
        col("user_id").cast("string").as("city_id"),
        concat(lit("city_"), col("user_id")).as("city_name"),
        seasonAnalog(col("ts")).as("season"),
        col("value").as("adr_proxy"))

  /** events(view) -> weather-shaped frame (event_time, city_id, season,
    * t_min, t_max, precip_mm). */
  def weatherAnalog(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "view")
      .select(
        col("ts").as("event_time"),
        col("user_id").cast("string").as("city_id"),
        seasonAnalog(col("ts")).as("season"),
        (col("value") / 10.0).as("t_min"),
        (col("value") / 5.0).as("t_max"),
        (greatest(col("value") - 150.0, lit(0.0)) / 10.0).as("precip_mm"))

  /** events(click|error) -> flight-shaped frame (event_time, city_id, season,
    * status, delay_min); error events are "cancelled" flights with null delay
    * (FIXTURES.md §1.2: delay_min null when cancelled). */
  def flightsAnalog(ev: DataFrame): DataFrame =
    ev.filter(col("event_type").isin("click", "error"))
      .select(
        col("ts").as("event_time"),
        col("user_id").cast("string").as("city_id"),
        seasonAnalog(col("ts")).as("season"),
        when(col("event_type") === "error", "cancelled").otherwise("arrived").as("status"),
        when(col("event_type") === "error", lit(null))
          .otherwise(floor(col("value")).cast("int")).as("delay_min"))
}
