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
}
