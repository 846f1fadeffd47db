package graft

import org.apache.spark.sql.functions._
import graft.functions.Exprs._

class ExprsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).collect()(0).get(0).asInstanceOf[T]

  test("minmaxNorm clamps to [0,1] and degenerates to 0.5") {
    assert(eval1[Double](minmaxNorm(lit(5.0), lit(0.0), lit(10.0))) == 0.5)
    assert(eval1[Double](minmaxNorm(lit(-3.0), lit(0.0), lit(10.0))) == 0.0)
    assert(eval1[Double](minmaxNorm(lit(42.0), lit(0.0), lit(10.0))) == 1.0)
    // degenerate range (hi-lo <= 1e-9) -> 0.5 (kafka_to_metrics.py:479)
    assert(eval1[Double](minmaxNorm(lit(7.0), lit(3.0), lit(3.0))) == 0.5)
  }

  test("seasonOf is total over all 12 months") {
    val got = (1 to 12).map { m =>
      eval1[String](seasonOf(lit(f"2024-$m%02d-15").cast("date")))
    }
    assert(got == Seq("winter", "winter", "spring", "spring", "spring",
      "summer", "summer", "summer", "autumn", "autumn", "autumn", "winter"))
  }

  test("haversineKm: Rome-Milan ~ 477 km") {
    val d = eval1[Double](haversineKm(lit(41.9028), lit(12.4964), lit(45.4642), lit(9.1900)))
    assert(math.abs(d - 477.0) < 5.0)
    assert(eval1[Double](haversineKm(lit(41.9), lit(12.5), lit(41.9), lit(12.5))) == 0.0)
  }

  test("localeNumeric parses Italian-formatted numbers (istat_utils.py:39-45)") {
    val cases = Seq(
      "1.234,5" -> 1234.5, "1.234.567,89" -> 1234567.89,
      " 12,3 " -> 12.3, "7" -> 7.0, "1 234,5" -> 1234.5)
    cases.foreach { case (in, want) =>
      assert(eval1[Double](localeNumeric(lit(in))) == want, s"for '$in'")
    }
    assert(eval1[Any](localeNumeric(lit("n/a"))) == null)
  }

  test("normalizeName strips accents, case, prefixes (merge_istat_cities.py:9-22)") {
    assert(normalizeNameFn("Comune di Forlì-Cesena") == "forli cesena")
    assert(normalizeNameFn("  ROMA ") == "roma")
    assert(normalizeNameFn("L'Aquila") == "l aquila")
    assert(normalizeNameFn(null) == null)
  }

  test("starsNorm extracts 0-5 ratings (build_hotels_yaml.py:83-88)") {
    assert(eval1[Double](starsNorm(lit("hotel 4*"))) == 4.0)
    assert(eval1[Double](starsNorm(lit("3.5"))) == 3.5)
    assert(eval1[Any](starsNorm(lit("no rating"))) == null)
  }

  test("wkt point parse (build_hotels_yaml.py:45-54)") {
    assert(eval1[Double](wktLon(lit("POINT (12.49 41.89)"))) == 12.49)
    assert(eval1[Double](wktLat(lit("POINT (12.49 41.89)"))) == 41.89)
    assert(eval1[Double](wktLat(lit("POINT(-7.1 -33.5)"))) == -33.5)
  }

  test("spendEur coalesce semantics (kafka_to_metrics.py:195-198)") {
    val df = Seq(
      (Some(100.0), Some(2), Some(3), 600.0),
      (None, Some(2), Some(3), 0.0),
      (Some(100.0), None, None, 100.0)
    ).toDF("adr", "rooms", "nights", "want")
    val got = df.select(spendEur(col("adr"), col("rooms"), col("nights")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
