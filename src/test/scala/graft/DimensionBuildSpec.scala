package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.jobs.DimensionBuild

/** §3.3 end-to-end: messy raw fixtures (tab-separated GeoNames, sniffed-
  * separator ISTAT with locale numerics and macro-territory noise, OSM
  * hotels with WKT/star text, OurAirports with duplicate IATA) through the
  * full dimension-build pipeline. */
class DimensionBuildSpec extends SparkSpec {

  private lazy val dir: Path = Files.createTempDirectory("dimbuild")
  private def write(name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  private lazy val job = new DimensionBuild(spark)

  // 19-column GeoNames TSV: Roma + Milano populated places, one duplicate
  // lower-pop Roma row, one non-P row, one zero-pop row
  private lazy val geonames = write("IT.txt", Seq(
    Seq("3169070", "Napoli", "Napoli", "", "40.85", "14.27", "P", "PPLA", "IT", "", "04",
      "NA", "", "", "950000", "", "17", "Europe/Rome", "2024-01-01"),
    Seq("3165524", "Roma", "Roma", "", "41.90", "12.49", "P", "PPLC", "IT", "", "07",
      "RM", "", "", "2870000", "", "21", "Europe/Rome", "2024-01-01"),
    Seq("9999991", "Roma", "Roma", "", "41.95", "12.40", "P", "PPL", "IT", "", "07",
      "RM", "", "", "1200", "", "21", "Europe/Rome", "2024-01-01"),
    Seq("3173435", "Milano", "Milano", "", "45.46", "9.19", "P", "PPLA", "IT", "", "09",
      "MI", "", "", "1350000", "", "120", "Europe/Rome", "2024-01-01"),
    Seq("8888888", "Tiberisola", "Tiberisola", "", "41.89", "12.47", "T", "ISL", "IT", "", "07",
      "RM", "", "", "0", "", "15", "Europe/Rome", "2024-01-01"),
    Seq("7777777", "Ghosttown", "Ghosttown", "", "42.00", "13.00", "P", "PPL", "IT", "", "07",
      "RM", "", "", "0", "", "0", "Europe/Rome", "2024-01-01")
  ).map(_.mkString("\t")).mkString("\n"))

  // ISTAT households: ';'-sniffed, quoted messy headers, locale numerics,
  // macro-territory row (IT) and an older year to drop
  private lazy val istatHouseholds = write("istat_households.csv",
    """" Territorio ";"Codice Metrica";" Valore ";"Anno"
      |IT;population_census;59.000.000,0;2021
      |Roma;population_census;2.800.000,0;2011
      |Roma;population_census;2.750.000,5;2021
      |Roma;households;1.300.000,0;2021
      |Milano;population_census;1.340.000,0;2021
      |Milano;households;700.000,0;2021
      |Napoli;households;n/d;2021
      |""".stripMargin)

  // ISTAT homes: '|'-sniffed
  private lazy val istatHomes = write("istat_homes.csv",
    """Territorio|Codice Metrica|Valore|Anno
      |Roma|dwellings_total|1.500.000,0|2021
      |Roma|dwellings_occupied|1.200.000,0|2021
      |Milano|dwellings_total|800.000,0|2021
      |Milano|dwellings_occupied|760.000,0|2021
      |""".stripMargin)

  // OSM hotels: two Roma hotels 90 m apart with the same normalized name
  // (radius dedup drops one), one Milano hotel via name join, one hotel with
  // an unknown city name rescued by NN fallback near Napoli
  private lazy val osmHotels = write("hotels.csv",
    """osm_id,name,stars,addr_city,wkt
      |h1,Hotel Tevere,hotel 4*,Roma,POINT (12.4900 41.9000)
      |h2,HOTEL TEVERE,4,Roma,POINT (12.4900 41.9008)
      |h3,Grand Milano,★★★ 3,Milano,POINT (9.1900 45.4600)
      |h4,Albergo Vesuvio,2.5,Borgo Ignoto,POINT (14.2700 40.8500)
      |h5,No Coords Inn,3,Roma,
      |""".stripMargin)

  // OurAirports: duplicate IATA resolved by type rank, non-IT row dropped,
  // bad IATA dropped
  private lazy val airports = write("airports.csv",
    """ident,type,name,latitude_deg,longitude_deg,iso_country,municipality,iata_code
      |LIRF,large_airport,Fiumicino,41.8,12.25,IT,Roma,FCO
      |LIRX,small_airport,Fiumicino Old,41.81,12.26,IT,Roma,FCO
      |LIML,medium_airport,Linate,45.45,9.28,IT,Milano,LIN
      |LFPG,large_airport,Charles de Gaulle,49.0,2.55,FR,Paris,CDG
      |LIXX,small_airport,NoIata,42.0,13.0,IT,Nowhere,X1
      |""".stripMargin)

  private lazy val cities = job.buildCities(geonames)

  test("cities base: P-class filter, pop>0, keep-richest per (name, admin1)") {
    val got = cities.select("city_id", "city_name", "population").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("3165524", "Roma", 2870000L), // duplicate lower-pop Roma dropped
      ("3173435", "Milano", 1350000L),
      ("3169070", "Napoli", 950000L)))
  }

  test("cities base: region cascade admin2 -> admin1 fallback -> (Unknown)") {
    // tier 1: province code wins even when admin1 disagrees (Napoli row
    // carries admin1=04/Trentino but NA -> Campania)
    val regions = cities.select("city_name", "region").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(regions("Napoli") === "Campania")
    assert(regions("Roma") === "Lazio")
    assert(regions("Milano") === "Lombardia")
    // tier 2 + 3: unknown admin2 falls back to admin1 (4 -> zero-padded 04);
    // both unknown -> "(Unknown)"
    val geo3 = write("IT3.txt", Seq(
      Seq("2000001", "Bolzano", "Bolzano", "", "46.49", "11.35", "P", "PPLA", "IT", "", "4",
        "ZZ", "", "", "107000", "", "262", "Europe/Rome", "2024-01-01"),
      Seq("2000002", "Atlantide", "Atlantide", "", "40.00", "10.00", "P", "PPL", "IT", "", "99",
        "", "", "", "1000", "", "0", "Europe/Rome", "2024-01-01")
    ).map(_.mkString("\t")).mkString("\n"))
    val got = job.buildCities(geo3).select("city_name", "region").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("Bolzano") === "Trentino-Alto Adige/Südtirol")
    assert(got("Atlantide") === "(Unknown)")
  }

  test("cities base: 3+-char admin1 maps to (Unknown), mixed '4'/'04' dedup together") {
    val geo4 = write("IT4.txt", Seq(
      // 3-char admin1, unknown admin2: zfill must NOT truncate '123' to '12'
      // (which is Lazio) — it falls through to (Unknown)
      Seq("3000001", "Lunga", "Lunga", "", "42.00", "12.00", "P", "PPL", "IT", "", "123",
        "ZZ", "", "", "5000", "", "10", "Europe/Rome", "2024-01-01"),
      // same normalized name under raw '4' and pre-padded '04': the reference
      // pads before dedup, so these are ONE key — keep-richest survives
      Seq("3000002", "Bolzano", "Bolzano", "", "46.49", "11.35", "P", "PPLA", "IT", "", "4",
        "ZZ", "", "", "107000", "", "262", "Europe/Rome", "2024-01-01"),
      Seq("3000003", "Bolzano", "Bolzano", "", "46.49", "11.36", "P", "PPL", "IT", "", "04",
        "ZZ", "", "", "9000", "", "262", "Europe/Rome", "2024-01-01")
    ).map(_.mkString("\t")).mkString("\n"))
    val got = job.buildCities(geo4).collect()
    val lunga = got.find(_.getAs[String]("city_name") == "Lunga").get
    assert(lunga.getAs[String]("region") === "(Unknown)")
    assert(lunga.getAs[String]("admin1_code") === "123") // untouched, not lpad-mangled
    val bolzano = got.filter(_.getAs[String]("city_name") == "Bolzano")
    assert(bolzano.length === 1, "mixed '4'/'04' admin1 must dedup as one key")
    assert(bolzano.head.getAs[String]("city_id") === "3000002") // richer row wins
    assert(bolzano.head.getAs[String]("admin1_code") === "04") // normalized output
  }

  test("ISTAT clean: target year is the newest COMMON year, not the newest overall") {
    // metric A has {2019, 2021}, metric B only {2019} -> intersection {2019}
    val src = write("istat_common_year.csv",
      """Territorio;Codice Metrica;Valore;Anno
        |Roma;resident_population;2.800.000,0;2019
        |Roma;resident_population;2.850.000,0;2021
        |Roma;commuting_population;600.000,0;2019
        |""".stripMargin)
    val out = job.cleanIstat(src,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("resident_population", "commuting_population"))
    val roma = out.filter(col("norm_name") === "roma").collect().head
    assert(roma.getAs[Double]("resident_population") === 2800000.0) // 2019 value
    assert(roma.getAs[Double]("commuting_population") === 600000.0)
  }

  test("ISTAT clean: no common year falls back to the newest overall year") {
    val src = write("istat_disjoint_years.csv",
      """Territorio;Codice Metrica;Valore;Anno
        |Roma;resident_population;2.800.000,0;2011
        |Roma;commuting_population;600.000,0;2021
        |""".stripMargin)
    val out = job.cleanIstat(src,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("resident_population", "commuting_population"))
    val roma = out.filter(col("norm_name") === "roma").collect().head
    assert(roma.isNullAt(roma.fieldIndex("resident_population"))) // 2011 dropped
    assert(roma.getAs[Double]("commuting_population") === 600000.0) // 2021 kept
  }

  test("ISTAT clean: fallback year census spans ALL metrics, not just requested ones") {
    // requested metrics have disjoint years {2011} / {2015}; the file's
    // newest year (2021) belongs only to a non-requested metric. The
    // reference's all_years_seen census still picks 2021 (dropping both
    // requested metrics' rows), so ours must too.
    val src = write("istat_fallback_any_metric.csv",
      """Territorio;Codice Metrica;Valore;Anno
        |Roma;resident_population;2.800.000,0;2011
        |Roma;commuting_population;600.000,0;2015
        |Roma;tourist_arrivals;1,0;2021
        |""".stripMargin)
    val out = job.cleanIstat(src,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("resident_population", "commuting_population"))
    val roma = out.filter(col("norm_name") === "roma").collect().head
    assert(roma.isNullAt(roma.fieldIndex("resident_population")))
    assert(roma.isNullAt(roma.fieldIndex("commuting_population")))
  }

  test("ISTAT clean: sniffed separator, fuzzy columns, locale numerics, latest year, pivot") {
    val hh = job.cleanIstat(istatHouseholds,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("population_census", "households"))
    val roma = hh.filter(col("norm_name") === "roma").collect().head
    // 2011 row dropped (latest year = 2021); locale "2.750.000,5" parsed
    assert(roma.getAs[Double]("population_census") === 2750000.5)
    assert(roma.getAs[Double]("households") === 1300000.0)
    // macro territory IT filtered out
    assert(hh.filter(col("norm_name") === "it").count() === 0)
    // malformed numeric -> null, not failure
    val napoli = hh.filter(col("norm_name") === "napoli").collect().head
    assert(napoli.isNullAt(napoli.fieldIndex("households")))
  }

  test("enrichment: staged joins fill payloads, ratios and int coercion applied") {
    val hh = job.cleanIstat(istatHouseholds,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("population_census", "households"))
    val homes = job.cleanIstat(istatHomes,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("dwellings_total", "dwellings_occupied"))
    val enriched = job.enrichCities(cities, hh, homes)
    val roma = enriched.filter(col("city_id") === "3165524").collect().head
    assert(roma.getAs[Long]("population") === 2750000L) // census overrides GeoNames
    assert(roma.getAs[Long]("households") === 1300000L)
    assert(roma.getAs[Double]("occupied_share") === 0.8)
    assert(roma.getAs[Double]("avg_family_size") === 2.12)
    // Napoli has no homes data -> worst row in the quality report
    val report = job.cityQualityReport(enriched).collect()
    assert(report.head.getAs[String]("city_id") === "3169070")
    assert(report.head.getAs[Int]("missing_count") >= 2)
  }

  test("enrichment: EN-keyed rows land via the alias stage; manual map rescues the rest") {
    // households keyed with ENGLISH names — only the EN↔IT alias stage can
    // match them against the Italian GeoNames keys; "Melan" is a spelling
    // no key stage resolves and needs the manual-overrides table
    val hhEn = write("istat_households_en.csv",
      """Territorio;Codice Metrica;Valore;Anno
        |Rome;population_census;2.750.000,5;2021
        |Rome;households;1.300.000,0;2021
        |Melan;households;700.000,0;2021
        |""".stripMargin)
    val hh = job.cleanIstat(hhEn,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("population_census", "households"))
    val homes = job.cleanIstat(istatHomes,
      Seq("territorio"), Seq("codicemetrica"), Seq("valore"), Seq("anno"),
      Seq("dwellings_total", "dwellings_occupied"))
    // no manual map: "rome" reaches "roma" through the alias right key,
    // "melan" matches nothing (households coalesces to 0)
    val noMap = job.enrichCities(cities, hh, homes)
    val romaNoMap = noMap.filter(col("city_id") === "3165524").collect().head
    assert(romaNoMap.getAs[Long]("households") === 1300000L)
    assert(romaNoMap.getAs[Long]("population") === 2750000L)
    val milanoNoMap = noMap.filter(col("city_id") === "3173435").collect().head
    assert(milanoNoMap.getAs[Long]("households") === 0L)
    // manual (source_name, target_name) override: Melan -> Milano rescues
    // the otherwise-unmatched row, and the alias matches are untouched
    import spark.implicits._
    val manual = Seq(("Melan", "Milano")).toDF("source_name", "target_name")
    val withMap = job.enrichCities(cities, hh, homes, Some(manual))
    val milano = withMap.filter(col("city_id") === "3173435").collect().head
    assert(milano.getAs[Long]("households") === 700000L)
    val roma = withMap.filter(col("city_id") === "3165524").collect().head
    assert(roma.getAs[Long]("households") === 1300000L)
  }

  test("hotels: WKT/stars parse, name join, NN fallback, radius dedup, surrogate ids") {
    val hotels = job.buildHotels(osmHotels, cities)
    val rows = hotels.collect()
    val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
    // radius dedup: the two Tevere hotels (90 m apart, same norm name) -> 1
    assert(rows.count(_.getAs[String]("city_id") == "3165524") === 1)
    assert(byName.contains("Hotel Tevere") || byName.contains("HOTEL TEVERE"))
    // stars text parsed
    assert(byName.get("Grand Milano").map(_.getAs[Double]("stars_num")).contains(3.0))
    // NN fallback: unknown city resolved to nearest (Napoli)
    assert(byName.get("Albergo Vesuvio").map(_.getAs[String]("city_name")).contains("Napoli"))
    // no-coordinate row filtered
    assert(!byName.contains("No Coords Inn"))
    // surrogate id shape {city}-{slug}-{rank}
    rows.foreach(r => assert(
      r.getAs[String]("hotel_id").matches("""\d+-[a-z0-9-]+-\d{6}"""),
      r.getAs[String]("hotel_id")))
  }

  test("hotels: ambiguous city name across provinces does not multiply hotel rows") {
    // two "Borgo" cities in different admin1 regions + one Borgo hotel
    val geo2 = write("IT2.txt", Seq(
      Seq("1000001", "Borgo", "Borgo", "", "41.00", "12.00", "P", "PPL", "IT", "", "07",
        "RM", "", "", "50000", "", "10", "Europe/Rome", "2024-01-01"),
      Seq("1000002", "Borgo", "Borgo", "", "45.00", "9.00", "P", "PPL", "IT", "", "09",
        "MI", "", "", "9000", "", "10", "Europe/Rome", "2024-01-01")
    ).map(_.mkString("\t")).mkString("\n"))
    val osm2 = write("hotels2.csv",
      """osm_id,name,stars,addr_city,wkt
        |hb1,Hotel Borgo,3,Borgo,POINT (12.0000 41.0000)
        |""".stripMargin)
    val cities2 = job.buildCities(geo2)
    assert(cities2.count() === 2) // both survive (different admin1)
    val hotels2 = job.buildHotels(osm2, cities2)
    assert(hotels2.count() === 1, "name join must not fan out on ambiguous names")
    // resolved to the higher-population Borgo
    assert(hotels2.collect().head.getAs[String]("city_id") === "1000001")
  }

  test("DimensionBuildJob end-to-end: raw fixtures through every stage to sinks") {
    val out = Files.createTempDirectory("dimjob").toString
    val enriched = graft.jobs.DimensionBuildJob.run(spark,
      geonames, istatHouseholds, istatHomes, osmHotels, airports, out)
    assert(enriched.count() === 3)
    // CSV sinks exist and carry the fixed column order
    def headerOf(dir: String): String = {
      val f = Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
        .filter(_.endsWith(".csv")).min
      scala.io.Source.fromFile(f).getLines().next()
    }
    assert(headerOf(s"$out/cities_enriched").startsWith("city_id,city_name,norm_name,admin1_code,region"))
    assert(headerOf(s"$out/airports_it") === "airport_code,ident,name,type,lat,lon,city_name")
    assert(headerOf(s"$out/city_quality").endsWith("missing_count"))
    // YAML: schema header + one entry per surviving hotel
    val yaml = Files.readString(java.nio.file.Paths.get(s"$out/hotels.yaml"))
    assert(yaml.startsWith("schema_version: 1\nhotels:\n"))
    assert(yaml.split("\n").count(_.matches("""  - .*""")) === 3) // Tevere deduped
  }

  test("airports: IT + IATA filters, duplicate IATA resolved by type rank") {
    val got = job.buildAirports(airports).collect()
      .map(r => (r.getAs[String]("airport_code"), r.getAs[String]("ident"))).toSet
    assert(got === Set(("FCO", "LIRF"), ("LIN", "LIML")))
  }
}
