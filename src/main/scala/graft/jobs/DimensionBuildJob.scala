package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession
import graft.operators.EtlOps

/** End-to-end batch dimension-build CLI — the library twin of the
  * reference's script chain (README.md:297-310: clean_cities_geonames →
  * clean_istat_* → rebuild_and_merge_cities_it → build_hotels_yaml →
  * clean_airports_it):
  *
  * {{{
  * sbt "runMain graft.jobs.DimensionBuildJob \
  *   <geonamesTsv> <istatHouseholdsCsv> <istatHomesCsv> <osmHotelsCsv> \
  *   <airportsCsv> <outDir>"
  * }}}
  *
  * Outputs under `<outDir>`: `cities_enriched/` (CSV), `city_quality/`
  * (CSV), `airports_it/` (CSV), `hotels.yaml` (schema_version'd YAML,
  * driver-rendered — dimension-sized by construction). Every stage is the
  * DataFrame pipeline tested in DimensionBuildSpec; this main is only
  * wiring + sinks. */
object DimensionBuildJob {

  /** Reference ISTAT header candidates (clean_istat_abitazioni.py:18-22),
    * resolved fuzzily per EtlOps.findColumn. */
  val TerritoryCands = Seq("Territorio", "Denominazione territorio")
  val MetricCands = Seq("TIPO_DATO_CENS_POP", "Tipo dato", "Codice Metrica")
  val ValueCands = Seq("Value", "Valore")
  val YearCands = Seq("TIME", "Anno")

  /** Runs the full build; returns the enriched cities frame (for tests). */
  def run(spark: SparkSession, geonamesTsv: String, istatHouseholdsCsv: String,
          istatHomesCsv: String, osmHotelsCsv: String, airportsCsv: String,
          outDir: String): DataFrame = {
    val job = new DimensionBuild(spark)
    val cities = job.buildCities(geonamesTsv)
    val households = job.cleanIstat(istatHouseholdsCsv, TerritoryCands,
      MetricCands, ValueCands, YearCands, Seq("population_census", "households"))
    val homes = job.cleanIstat(istatHomesCsv, TerritoryCands,
      MetricCands, ValueCands, YearCands, Seq("dwellings_total", "dwellings_occupied"))
    val enriched = job.enrichCities(cities, households, homes)

    EtlOps.writeOrderedCsv(enriched,
      Seq("city_id", "city_name", "norm_name", "admin1_code", "region", "lat",
        "lon", "population", "households", "dwellings_total",
        "dwellings_occupied", "occupied_share", "avg_family_size"),
      s"$outDir/cities_enriched")
    EtlOps.writeOrderedCsv(job.cityQualityReport(enriched),
      Seq("city_id", "missing_households", "missing_dwellings_total",
        "missing_occupied_share", "missing_count"), s"$outDir/city_quality")
    EtlOps.writeOrderedCsv(job.buildAirports(airportsCsv),
      Seq("airport_code", "ident", "name", "type", "lat", "lon", "city_name"),
      s"$outDir/airports_it")

    // hotels: dimension-sized by construction (reference emits one YAML
    // document); rows ordered by surrogate id for a stable file
    val hotels = job.buildHotels(osmHotelsCsv, cities)
    val rows = hotels.orderBy("hotel_id").collect().map { r =>
      hotels.columns.map(c =>
        c -> Option(r.getAs[Any](c)).map(String.valueOf).orNull).toMap
    }.toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/hotels.yaml"),
      EtlOps.yamlRender("hotels", schemaVersion = 1, rows))
    enriched
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 6, "usage: DimensionBuildJob <geonamesTsv> " +
      "<istatHouseholdsCsv> <istatHomesCsv> <osmHotelsCsv> <airportsCsv> <outDir>")
    val spark = GraftSession.build("graft-dimension-build")
    try run(spark, args(0), args(1), args(2), args(3), args(4), args(5))
    finally spark.stop()
  }
}
