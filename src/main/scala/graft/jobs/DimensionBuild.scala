package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exprs._
import graft.operators.{EtlOps, RadiusDedup}

/** §3.3: the batch dimension-build pipeline — GeoNames + ISTAT + OSM +
  * OurAirports raw files → cities_enriched / hotels_clean / airports_it —
  * wired from the §2B operators (reference run order: README.md:297-310;
  * scripts/rebuild_and_merge_cities_it.py, build_hotels_yaml.py,
  * clean_airports_it.py).
  *
  * Every stage is a distributed DataFrame transform; the only driver-side
  * work is delimiter sniffing (head bytes) and column resolution (schema).
  * Dimension tables are small by nature, but nothing here depends on that
  * except the explicitly-broadcast join sides.
  */
class DimensionBuild(spark: SparkSession) {

  /** GeoNames cities base: filter populated places, coerce, normalize name,
    * region cascade (admin2 province code → admin1 code → "(Unknown)",
    * clean_cities_geonames.py:19-87), keep-richest dedup per
    * (norm name, admin1)
    * (clean_cities_geonames.py:77-90, rebuild_and_merge_cities_it.py:108-142).
    * The lookups ride as map literals (try_element_at) — pure codegen'd
    * expressions, no join. */
  def buildCities(geonamesTsv: String): DataFrame = {
    val geoCols = Seq("geonameid", "name", "asciiname", "alternatenames", "lat", "lon",
      "feature_class", "feature_code", "country_code", "cc2", "admin1_code",
      "admin2_code", "admin3_code", "admin4_code", "population", "elevation",
      "dem", "timezone", "modification_date")
    val raw = spark.read
      .option("delimiter", "\t").option("header", "false")
      .option("mode", "DROPMALFORMED")
      .csv(geonamesTsv)
      .toDF(geoCols: _*)
    raw
      .filter(col("feature_class") === "P")
      .filter(col("feature_code").rlike("^PPL"))
      .withColumn("population", col("population").try_cast("long"))
      .withColumn("lat", col("lat").try_cast("double"))
      .withColumn("lon", col("lon").try_cast("double"))
      .filter(col("population") > 0)
      .withColumn("norm_name", normalizeName(col("name")))
      // zfill semantics, not lpad: pad only when shorter than 2 (Spark's
      // lpad TRUNCATES longer codes — a 3-char admin1 would silently map to
      // a wrong region instead of falling through to Unknown). Normalized
      // once here so the region lookup, the dedup key, and the output column
      // all see the same value (the reference pads before dedup, so mixed
      // '4'/'04' inputs must dedup together).
      .withColumn("admin1_code",
        when(length(col("admin1_code")) < 2, lpad(col("admin1_code"), 2, "0"))
          .otherwise(col("admin1_code")))
      .withColumn("region",
        coalesce(
          try_element_at(typedLit(ItalianRegions.provinceToRegion), col("admin2_code")),
          try_element_at(typedLit(ItalianRegions.admin1ToRegion), col("admin1_code")),
          lit(ItalianRegions.Unknown)))
      .transform(df => EtlOps.keepFirstPerKey(df,
        Seq(col("norm_name"), col("admin1_code")),
        Seq(col("population").desc, col("geonameid").asc)))
      .select(col("geonameid").as("city_id"), col("name").as("city_name"),
        col("norm_name"), col("asciiname"), col("admin1_code"), col("region"),
        col("lat"), col("lon"), col("population"))
  }

  /** One ISTAT source: sniffed separator, header/cell normalization, fuzzy
    * column resolution, locale numerics, latest *common* year across the
    * requested metrics (max of the per-metric year-set intersection, overall
    * max as fallback — clean_istat_commuting.py:108-156), long→wide pivot
    * (istat_utils.py, clean_istat_abitazioni.py). Returns (norm_name key,
    * one column per metric code). */
  def cleanIstat(path: String, territoryCands: Seq[String], metricCands: Seq[String],
                 valueCands: Seq[String], yearCands: Seq[String],
                 metrics: Seq[String]): DataFrame = {
    val raw = EtlOps.trimCells(EtlOps.normalizeHeaders(EtlOps.readSniffedCsv(spark, path)))
    def resolve(cands: Seq[String], what: String): String =
      EtlOps.findColumn(raw.columns.toSeq, cands)
        .getOrElse(sys.error(s"unresolvable $what column among ${raw.columns.mkString(",")}"))
    val terr = resolve(territoryCands, "territory")
    val metric = resolve(metricCands, "metric")
    val value = resolve(valueCands, "value")
    val year = resolve(yearCands, "year")
    val typed = raw
      .withColumn("__value", localeNumeric(col(value)))
      .withColumn("__year", col(year).try_cast("int"))
      .filter(!col(terr).rlike("^IT[A-Z]{0,2}\\d{0,2}$")) // drop macro territories
    EtlOps.pivotWide(
      EtlOps.latestCommonYearFilter(typed, col("__year"), col(metric), metrics),
      Seq(normalizeName(col(terr)).as("norm_name")),
      metric, metrics, max(col("__value")))
  }

  /** EN↔IT alias pass on a normalized key: map hit or identity — a pure
    * map-literal expression (try_element_at), no join, codegen'd. */
  def aliasIt(c: Column): Column =
    coalesce(try_element_at(typedLit(ItalianRegions.enItAlias), c), c)

  /** robust_merge: staged fallback joins of the cities base against ISTAT
    * payloads, fill-only-missing (rebuild_and_merge_cities_it.py:175-246).
    * Full reference key fidelity: 4 left keys (norm city name, its EN↔IT
    * alias, norm asciiname, its alias) × 2 right keys (norm territory name,
    * its alias), tried in the reference's lk-major order (:216-224) — an
    * English-keyed ISTAT row ("rome") still lands on the Italian GeoNames
    * row ("roma") and vice versa. `manualMap` is the optional operator-
    * curated (source_name, target_name) overrides table (:239-246): it
    * REWRITES the right-side normalized key before the staged joins, so an
    * otherwise-unmatchable territory spelling is rescued without touching
    * operator code. Precondition (same as the reference's pandas merges):
    * right keys unique per stage — ISTAT prep pivots per norm_name, and a
    * source carrying BOTH spellings of one city would multiply rows in
    * either engine. Then derived fallback columns and int coercion
    * (:261-267, final_cleaning.py). */
  def enrichCities(cities: DataFrame, households: DataFrame, homes: DataFrame,
                   manualMap: Option[DataFrame] = None): DataFrame = {
    def rewriteKey(right: DataFrame): DataFrame = manualMap match {
      case None => right
      case Some(m) =>
        val mm = m.select(normalizeName(col("source_name")).as("__src"),
          normalizeName(col("target_name")).as("__dst"))
        right.join(broadcast(mm), col("norm_name") === col("__src"), "left")
          .withColumn("norm_name", coalesce(col("__dst"), col("norm_name")))
          .drop("__src", "__dst")
    }
    val leftKeys = Seq(
      col("norm_name"), aliasIt(col("norm_name")),
      normalizeName(col("asciiname")), aliasIt(normalizeName(col("asciiname"))))
    val rightKeys = Seq(col("norm_name"), aliasIt(col("norm_name")))
    def staged(left: DataFrame, right: DataFrame, payload: Seq[String]): DataFrame =
      EtlOps.stagedFallbackJoin(left, rewriteKey(right),
          for { lk <- leftKeys; rk <- rightKeys } yield lk -> rk,
          payload)
        .drop("matched_stage")
    val withHouseholds = staged(cities, households, Seq("population_census", "households"))
    val withHomes = staged(withHouseholds, homes, Seq("dwellings_total", "dwellings_occupied"))
    val occupiedRatio = col("dwellings_occupied") / nullif(col("dwellings_total"), lit(0.0))
    withHomes
      // guard: least() SKIPS nulls (least(null, 1.0) = 1.0), so clip only
      // when the ratio exists — otherwise a city with no dwellings data
      // would get a fabricated share of 1.0
      .withColumn("occupied_share",
        when(occupiedRatio.isNotNull, round(least(occupiedRatio, lit(1.0)), 3)))
      .withColumn("avg_family_size",
        round(col("population_census") / nullif(col("households"), lit(0.0)), 2))
      .withColumn("population",
        coalesce(col("population_census").cast("long"), col("population")))
      .withColumn("households", EtlOps.intCoerce(coalesce(col("households"), lit(0.0))))
      .drop("population_census")
  }

  /** Data-quality report over the enriched cities (B20). */
  def cityQualityReport(enriched: DataFrame, topN: Int = 500): DataFrame =
    EtlOps.qualityReport(enriched,
      Seq("households", "dwellings_total", "occupied_share"), col("city_id"), topN)

  /** OSM hotels: WKT coords, stars normalization, city resolution by
    * normalized name with nearest-neighbor fallback, 0.2 km greedy radius
    * dedup, surrogate ids (build_hotels_yaml.py). */
  def buildHotels(osmCsv: String, cities: DataFrame): DataFrame = {
    val raw = EtlOps.trimCells(EtlOps.normalizeHeaders(EtlOps.readSniffedCsv(spark, osmCsv)))
    val parsed = raw
      .withColumn("lon", wktLon(col("wkt")))
      .withColumn("lat", wktLat(col("wkt")))
      .withColumn("stars_num", starsNorm(col("stars")))
      .withColumn("norm_city", normalizeName(col("addr_city")))
      .filter(col("lat").isNotNull && col("lon").isNotNull)
    // norm_name is unique only per (norm_name, admin1) after buildCities —
    // same-named towns in different provinces would multiply hotel rows
    // through the name join. Disambiguate: keep the highest-population city
    // per norm_name for pass 1 (pass 2's NN fallback resolves by geometry
    // anyway).
    val cityDim = EtlOps.keepFirstPerKey(
      cities.select(col("city_id"), col("city_name"), col("norm_name"),
        col("population"), col("lat").as("c_lat"), col("lon").as("c_lon")),
      Seq(col("norm_name")), Seq(col("population").desc, col("city_id").asc))
      .drop("population")
    // pass 1: exact normalized-name join
    val byName = parsed.join(broadcast(cityDim), col("norm_city") === col("norm_name"), "left")
    val matched = byName.filter(col("city_id").isNotNull)
    // pass 2: nearest city by squared degree distance for the rest
    // (build_hotels_yaml.py:228-258)
    val unmatched = byName.filter(col("city_id").isNull)
      .select(parsed.columns.map(col).toIndexedSeq: _*)
    val nn = EtlOps.nearestNeighborJoin(
      unmatched.withColumn("hid", col("osm_id")), cityDim,
      col("lat"), col("lon"), col("c_lat"), col("c_lon"), Seq("hid"), "city_id")
    val rescued = unmatched
      .join(nn.select(col("hid").as("osm_id"), col("nn_city_id").as("city_id")), Seq("osm_id"))
      .join(broadcast(cityDim.select(col("city_id"), col("city_name"))), Seq("city_id"), "left")
    val resolved = matched.select(
      col("osm_id"), col("name"), col("stars_num"), col("lat"), col("lon"),
      col("city_id"), col("city_name"))
      .unionByName(rescued.select(
        col("osm_id"), col("name"), col("stars_num"), col("lat"), col("lon"),
        col("city_id"), col("city_name")))
    // 0.2 km greedy dedup within (city, normalized hotel name)
    val withGrp = resolved
      .withColumn("grp", concat_ws("|", col("city_id"), normalizeName(col("name"))))
      .withColumn("id", abs(xxhash64(col("osm_id"))))
    val kept = RadiusDedup(
      withGrp.select(col("grp"), col("id"), col("lat"), col("lon")), 0.2)
    val deduped = withGrp.join(kept, Seq("grp", "id"), "left_semi")
    deduped.withColumn("hotel_id",
      EtlOps.surrogateId(col("city_id"),
        regexp_replace(normalizeName(col("name")), " ", "-"), col("id")))
      .select("hotel_id", "name", "stars_num", "city_id", "city_name", "lat", "lon")
  }

  /** OurAirports: domain filters + rank dedup on duplicate IATA codes
    * (clean_airports_it.py). */
  def buildAirports(airportsCsv: String): DataFrame = {
    val raw = EtlOps.trimCells(EtlOps.normalizeHeaders(EtlOps.readSniffedCsv(spark, airportsCsv)))
    val typed = raw
      .withColumn("lat", col("latitude_deg").try_cast("double"))
      .withColumn("lon", col("longitude_deg").try_cast("double"))
      .filter(col("iso_country") === "IT")
      .filter(col("iata_code").rlike("^[A-Z]{3}$"))
      .filter(col("lat").between(-90, 90) && col("lon").between(-180, 180))
      .withColumn("rank",
        when(col("type") === "large_airport", 3)
          .when(col("type") === "medium_airport", 2).otherwise(1))
    EtlOps.keepFirstPerKey(typed, Seq(col("iata_code")),
        Seq(col("rank").desc, col("ident").asc))
      .select(col("iata_code").as("airport_code"), col("ident"), col("name"),
        col("type"), col("lat"), col("lon"), col("municipality").as("city_name"))
  }
}
