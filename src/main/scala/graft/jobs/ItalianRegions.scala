package graft.jobs

/** Italian administrative-geography lookup tables for the cities dimension
  * build: province (admin2) code → region name, with the GeoNames admin1
  * code (zero-padded "01".."20") as fallback tier.
  *
  * These are factual data tables mirroring the reference's mapping
  * (clean_cities_geonames.py:19-87) — the cascade semantics
  * (admin2 → admin1 → "(Unknown)") live in
  * [[DimensionBuild.buildCities]].
  */
object ItalianRegions {

  val Unknown = "(Unknown)"

  /** 107 province codes → region (clean_cities_geonames.py:19-68). */
  val provinceToRegion: Map[String, String] = {
    def r(region: String)(codes: String*): Seq[(String, String)] =
      codes.map(_ -> region)
    (r("Piemonte")("AL", "AT", "BI", "CN", "NO", "TO", "VB", "VC") ++
      r("Valle d'Aosta/Vallée d'Aoste")("AO") ++
      r("Lombardia")("BG", "BS", "CO", "CR", "LC", "LO", "MB", "MI", "MN", "PV", "SO", "VA") ++
      r("Trentino-Alto Adige/Südtirol")("BZ", "TN") ++
      r("Veneto")("BL", "PD", "RO", "TV", "VE", "VR", "VI") ++
      r("Friuli-Venezia Giulia")("GO", "PN", "TS", "UD") ++
      r("Liguria")("GE", "IM", "SP", "SV") ++
      r("Emilia-Romagna")("BO", "FC", "FE", "MO", "PR", "PC", "RA", "RE", "RN") ++
      r("Toscana")("AR", "FI", "GR", "LI", "LU", "MS", "PI", "PT", "PO", "SI") ++
      r("Umbria")("PG", "TR") ++
      r("Marche")("AN", "AP", "FM", "MC", "PU") ++
      r("Lazio")("FR", "LT", "RI", "RM", "VT") ++
      r("Abruzzo")("AQ", "CH", "PE", "TE") ++
      r("Molise")("CB", "IS") ++
      r("Campania")("AV", "BN", "CE", "NA", "SA") ++
      r("Puglia")("BA", "BT", "BR", "FG", "LE", "TA") ++
      r("Basilicata")("MT", "PZ") ++
      r("Calabria")("CS", "CZ", "KR", "RC", "VV") ++
      r("Sicilia")("AG", "CL", "CT", "EN", "ME", "PA", "RG", "SR", "TP") ++
      r("Sardegna")("CA", "NU", "OR", "OT", "OG", "VS", "SS", "SU")).toMap
  }

  /** GeoNames admin1 code ("01".."20", "00") → region
    * (clean_cities_geonames.py:71-77). */
  val admin1ToRegion: Map[String, String] = Map(
    "01" -> "Piemonte", "02" -> "Valle d'Aosta/Vallée d'Aoste",
    "03" -> "Lombardia", "04" -> "Trentino-Alto Adige/Südtirol",
    "05" -> "Veneto", "06" -> "Friuli-Venezia Giulia", "07" -> "Liguria",
    "08" -> "Emilia-Romagna", "09" -> "Toscana", "10" -> "Umbria",
    "11" -> "Marche", "12" -> "Lazio", "13" -> "Abruzzo", "14" -> "Molise",
    "15" -> "Campania", "16" -> "Puglia", "17" -> "Basilicata",
    "18" -> "Calabria", "19" -> "Sicilia", "20" -> "Sardegna",
    "00" -> Unknown)

  /** EN→IT aliases for major city names, applied to NORMALIZED keys
    * (rebuild_and_merge_cities_it.py:74-79): an English-keyed source row
    * ("rome") must still find the Italian-keyed GeoNames row ("roma") in
    * the staged merge. */
  val enItAlias: Map[String, String] = Map(
    "rome" -> "roma", "milan" -> "milano", "naples" -> "napoli",
    "turin" -> "torino", "florence" -> "firenze", "venice" -> "venezia",
    "genoa" -> "genova", "padua" -> "padova", "leghorn" -> "livorno",
    "syracuse" -> "siracusa")
}
