package graft.tools

/** Writes the sample dimension-source files the QUICKSTART feeds to
  * DimensionBuildJob — the same five messy inputs DimensionBuildSpec
  * gates (GeoNames 19-col TSV, two locale-numeric ISTAT CSVs with
  * different sniffed separators, OSM hotels with WKT + star soup,
  * OurAirports with dupes/foreign rows), shaped after the reference's
  * real downloads (scripts/build_dimensions.py). Dev/demo fixture only
  * — real deployments point DimensionBuildJob at the actual files.
  *
  * Usage: runMain graft.tools.FixtureGen [outDir]  (default ./fixtures)
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("fixtures")
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    def write(name: String, content: String): Unit = {
      java.nio.file.Files.writeString(dir.resolve(name), content)
      println(s"[fixturegen] $outDir/$name")
    }

    write("IT.txt", Seq(
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

    write("istat_households.csv",
      """" Territorio ";"Codice Metrica";" Valore ";"Anno"
        |IT;population_census;59.000.000,0;2021
        |Roma;population_census;2.800.000,0;2011
        |Roma;population_census;2.750.000,5;2021
        |Roma;households;1.300.000,0;2021
        |Milano;population_census;1.340.000,0;2021
        |Milano;households;700.000,0;2021
        |Napoli;households;n/d;2021
        |""".stripMargin)

    write("istat_homes.csv",
      """Territorio|Codice Metrica|Valore|Anno
        |Roma|dwellings_total|1.500.000,0|2021
        |Roma|dwellings_occupied|1.200.000,0|2021
        |Milano|dwellings_total|800.000,0|2021
        |Milano|dwellings_occupied|760.000,0|2021
        |""".stripMargin)

    write("hotels.csv",
      """osm_id,name,stars,addr_city,wkt
        |h1,Hotel Tevere,hotel 4*,Roma,POINT (12.4900 41.9000)
        |h2,HOTEL TEVERE,4,Roma,POINT (12.4900 41.9008)
        |h3,Grand Milano,★★★ 3,Milano,POINT (9.1900 45.4600)
        |h4,Albergo Vesuvio,2.5,Borgo Ignoto,POINT (14.2700 40.8500)
        |h5,No Coords Inn,3,Roma,
        |""".stripMargin)

    write("airports.csv",
      """ident,type,name,latitude_deg,longitude_deg,iso_country,municipality,iata_code
        |LIRF,large_airport,Fiumicino,41.8,12.25,IT,Roma,FCO
        |LIRX,small_airport,Fiumicino Old,41.81,12.26,IT,Roma,FCO
        |LIML,medium_airport,Linate,45.45,9.28,IT,Milano,LIN
        |LFPG,large_airport,Charles de Gaulle,49.0,2.55,FR,Paris,CDG
        |LIXX,small_airport,NoIata,42.0,13.0,IT,Nowhere,X1
        |""".stripMargin)
  }
}
