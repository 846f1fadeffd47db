package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** B25: greedy spatial dedup within a radius (build_hotels_yaml.py:261-283).
  *
  * Per group, iterate rows in ascending `id` order; keep a row only if it is
  * farther than `radiusKm` (haversine) from every already-kept row in the
  * same group. Order-dependent greedy selection is inherently sequential per
  * group — not expressible as a pure relational op — so this is the one
  * `flatMapGroups` in the engine (SURVEY.md §7.3). Groups are processed in
  * parallel (shuffle on the group key); within-group work is O(n·kept) over
  * group-local data only, so scale is governed by group size (hotels per
  * city ≈ 10³ in the reference), not table size.
  */
object RadiusDedup {

  // top-level visibility required: Spark's codegen'd deserializer cannot
  // access a private nested case class
  case class Pt(grp: String, id: Long, lat: Double, lon: Double)

  private def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.0088
    val sLat = math.sin(math.toRadians(lat2 - lat1) / 2)
    val sLon = math.sin(math.toRadians(lon2 - lon1) / 2)
    val a = sLat * sLat +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * (sLon * sLon)
    r * 2 * math.asin(math.sqrt(a))
  }

  /** Input needs columns (grp: String, id: Long, lat, lon: Double); returns
    * the kept (grp, id) pairs. */
  def apply(df: DataFrame, radiusKm: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Pt] = df.select(
      col("grp").cast("string"), col("id").cast("long"),
      col("lat").cast("double"), col("lon").cast("double")).as[Pt]
    ds.groupByKey(_.grp)
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toSeq.sortBy(_.id)
        val kept = scala.collection.mutable.ArrayBuffer.empty[Pt]
        sorted.foreach { p =>
          if (kept.forall(k => haversineKm(k.lat, k.lon, p.lat, p.lon) > radiusKm))
            kept += p
        }
        kept.map(p => (p.grp, p.id))
      }
      .toDF("grp", "id")
  }
}
