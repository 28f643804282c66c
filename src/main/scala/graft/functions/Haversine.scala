package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Great-circle distance (km) — the imputation donor-discovery radius
  * search (`R/imputeMissing.R:543-556` in YukonWRB/AquaCache uses
  * `ST_DWithin`/`ST_Distance`; lat/lon + haversine replaces PostGIS).
  * Pure column expression: codegen'd, usable in join conditions.
  */
object Haversine {
  val EarthRadiusKm = 6371.0

  def km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** DuckDB-side fragment computing the identical expression. */
  def kmSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2 * ${EarthRadiusKm} * asin(sqrt(" +
      s"pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2)))"
}
