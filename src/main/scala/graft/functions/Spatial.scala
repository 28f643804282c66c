package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-geometry primitives for the location-code path — the
  * reference resolves a station's code prefix from the NHN basin
  * polygon containing it (`R/generateACLocationCode.R:1-9` in
  * YukonWRB/AquaCache, PostGIS `ST_Contains`).
  *
  * Spark-first: polygons are WKT string columns; parsing and the
  * even-odd ray cast are composed from native higher-order functions
  * (`transform`/`filter`/`size`) — no UDF, no external geometry
  * library, executes as Catalyst expressions on any executor.
  */
object Spatial {

  /** `POLYGON ((x y, x y, ...))` (outer ring) ->
    * `array<struct<x double, y double>>`.
    */
  def wktPolygonVertices(wkt: Column): Column = {
    val body = regexp_replace(wkt, "(?i)POLYGON\\s*\\(\\(|\\)\\)", "")
    transform(
      split(body, ",\\s*"),
      p =>
        struct(
          element_at(split(trim(p), "\\s+"), 1).cast("double").as("x"),
          element_at(split(trim(p), "\\s+"), 2).cast("double").as("y")
        )
    )
  }

  /** WKT geometry-type prefix: 'POINT' | 'LINESTRING' | 'POLYGON' |
    * ... (uppercased), null when the string has no leading word.
    */
  def wktGeomType(wkt: Column): Column = {
    val t = upper(regexp_extract(trim(wkt), "^([A-Za-z]+)", 1))
    when(t === "", lit(null).cast("string")).otherwise(t)
  }

  /** Polygon validity per the reference's insert gate
    * (`R/insertACVector.R:256-259` runs terra::is.valid before
    * insert; this is the portable subset): returns the FIRST failed
    * rule as a reason string, or null when valid.
    *
    *   - not_polygon: WKT type isn't POLYGON
    *   - open_ring: first vertex != last vertex
    *   - too_few_vertices: fewer than 4 vertices incl. closure
    *   - bad_coordinates: non-numeric / missing x or y
    *   - out_of_range: |lon| > 180 or |lat| > 90
    *   - duplicate_vertex: consecutive identical vertices
    *
    * Pure Catalyst higher-order functions — validates a billion rows
    * with no UDF.
    */
  def polygonValidity(wkt: Column): Column = {
    val verts = wktPolygonVertices(wkt)
    val n = size(verts)
    val badCoord = exists(verts, v => v.getField("x").isNull || v.getField("y").isNull)
    val outOfRange = exists(
      verts,
      v => abs(v.getField("x")) > 180.0 || abs(v.getField("y")) > 90.0
    )
    val dupConsecutive = exists(
      sequence(lit(1), n - 1),
      i => element_at(verts, i) === element_at(verts, i + 1)
    )
    when(wktGeomType(wkt) =!= "POLYGON" || wktGeomType(wkt).isNull, "not_polygon")
      .when(n < 4, "too_few_vertices")
      .when(badCoord, "bad_coordinates")
      .when(!(element_at(verts, 1) === element_at(verts, -1)), "open_ring")
      .when(outOfRange, "out_of_range")
      .when(dupConsecutive, "duplicate_vertex")
  }

  /** Even-odd ray cast: true when (px, py) is inside the ring given as
    * `array<struct<x, y>>` (closed or open — the closing edge is
    * counted once). Crossing test for edge (x1,y1)->(x2,y2):
    * `(y1 > py) != (y2 > py) && px < (x2-x1)*(py-y1)/(y2-y1) + x1`.
    */
  def pointInPolygon(px: Column, py: Column, vertices: Column): Column = {
    val n = size(vertices)
    // drop a duplicated closing vertex so the wrap-around edge isn't doubled
    val ring = when(
      element_at(vertices, 1) === element_at(vertices, -1),
      slice(vertices, lit(1), n - 1)
    ).otherwise(vertices)
    val m = size(ring)
    val crossings = size(
      filter(
        // edge i: ring[i] -> ring[i % m + 1] (1-based, wraps)
        transform(
          sequence(lit(1), m),
          i =>
            struct(
              element_at(ring, i).getField("x").as("x1"),
              element_at(ring, i).getField("y").as("y1"),
              element_at(ring, (i % m) + 1).getField("x").as("x2"),
              element_at(ring, (i % m) + 1).getField("y").as("y2")
            )
        ),
        e => {
          val x1 = e.getField("x1"); val y1 = e.getField("y1")
          val x2 = e.getField("x2"); val y2 = e.getField("y2")
          ((y1 > py) =!= (y2 > py)) &&
          (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
        }
      )
    )
    crossings % 2 === 1
  }
}
