package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {

  private def inside(wkt: String, px: Double, py: Double): Boolean = {
    import spark.implicits._
    Seq((px, py, wkt))
      .toDF("px", "py", "wkt")
      .select(
        Spatial
          .pointInPolygon(col("px"), col("py"), Spatial.wktPolygonVertices(col("wkt")))
          .as("in")
      )
      .head()
      .getBoolean(0)
  }

  private val box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
  private val openBox = "POLYGON ((0 0, 10 0, 10 10, 0 10))" // no closing vertex
  private val triangle = "POLYGON ((0 0, 10 0, 10 10, 0 0))"
  private val concave = "POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))"

  test("ray cast: box, open ring, triangle hypotenuse, concave notch") {
    assert(inside(box, 5, 5))
    assert(!inside(box, 15, 5))
    assert(!inside(box, 5, -1))
    // closed and unclosed rings are equivalent
    assert(inside(openBox, 5, 5) && !inside(openBox, 15, 5))
    // below the hypotenuse y = x is inside
    assert(inside(triangle, 6, 3))
    assert(!inside(triangle, 3, 6))
    // the notch of the concave polygon is outside
    assert(inside(concave, 2, 4))
    assert(!inside(concave, 5, 8))
  }

  test("wkt parsing handles case and spacing variants") {
    assert(inside("polygon((0 0,10 0,10 10,0 10,0 0))", 1, 1))
    assert(inside("POLYGON (( 0 0 , 10 0 , 10 10 , 0 10 ))", 9.5, 9.5))
  }
}
