package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GriddedAdapterSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def writeFixture(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("grid").toString
    // 8x4 grids at 00/06/12 on two days
    val cells = for {
      d <- Seq("2024-01-01", "2024-01-02")
      h <- Seq(0, 6, 12)
      x <- 0 until 8
      y <- 0 until 4
    } yield (x, y, (x * 10 + y).toDouble, ts(f"$d $h%02d:00:00"), "t2m")
    cells.toDF("x", "y", "value", "valid_ts", "band").write.mode("overwrite").parquet(dir)
    dir
  }

  test("fetch: window + availability clamp + hrs filter + clip, tiles out") {
    val file = writeFixture()
    val tiles = GriddedAdapter.fetch(
      spark,
      Map(
        "file" -> file, "series_id" -> "7", "hrs" -> "0,6",
        "x_min" -> "0", "x_max" -> "4", "y_min" -> "0", "y_max" -> "4"
      ),
      from = ts("2024-01-01 00:00:00"),
      to = ts("2024-03-01 00:00:00"),
      // horizon cuts off day 2 entirely
      availabilityHorizon = ts("2024-01-01 23:00:00"),
      tileW = 4, tileH = 4
    )
    val rows = tiles.collect()
    // day 1 only, hours 0 and 6 only, left half only -> 2 valid_ts x 1 tile
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("series_id") == 7L))
    assert(rows.forall(_.getAs[String]("raster_type") == "reanalysis"))
    val cells = graft.operators.Raster.cells(tiles.drop("raster_type"))
    assert(cells.count() == 2 * 16)
    assert(cells.agg(max("x")).head().getInt(0) == 3) // clip applied
  }

  test("window entirely past the availability horizon yields empty, not an error") {
    val file = writeFixture()
    val tiles = GriddedAdapter.fetch(
      spark, Map("file" -> file, "series_id" -> "7"),
      from = ts("2024-06-01 00:00:00"), to = ts("2024-06-02 00:00:00"),
      availabilityHorizon = ts("2024-01-05 00:00:00")
    )
    assert(tiles.isEmpty)
  }

  test("hrs validation mirrors the reference") {
    assert(GriddedAdapter.parseHrs("0,6,12,18") == Seq(0, 6, 12, 18))
    assertThrows[IllegalArgumentException](GriddedAdapter.parseHrs("0,24"))
    assertThrows[IllegalArgumentException](GriddedAdapter.parseHrs("1.5"))
    assertThrows[IllegalArgumentException](GriddedAdapter.parseHrs("six"))
  }
}
