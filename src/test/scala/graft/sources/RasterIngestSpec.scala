package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RasterIngestSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def catalog = {
    import spark.implicits._
    Seq(
      (1L, "reanalysis", ts("2024-02-01 00:00:00"), None: Option[java.sql.Timestamp], true),
      (2L, "reanalysis", ts("2024-02-01 00:00:00"), None: Option[java.sql.Timestamp], true),
      (3L, "forecast", ts("2024-02-01 00:00:00"), Some(ts("2024-01-31 12:00:00")), true),
      (4L, "forecast", ts("2024-02-01 00:00:00"), None: Option[java.sql.Timestamp], true),
      (5L, "snapshot", ts("2024-02-01 00:00:00"), None: Option[java.sql.Timestamp], true),
      (6L, "reanalysis", ts("2024-02-01 00:00:00"), None: Option[java.sql.Timestamp], false)
    ).toDF("raster_series_id", "raster_type", "end_datetime", "last_issue", "active")
  }

  test("fetchPlan resolves next_instant per raster type like getNewRasters") {
    import spark.implicits._
    val storeRef = Seq(
      // series 1: a PRELIMINARY raster inside the 30-day lookback ->
      // refetch from one second before it
      (1L, ts("2024-01-20 00:00:00"), ts("2024-01-21 00:00:00"), Some("PRELIMINARY")),
      (1L, ts("2024-01-25 00:00:00"), ts("2024-01-26 00:00:00"), None: Option[String]),
      // series 2: no prelim -> last valid_to + 1
      (2L, ts("2024-01-28 00:00:00"), ts("2024-01-29 00:00:00"), None: Option[String]),
      // series 2: an OLD prelim outside the lookback window: ignored
      (2L, ts("2023-11-01 00:00:00"), ts("2023-11-02 00:00:00"), Some("PRELIMINARY"))
    ).toDF("raster_series_id", "valid_from", "valid_to", "flag")

    val plan = RasterIngest.fetchPlan(catalog, storeRef)
    val by = plan.collect().map(r => r.getLong(0) -> r.getAs[java.sql.Timestamp]("fetch_from")).toMap
    assert(by(1L) == ts("2024-01-19 23:59:59")) // prelim - 1s
    assert(by(2L) == ts("2024-01-29 00:00:01")) // last valid_to + 1s
    assert(by(3L) == ts("2024-01-31 12:00:00")) // forecast: last_issue
    assert(by(4L) == ts("2024-02-01 00:00:01")) // forecast, no issue: end + 1s
    assert(by(5L) == ts("2024-02-01 00:00:01")) // other: end + 1s
    assert(!by.contains(6L)) // inactive filtered
  }

  test("mergeFetched: reanalysis replaces from first incoming valid; forecasts supersede") {
    import spark.implicits._
    def tile(s: Long, t: String, issue: String, valid: String) =
      (s, "b1", t, ts(issue), ts(valid), 0, 0)
    val existing = Seq(
      tile(1L, "reanalysis", "2024-01-21 00:00:00", "2024-01-20 00:00:00"), // prelim era: replaced
      tile(1L, "reanalysis", "2024-01-10 00:00:00", "2024-01-09 00:00:00"), // older: kept
      tile(3L, "forecast", "2024-01-30 00:00:00", "2024-02-01 00:00:00"),   // superseded below
      tile(3L, "forecast", "2024-01-30 00:00:00", "2024-02-02 00:00:00")    // not re-covered: kept
    ).toDF("series_id", "band", "raster_type", "issue_ts", "valid_ts", "tile_x", "tile_y")
    val incoming = Seq(
      tile(1L, "reanalysis", "2024-02-05 00:00:00", "2024-01-20 00:00:00"), // final replacing prelim
      tile(3L, "forecast", "2024-01-31 00:00:00", "2024-02-01 00:00:00")    // newer issue
    ).toDF("series_id", "band", "raster_type", "issue_ts", "valid_ts", "tile_x", "tile_y")

    val merged = RasterIngest.mergeFetched(existing, incoming)
    val kept = merged.select("series_id", "issue_ts", "valid_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(kept == Set(
      (1L, ts("2024-01-10 00:00:00"), ts("2024-01-09 00:00:00")),
      (1L, ts("2024-02-05 00:00:00"), ts("2024-01-20 00:00:00")),
      (3L, ts("2024-01-31 00:00:00"), ts("2024-02-01 00:00:00")),
      (3L, ts("2024-01-30 00:00:00"), ts("2024-02-02 00:00:00"))
    ))

    val advanced = RasterIngest.advanceWatermarks(catalog, merged)
    val marks = advanced.collect()
      .map(r => r.getLong(0) -> (r.getAs[java.sql.Timestamp]("end_datetime"), r.getAs[java.sql.Timestamp]("last_issue")))
      .toMap
    assert(marks(1L)._1 == ts("2024-02-01 00:00:00")) // catalog end later than merged valids: kept
    assert(marks(3L)._1 == ts("2024-02-02 00:00:00")) // advanced to max valid
    // greatest(catalog last_issue 12:00, merged max issue 00:00):
    // the watermark never moves backwards
    assert(marks(3L)._2 == ts("2024-01-31 12:00:00"))
    assert(marks(5L)._1 == ts("2024-02-01 00:00:00")) // untouched series unchanged
  }
}
