package graft.jobs

import graft.SparkSpec
import graft.operators.DailyAggregate
import graft.sources.{Adapters, SeriesConfig}
import org.apache.spark.sql.functions._

/** NOTE on the "No Partition Defined for Window" WARNs this suite
  * logs: the fixture's single series carries a LITERAL timeseries_id,
  * and Catalyst folds the constant out of the window partition spec
  * (Segments/SegmentAlgebra windows), leaving an unpartitioned window
  * in the TEST plan only. With real multi-series frames the partition
  * column is non-foldable and survives — verified by plan inspection;
  * no production path windows without a partition key.
  */
class DailyUpdateSpec extends SparkSpec {

  test("end-to-end: fetch -> upsert -> correct -> incremental daily refresh") {
    import spark.implicits._
    val cfg = SeriesConfig(
      timeseriesId = 1L,
      sourceFx = "downloadSynthetic",
      args = Map(
        "series" -> "water_level",
        "step_seconds" -> "3600",
        "from" -> "2023-01-01 00:00:00",
        "to" -> "2023-01-05 00:00:00"
      )
    )
    // store already holds the first two days
    val existing = SeriesConfig(
      1L, "downloadSynthetic",
      cfg.args.updated("to", "2023-01-03 00:00:00")
    )
    val initial = graft.sources.SyntheticAdapter
      .fetch(spark, existing, java.sql.Timestamp.valueOf("2023-01-01 00:00:00"))
      .withColumn("timeseries_id", lit(1L))
      .select("timeseries_id", "datetime", "value", "period_seconds")
    val dailyBase = DailyAggregate(
      initial.withColumn("agg_type", lit("mean")).withColumn("offset_hours", lit(0))
    )
    val corrections = Seq.empty[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, String, Option[Double], Option[Double], Option[Long], Option[String], Int)]
      .toDF("correction_id", "timeseries_id", "start_dt", "end_dt", "ctype", "value1", "value2", "window_seconds", "equation", "priority")

    val result = DailyUpdate.run(
      spark,
      Seq(cfg),
      initial,
      dailyBase,
      corrections,
      Adapters.default,
      aggTypes = Map(1L -> ("mean", 0))
    )
    assert(result.appended.count() == 48L) // Jan 3 + Jan 4
    assert(result.measurements.count() == 96L)
    assert(result.daily.count() == 4L)
    // refreshed daily equals a from-scratch daily over the full store
    val full = DailyAggregate(
      result.measurements.withColumn("agg_type", lit("mean")).withColumn("offset_hours", lit(0))
    )
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getDate(1).toString, r.getDouble(3))
    assert(result.daily.collect().map(key).toSet == full.collect().map(key).toSet)
    // DOY stats over the touched scope runs and returns the changed days
    val doy = DailyUpdate.refreshDoyStats(result.daily, result.changedRanges)
    assert(doy.count() >= 2L)
  }

  test("QC adjust step: batch grades become reconciled segments in the store") {
    import spark.implicits._
    val cfg = SeriesConfig(
      timeseriesId = 1L,
      sourceFx = "downloadSynthetic",
      args = Map(
        "series" -> "water_level",
        "step_seconds" -> "3600",
        "from" -> "2023-01-01 00:00:00",
        "to" -> "2023-01-02 00:00:00"
      ),
      defaultGrade = Some("B")
    )
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double, Long)]
      .toDF("timeseries_id", "datetime", "value", "period_seconds")
    val dailyBase = DailyAggregate(
      empty.withColumn("agg_type", lit("mean")).withColumn("offset_hours", lit(0))
    )
    val corrections = Seq.empty[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, String, Option[Double], Option[Double], Option[Long], Option[String], Int)]
      .toDF("correction_id", "timeseries_id", "start_dt", "end_dt", "ctype", "value1", "value2", "window_seconds", "equation", "priority")
    // existing store: grade 'A' over the first half of the day
    val store = Seq(
      (1L, "grade", 10L, "A", "2023-01-01 00:00:00", "2023-01-01 12:00:00")
    ).toDF("series_id", "stream", "id", "value", "start_s", "end_s")
      .withColumn("start_dt", to_timestamp(col("start_s")))
      .withColumn("end_dt", to_timestamp(col("end_s")))
      .drop("start_s", "end_s")
    val result = DailyUpdate.run(
      spark, Seq(cfg), empty, dailyBase, corrections, Adapters.default,
      aggTypes = Map(1L -> ("mean", 0)), qcSegments = Some(store)
    )
    val qc = result.qcChanges.get.collect()
    assert(qc.nonEmpty, "default grade B over the batch window must replace/extend grade A")
    val upserts = qc.filter(_.getString(qc.head.fieldIndex("op")) == "upsert")
    val grades = upserts.filter(_.getString(1) == "grade").map(r => r.getString(3)).toSet
    assert(grades == Set("B"), s"new wins over old: $grades")
  }

  test("media legs: image watermark round + raster merge round advance both catalogs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val imageCatalog = Seq(
      (1L, Some(ts("2024-01-01 00:00:00")), true)
    ).toDF("img_series_id", "last_img", "active")
    val fetchedImages = Seq(
      (1L, ts("2024-01-01 06:00:00"), "new".getBytes("UTF-8"), "jpg"),
      (1L, ts("2023-12-31 06:00:00"), "old".getBytes("UTF-8"), "jpg") // behind watermark
    ).toDF("img_series_id", "img_ts", "payload", "format")
    val existingImages = Seq.empty[(Long, java.sql.Timestamp)]
      .toDF("img_series_id", "img_ts")

    val rasterCatalog = Seq(
      (5L, "forecast", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 00:00:00")), true)
    ).toDF("raster_series_id", "raster_type", "end_datetime", "last_issue", "active")
    def tile(issue: String, valid: String) =
      (5L, "b1", "forecast", ts(issue), ts(valid), 0, 0)
    val existingTiles = Seq(tile("2024-01-01 00:00:00", "2024-01-02 00:00:00"))
      .toDF("series_id", "band", "raster_type", "issue_ts", "valid_ts", "tile_x", "tile_y")
    val fetchedTiles = Seq(tile("2024-01-01 12:00:00", "2024-01-02 00:00:00"))
      .toDF("series_id", "band", "raster_type", "issue_ts", "valid_ts", "tile_x", "tile_y")

    val out = DailyUpdate.runMedia(
      imageCatalog, fetchedImages, existingImages,
      rasterCatalog, existingTiles, fetchedTiles)

    assert(out.newImages.count() == 1) // watermark filtered the old frame
    assert(out.imageCatalog.head().getAs[java.sql.Timestamp]("last_img") ==
      ts("2024-01-01 06:00:00"))
    // the newer forecast issue superseded the old one for the shared valid
    val kept = out.mergedTiles.select("issue_ts").collect().map(_.getTimestamp(0)).toSet
    assert(kept == Set(ts("2024-01-01 12:00:00")))
    val cat = out.rasterCatalog.head()
    assert(cat.getAs[java.sql.Timestamp]("end_datetime") == ts("2024-01-02 00:00:00"))
    assert(cat.getAs[java.sql.Timestamp]("last_issue") == ts("2024-01-01 12:00:00"))
  }
}
