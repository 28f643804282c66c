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

  test("registerSeries: every addACRasterSeries gate fires; accepted rows seed the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val incoming = Seq[(Long, Option[String], Long, Option[java.sql.Timestamp], Option[String], String, Option[Long], Option[Long], Option[Double], Option[String])](
      // (src_key, model, parameter_id, start, source_fx, type, media, matrix, z, z_units)
      (1L, Some("HRDPS"), 1L, Some(t0), Some("downloadHRDPS"), "forecast", None, None, None, None),
      (2L, None, 1L, Some(t0), Some("downloadHRDPS"), "forecast", None, None, None, None),      // missing_model
      (3L, Some("ERA5"), 1L, None, Some("downloadERA5"), "reanalysis", None, None, None, None), // missing_start
      (4L, Some("ERA5"), 1L, Some(t0), None, "reanalysis", None, None, None, None),             // missing_source_fx
      (5L, Some("ERA5"), 1L, Some(t0), Some("downloadERA5"), "nowcast", None, None, None, None), // bad_type
      (6L, Some("ERA5"), 9L, Some(t0), Some("downloadERA5"), "reanalysis", None, None, None, None), // unknown_parameter
      (7L, Some("ERA5"), 1L, Some(t0), Some("downloadFTP"), "reanalysis", None, None, None, None),  // unknown_source_fx
      (8L, Some("ERA5"), 2L, Some(t0), Some("downloadERA5"), "reanalysis", None, None, None, None), // multi-state, no media -> ambiguous
      (9L, Some("ERA5"), 2L, Some(t0), Some("downloadERA5"), "reanalysis", Some(3L), None, None, None), // multi-state + media: OK
      (10L, Some("ERA5"), 1L, Some(t0), Some("downloadERA5"), "reanalysis", None, None, Some(500.0), None), // missing_z_units
      (11L, Some("HRDPA"), 1L, Some(t0), Some("downloadHRDPA"), "forecast", None, None, None, None), // dup of existing (matrix 10 <=> 10)
      (12L, Some("ERA5"), 2L, Some(t0), Some("downloadERA5"), "reanalysis", Some(9L), None, None, None), // media 9 unmapped -> unresolved
      (13L, Some("HRDPS"), 1L, Some(t0), Some("downloadHRDPS"), "forecast", None, None, None, None), // same key as row 1 -> duplicate_in_batch
      (14L, Some("HRDPA"), 1L, Some(t0), Some("downloadHRDPA"), "forecast", None, Some(99L), None, None) // same (model,param,type) as existing but matrix 99 != 10 -> accepted
    ).toDF(
      "src_key", "model", "parameter_id", "start_datetime", "source_fx", "raster_type",
      "media_id", "matrix_state_id", "z_value", "z_units"
    )
    val parameters = Seq((1L, Some(10L), false), (2L, None, true))
      .toDF("parameter_id", "default_matrix_state_id", "multi_state")
    val knownFx = Seq("downloadHRDPS", "downloadERA5", "downloadHRDPA").toDF("source_fx")
    val existing = Seq((7L, "HRDPA", 1L, "forecast", 10L))
      .toDF("raster_series_id", "model", "parameter_id", "raster_type", "matrix_state_id")
    val mediaDefaults = Seq((3L, 33L)).toDF("media_id", "default_matrix_state_id")

    val out = graft.sources.RasterIngest.registerSeries(incoming, parameters, knownFx, existing, mediaDefaults)
    val rej = out.rejects.as[(Long, String)].collect().toMap
    assert(
      rej == Map(
        2L -> "missing_model", 3L -> "missing_start", 4L -> "missing_source_fx",
        5L -> "bad_type", 6L -> "unknown_parameter", 7L -> "unknown_source_fx",
        8L -> "ambiguous_matrix_state", 10L -> "missing_z_units", 11L -> "duplicate_series",
        12L -> "unresolved_matrix_state", 13L -> "duplicate_in_batch"
      )
    )
    val acc = out.accepted
      .select("src_key", "raster_series_id", "matrix_state_id", "end_datetime", "active")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)), r.getTimestamp(3), r.getBoolean(4))))
      .toMap
    assert(acc.keySet == Set(1L, 9L, 14L))
    assert(acc(1L)._1 == 8L && acc(9L)._1 == 9L && acc(14L)._1 == 10L, "ids above max(existing)=7")
    assert(acc(1L)._2.contains(10L), "matrix defaulted from parameter")
    assert(acc(9L)._2.contains(33L), "multi-state matrix resolved through media, never NULL in the catalog")
    assert(acc(14L)._2.contains(99L), "explicit matrix differing from existing is not a duplicate")
    assert(acc(1L)._3 == t0 && acc(1L)._4, "watermark seeded at start, series active")
  }

  test("insertRasters: manual-path gates, bit-depth parse, missing 'other' type") {
    import spark.implicits._
    val incoming = Seq(
      // (src_key, band_names, units, bit_depth)
      (1L, Some(Seq("b1", "b2")), Some(Seq("mm", "C")), None: Option[String]), // parse -> 32BF (frac)
      (2L, Some(Seq("b1")), None, Some("32bui")), // explicit, case-insensitive
      (3L, Some(Seq("b1")), None, Some("64BF")), // unsupported_bit_depth
      (4L, None, None, None), // missing_bands
      (5L, Some(Seq("b1")), Some(Seq("mm", "C", "K")), None), // units_band_mismatch
      (6L, Some(Seq("b1")), None, None), // empty_raster (no cells)
      (7L, Some(Seq("b1")), None, None), // parse -> 32BSI (negative ints)
      (8L, Some(Seq("b1")), None, None) // parse -> 32BUI (non-negative ints)
    ).toDF("src_key", "band_names", "units", "bit_depth")
      .withColumn("description", lit("d"))
      .withColumn("flag", lit(null).cast("string"))
      .withColumn("source", lit(null).cast("string"))
    val cells = Seq(
      (1L, 1, 0, 0, 0.5), (1L, 2, 1, 0, 2.0),
      (2L, 1, 0, 0, 3.0),
      (3L, 1, 0, 0, 1.0),
      (5L, 1, 0, 0, 1.0),
      (7L, 1, 0, 0, -4.0), (7L, 1, 1, 0, 2.0),
      (8L, 1, 0, 0, 0.0), (8L, 1, 1, 0, 7.0)
    ).toDF("src_key", "band", "x", "y", "value")
    val types = Seq((1L, "model"), (2L, "other")).toDF("raster_type_id", "raster_type_name")
    val existing = Seq(40L).toDF("reference_id")
    val out = graft.sources.RasterIngest.insertRasters(incoming, cells, types, existing)
    val rej = out.rejects.as[(Long, String)].collect().toMap
    assert(
      rej == Map(
        3L -> "unsupported_bit_depth",
        4L -> "missing_bands",
        5L -> "units_band_mismatch",
        6L -> "empty_raster"
      )
    )
    val acc = out.accepted
      .select("src_key", "reference_id", "raster_type_id", "bit_depth", "terra_datatype",
        "band_names_str", "units_str")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4), r.getString(5), r.getString(6))))
      .toMap
    assert(acc.keySet == Set(1L, 2L, 7L, 8L))
    assert(acc(1L)._1 == 41L && acc(8L)._1 == 44L, "ids above max(existing)=40 in src_key order")
    assert(acc.values.forall(_._2 == 2L), "raster_type resolves to 'other'")
    assert(acc(1L)._3 == "32BF" && acc(1L)._4 == "FLT4S", "fractional data parses to 32BF")
    assert(acc(2L)._3 == "32BUI" && acc(2L)._4 == "INT4U", "explicit bit depth, case-insensitive")
    assert(acc(7L)._3 == "32BSI" && acc(7L)._4 == "INT4S", "negative integral data parses to 32BSI")
    assert(acc(8L)._3 == "32BUI", "non-negative integral data parses to 32BUI")
    assert(acc(1L)._5 == "{{b1},{b2}}" && acc(1L)._6 == "mm, C")
    assert(acc(2L)._6 == "", "absent units -> per-band empty defaults joined")

    // a types dimension without 'other' rejects everything (the
    // reference stops the whole call)
    val noOther = graft.sources.RasterIngest.insertRasters(
      incoming, cells, Seq((1L, "model")).toDF("raster_type_id", "raster_type_name"), existing)
    assert(noOther.accepted.isEmpty)
    assert(
      noOther.rejects.filter(col("reject_reason") === "missing_other_type").count() == 4,
      "every otherwise-acceptable row rejects on the missing type"
    )
  }

  test("insertRasterFromFile: parquet intake, derived band names, tile write round trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rast-intake").toString
    val cellsPath = s"$dir/cells"
    val tilesPath = s"$dir/tiles"
    // 2 bands x 5x3 grid per raster; values integral non-negative -> 32BUI
    val cells = spark
      .range(2)
      .select((col("id") + 1).as("src_key"))
      .crossJoin(spark.range(2).select((col("id") + 1).cast("int").as("band")))
      .crossJoin(spark.range(15).select(
        (col("id") % 5).cast("int").as("x"), (col("id") / 5).cast("int").as("y")))
      .withColumn("value", (col("src_key") * 100 + col("band") * 10 + col("x") + col("y")).cast("double"))
    cells.write.parquet(cellsPath)
    val meta = Seq(
      (1L, None: Option[Seq[String]]), // band names derived from the cells
      (2L, Some(Seq("alpha", "beta")))
    ).toDF("src_key", "band_names")
      .withColumn("units", lit(null).cast("array<string>"))
      .withColumn("bit_depth", lit(null).cast("string"))
      .withColumn("description", lit("file intake"))
      .withColumn("flag", lit(null).cast("string"))
      .withColumn("source", lit("file"))
    val types = Seq((2L, "other")).toDF("raster_type_id", "raster_type_name")
    val existing = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("reference_id LONG"))
    val res = graft.sources.RasterIngest.insertRasterFromFile(
      spark, cellsPath, meta, types, existing, tilesOut = Some(tilesPath), tileW = 4, tileH = 2)
    val acc = res.accepted
      .select("src_key", "reference_id", "band_names_str", "bit_depth")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3))))
      .toMap
    assert(res.rejects.isEmpty)
    assert(acc(1L)._2 == "{{1},{2}}", "band names derived from the cell frame")
    assert(acc(2L)._2 == "{{alpha},{beta}}", "caller-provided band names win")
    assert(acc.values.forall(_._3 == "32BUI"))
    // tiles round-trip to the exact cell set, keyed by minted reference_id
    val back = graft.operators.Raster
      .cells(spark.read.parquet(tilesPath))
      .select(col("series_id"), col("band"), col("x"), col("y"), col("value"))
      .as[(Long, Int, Int, Int, Double)]
      .collect()
      .toSet
    val expected = cells
      .join(res.accepted.select(col("src_key"), col("reference_id")), Seq("src_key"))
      .select(col("reference_id"), col("band"), col("x"), col("y"), col("value"))
      .as[(Long, Int, Int, Int, Double)]
      .collect()
      .toSet
    assert(back == expected, "tileGrid/writeTiles round trip preserves every cell")
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } finally walk.close()
  }
}
