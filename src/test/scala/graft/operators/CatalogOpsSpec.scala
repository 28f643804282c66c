package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CatalogOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("validateNewTimeseries classifies every failure; batch survives bad rows") {
    import spark.implicits._
    val locations = Seq("Whitehorse", "Dawson").toDF("location")
    val parameters = Seq(10L, 11L).toDF("parameter_id")
    val media = Seq(1L).toDF("media_id")
    val existing = Seq(("whitehorse", 10L, 1L, "mean", 300L))
      .toDF("location", "parameter_id", "media_id", "aggregation_type", "record_rate")
    def row(loc: String, pid: java.lang.Long, mid: java.lang.Long, fx: String, sw: Seq[String],
            agg: String = "mean", rate: Long = 300L, start: java.sql.Timestamp = ts("2024-01-01 00:00:00")) =
      (loc, pid, mid, agg, rate, start, fx, sw)
    val incoming = Seq(
      row("WHITEHORSE", 11L, 1L, "downloadAquarius", Seq("public_reader")), // ok (case-insensitive loc)
      row("Atlin", 10L, 1L, null, Seq("public_reader")),                    // unknown_location
      row("Dawson", 99L, 1L, null, Seq("public_reader")),                   // unknown_parameter
      row("Dawson", 10L, 9L, null, Seq("public_reader")),                   // unknown_media
      row("Dawson", 10L, 1L, "downloadNothing", Seq("public_reader")),      // unknown_source_fx
      row("Dawson", 10L, 1L, null, Seq()),                                  // missing_share_with
      row("Whitehorse", 10L, 1L, null, Seq("public_reader"))                // duplicate_timeseries (case-insensitive key)
    ).toDF("location", "parameter_id", "media_id", "aggregation_type", "record_rate",
      "start_datetime", "source_fx", "share_with")

    val out = CatalogOps.validateNewTimeseries(
      incoming, locations, parameters, media,
      adapterNames = Seq("downloadAquarius", "downloadWSC"), existing = existing)
    assert(out.accepted.count() == 1)
    assert(out.accepted.head().getAs[String]("location") == "WHITEHORSE")
    val reasons = out.rejects.select("reject_reason").as[String].collect().sorted.toList
    assert(reasons == List(
      "duplicate_timeseries", "missing_share_with", "unknown_location",
      "unknown_media", "unknown_parameter", "unknown_source_fx"
    ))
  }

  test("validateNewLocations: name, range, visibility and duplicate checks") {
    import spark.implicits._
    val existing = Seq("Whitehorse").toDF("location")
    val incoming = Seq(
      ("Teslin", 60.17, -132.72, Seq("public_reader")),   // ok
      ("WHITEHORSE", 60.72, -135.05, Seq("public_reader")), // duplicate (case-insensitive)
      (null: String, 60.0, -135.0, Seq("public_reader")), // missing name
      ("BadLat", 95.0, -135.0, Seq("public_reader")),     // bad_latitude
      ("BadLon", 60.0, -200.0, Seq("public_reader")),     // bad_longitude
      ("NoShare", 60.0, -135.0, Seq[String]())            // missing_share_with
    ).toDF("location", "latitude", "longitude", "share_with")
    val out = CatalogOps.validateNewLocations(incoming, existing)
    assert(out.accepted.select("location").as[String].collect().toList == List("Teslin"))
    val r = out.rejects.collect().map(x => (Option(x.getString(0)).getOrElse("<null>"), x.getString(1))).toMap
    assert(r == Map(
      "WHITEHORSE" -> "duplicate_location",
      "<null>" -> "missing_name",
      "BadLat" -> "bad_latitude",
      "BadLon" -> "bad_longitude",
      "NoShare" -> "missing_share_with"
    ))
  }
}
