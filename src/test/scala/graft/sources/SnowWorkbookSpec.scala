package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnowWorkbookSpec extends SparkSpec {

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def sheetsDf = {
    import spark.implicits._
    Seq(
      // standard survey, 3 samples over [0, 0.5] days
      (1L, "Log Cabin", d("2023-03-01"), d("2023-03-02"), "A. Sampler", "standard", 0.0, 0.5, false, None: Option[Double], None: Option[Double]),
      // bulk sample: single calculated row, no estimate flag
      (2L, "Mt Mac", d("2023-03-01"), d("2023-03-03"), "B. Sampler", "bulk", 0.25, 0.25, false, Some(80.0), Some(20.5)),
      // recorded "standard" but estimated average present -> "average"
      (3L, "Log Cabin", d("2023-03-01"), d("2023-03-04"), "C. Sampler", "standard", 0.0, 0.0, true, Some(60.0), Some(15.24)),
      // unknown location -> rejected
      (4L, "Nowhere", d("2023-03-01"), d("2023-03-02"), "D", "standard", 0.0, 0.1, false, None, None),
      // end before start -> rejected
      (5L, "Mt Mac", d("2023-03-01"), d("2023-03-02"), "E", "standard", 0.5, 0.1, false, None, None),
      // standard with a missing SWE -> rejected
      (6L, "Mt Mac", d("2023-03-01"), d("2023-03-02"), "F", "standard", 0.0, 0.2, false, None, None),
      // empty sheet -> silently skipped
      (7L, "Log Cabin", null, null, null, "standard", 0.0, 0.0, false, None, None)
    ).toDF(
      "sheet_id", "location_name", "target_date", "survey_date", "sampler_name",
      "method", "start_days", "end_days", "est_avg_present", "calc_depth_cm", "calc_swe_cm"
    )
  }

  private def samplesDf = {
    import spark.implicits._
    Seq(
      (1L, 1, Some(100.0), Some(25.64), false, Some("ok")),
      (1L, 2, Some(0.0), None: Option[Double], false, None), // depth 0 -> SWE forced 0
      (1L, 3, Some(90.0), Some(22.5), true, Some("excluded")),
      (2L, 1, Some(82.0), Some(21.0), false, None),
      (3L, 1, Some(61.0), Some(15.0), false, None),
      (6L, 1, Some(50.0), None: Option[Double], false, None) // missing SWE
    ).toDF("sheet_id", "sample_no", "depth_cm", "swe_cm", "exclude_flag", "note")
  }

  private def locationsDf = {
    import spark.implicits._
    Seq((10L, "Log Cabin"), (20L, "Mt Mac")).toDF("location_id", "name")
  }

  test("validation: unknown location, end<start and missing values reject; empty sheets skip") {
    val out = SnowWorkbook.process(sheetsDf, samplesDf, locationsDf)
    val rejects = out.rejects.orderBy("sheet_id").collect()
      .map(r => (r.getLong(0), r.getString(2))).toList
    assert(rejects == List((4L, "unknown_location"), (5L, "end_before_start"), (6L, "missing_sample_values")))
    assert(out.surveys.count() == 3) // sheets 1, 2, 3; sheet 7 skipped silently
  }

  test("method resolution: estimated average overrides non-bulk methods") {
    val out = SnowWorkbook.process(sheetsDf, samplesDf, locationsDf)
    val methods = out.surveys.orderBy("survey_id").collect()
      .map(r => (r.getLong(0), r.getString(5))).toList
    assert(methods == List((1L, "standard"), (2L, "bulk"), (3L, "average")))
  }

  test("standard samples: linspace datetimes, depth-0-SWE-0, half-even mm rounding, exclude flags") {
    val out = SnowWorkbook.process(sheetsDf, samplesDf, locationsDf)
    val m = out.measurements.filter(col("survey_id") === 1L).orderBy("sample_datetime").collect()
    assert(m.length == 3)
    // 2023-03-02 00:00 UTC-7 = 07:00 UTC; spaced 0, 6, 12 hours
    assert(m(0).getAs[java.sql.Timestamp]("sample_datetime").toString == "2023-03-02 07:00:00.0")
    assert(m(1).getAs[java.sql.Timestamp]("sample_datetime").toString == "2023-03-02 13:00:00.0")
    assert(m(2).getAs[java.sql.Timestamp]("sample_datetime").toString == "2023-03-02 19:00:00.0")
    // 25.64 cm -> 256.4 mm -> half-even 256
    assert(m(0).getAs[Double]("swe_mm") == 256.0)
    // depth 0 forced SWE 0
    assert(m(1).getAs[Double]("swe_mm") == 0.0 && m(1).getAs[Double]("depth_cm") == 0.0)
    assert(m(2).getAs[Boolean]("exclude_flag"))
  }

  test("bulk and average surveys emit one calculated row; only average is an estimate") {
    val out = SnowWorkbook.process(sheetsDf, samplesDf, locationsDf)
    val bulk = out.measurements.filter(col("survey_id") === 2L).collect()
    assert(bulk.length == 1)
    assert(!bulk.head.getAs[Boolean]("estimate_flag"))
    assert(bulk.head.getAs[Double]("swe_mm") == 205.0) // 20.5 cm -> 205 mm
    assert(bulk.head.getAs[Double]("depth_cm") == 80.0)
    val avg = out.measurements.filter(col("survey_id") === 3L).collect()
    assert(avg.length == 1)
    assert(avg.head.getAs[Boolean]("estimate_flag"))
    assert(avg.head.getAs[Double]("swe_mm") == 152.0) // 15.24 cm -> 152.4 -> 152
  }

  test("'bulk sample' normalizes to bulk; unrecognized methods reject, not silently drop") {
    import spark.implicits._
    val sheets = Seq(
      (8L, "Mt Mac", d("2023-03-01"), d("2023-03-02"), "G", "Bulk Sample", 0.0, 0.0, false, Some(70.0), Some(18.0)),
      (9L, "Mt Mac", d("2023-03-01"), d("2023-03-02"), "H", "depth-only", 0.0, 0.0, false, None: Option[Double], None: Option[Double])
    ).toDF(
      "sheet_id", "location_name", "target_date", "survey_date", "sampler_name",
      "method", "start_days", "end_days", "est_avg_present", "calc_depth_cm", "calc_swe_cm"
    )
    val out = SnowWorkbook.process(sheets, samplesDf.limit(0), locationsDf)
    // bulk sample takes the averaged path and emits exactly one row
    val m = out.measurements.collect()
    assert(m.length == 1 && m.head.getAs[Long]("survey_id") == 8L)
    assert(!m.head.getAs[Boolean]("estimate_flag"))
    val rejects = out.rejects.collect().map(r => (r.getLong(0), r.getString(2))).toList
    assert(rejects == List((9L, "unknown_method")))
  }
}
