package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class CorrectionsSpec extends SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  private def corrDf(rows: Seq[(Long, Long, String, String, String, Option[Double], Option[Double], Option[Long], Option[String], Int)]) = {
    import spark.implicits._
    rows
      .toDF("correction_id", "timeseries_id", "start_s", "end_s", "ctype", "value1", "value2", "window_seconds", "equation", "priority")
      .withColumn("start_dt", to_timestamp(col("start_s")))
      .withColumn("end_dt", to_timestamp(col("end_s")))
      .drop("start_s", "end_s")
  }

  private def pts(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toSeq
      .toDF("timeseries_id", "dt_s", "value")
      .withColumn("datetime", to_timestamp(col("dt_s")))
      .drop("dt_s")
  }

  test("canonical fixture case: offset linear +0.25 inside window only") {
    // mirrors the reference's only correction fixture
    // (R/create_test_DB.R:1142-1150): +0.25 on 2023-01-03 -> 04
    val corr = corrDf(Seq((1L, 1L, "2023-01-03 00:00:00", "2023-01-04 00:00:00", "offset_linear", Some(0.25), None, None, None, 1)))
    val out = Corrections(pts((1L, "2023-01-02 12:00:00", 10.0), (1L, "2023-01-03 12:00:00", 10.0)), corr)
      .orderBy("datetime").select("corrected").collect().map(_.getDouble(0)).toList
    assert(out == List(10.0, 10.25))
  }

  test("fold applies in priority order and scale composes after offset") {
    val corr = corrDf(Seq(
      (1L, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", "scale", Some(200.0), None, None, None, 2),
      (2L, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", "offset_linear", Some(1.0), None, None, None, 1)
    ))
    val out = Corrections(pts((1L, "2023-01-01 06:00:00", 10.0)), corr)
      .select("corrected").collect().map(_.getDouble(0)).toList
    assert(out == List(22.0)) // (10 + 1) * 2, NOT 10*2 + 1
  }

  test("delete short-circuits all later corrections") {
    val corr = corrDf(Seq(
      (1L, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", "delete", None, None, None, None, 1),
      (2L, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", "offset_linear", Some(5.0), None, None, None, 2)
    ))
    val out = Corrections(pts((1L, "2023-01-01 06:00:00", 10.0)), corr)
      .select("corrected").collect()
    assert(out.head.isNullAt(0))
  }

  test("offset_two_point interpolates across the segment") {
    val corr = corrDf(Seq((1L, 1L, "2023-01-01 00:00:00", "2023-01-03 00:00:00", "offset_two_point", Some(0.0), Some(4.0), None, None, 1)))
    val out = Corrections(pts((1L, "2023-01-02 00:00:00", 10.0)), corr) // midpoint
      .select("corrected").collect().map(_.getDouble(0)).toList
    assert(out == List(12.0))
  }

  test("drift_linear and sandboxed drift_equation") {
    val corr = corrDf(Seq(
      (1L, 1L, "2023-01-01 00:00:00", "2023-01-05 00:00:00", "drift_linear", Some(2.0), None, Some(86400L), None, 1),
      (2L, 2L, "2023-01-01 00:00:00", "2023-01-05 00:00:00", "drift_equation", None, None, None, Some("$1 + 0.5 * sqrt($2)"), 1)
    ))
    val out = Corrections(pts((1L, "2023-01-02 00:00:00", 10.0), (2L, "2023-01-01 00:00:04", 10.0)), corr)
      .orderBy("timeseries_id").select("corrected").collect().map(_.getDouble(0)).toList
    assert(out == List(12.0, 11.0)) // 10 + 2*86400/86400; 10 + 0.5*sqrt(4)
  }

  test("rejects unsafe stored equations") {
    val corr = corrDf(Seq((1L, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", "drift_equation", None, None, None, Some("$1; DROP TABLE x"), 1)))
    val e = intercept[IllegalArgumentException] {
      Corrections(pts((1L, "2023-01-01 06:00:00", 10.0)), corr).collect()
    }
    assert(e.getMessage.contains("unsafe"))
  }

  test("trim NULLs only values outside [value1, value2]; bounds may be open") {
    // patch_22.R:75-81: in-range data inside a trim window is KEPT
    val corr = corrDf(Seq(
      (1L, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", "trim", Some(5.0), Some(50.0), None, None, 1),
      (2L, 2L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", "trim", None, Some(50.0), None, None, 1)
    ))
    val out = Corrections(
      pts(
        (1L, "2023-01-01 06:00:00", 10.0),  // in range -> kept
        (1L, "2023-01-01 07:00:00", 3.0),   // below value1 -> NULL
        (1L, "2023-01-01 08:00:00", 60.0),  // above value2 -> NULL
        (2L, "2023-01-01 06:00:00", -99.0), // no lower bound -> kept
        (2L, "2023-01-01 07:00:00", 60.0)   // above value2 -> NULL
      ),
      corr
    ).orderBy("timeseries_id", "datetime").select("corrected").collect()
    assert(out(0).getDouble(0) == 10.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
    assert(out(3).getDouble(0) == -99.0)
    assert(out(4).isNullAt(0))
  }

  test("matching is inclusive of end_dt (patch_22.R:66-67)") {
    val corr = corrDf(Seq((1L, 1L, "2023-01-03 00:00:00", "2023-01-04 00:00:00", "offset_linear", Some(0.25), None, None, None, 1)))
    val out = Corrections(
      pts((1L, "2023-01-04 00:00:00", 10.0), (1L, "2023-01-04 00:00:01", 10.0)),
      corr
    ).orderBy("datetime").select("corrected").collect().map(_.getDouble(0)).toList
    assert(out == List(10.25, 10.0)) // end instant corrected, one past it not
  }

  test("points in uncorrected series/windows pass through") {
    val corr = corrDf(Seq((1L, 1L, "2023-01-03 00:00:00", "2023-01-04 00:00:00", "offset_linear", Some(0.25), None, None, None, 1)))
    val out = Corrections(pts((2L, "2023-01-03 12:00:00", 7.5)), corr)
      .select("corrected").collect().map(_.getDouble(0)).toList
    assert(out == List(7.5))
  }
}
