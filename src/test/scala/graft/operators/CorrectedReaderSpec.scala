package graft.operators

import graft.SparkSpec
import graft.operators.CorrectedReader.{Catalog, CompoundDef, Member}
import org.apache.spark.sql.functions._

class CorrectedReaderSpec extends SparkSpec {

  private def measurements = {
    import spark.implicits._
    // ts1 = temp-ish, ts2 = cond-ish, hourly on the same grid; ts3 =
    // backup level offset by 30 min (tolerance member)
    val rows = for {
      h <- 0 until 24
    } yield Seq(
      (1L, f"2023-01-01 $h%02d:00:00", 20.0 + h * 0.5),
      (2L, f"2023-01-01 $h%02d:00:00", 100.0 + h),
      (3L, f"2023-01-01 $h%02d:30:00", 50.0 + h)
    )
    rows.flatten
      .toDF("timeseries_id", "dt_s", "value")
      .withColumn("datetime", to_timestamp(col("dt_s")))
      .drop("dt_s")
  }

  private def corrections = {
    import spark.implicits._
    Seq((1L, 1L, "2023-01-01 06:00:00", "2023-01-01 12:00:00", "offset_linear", Some(2.0), Option.empty[Double], Option.empty[Long], Option.empty[String], 1))
      .toDF("correction_id", "timeseries_id", "start_s", "end_s", "ctype", "value1", "value2", "window_seconds", "equation", "priority")
      .withColumn("start_dt", to_timestamp(col("start_s")))
      .withColumn("end_dt", to_timestamp(col("end_s")))
      .drop("start_s", "end_s")
  }

  private def catalog(compounds: Map[Long, CompoundDef]) =
    Catalog(measurements, corrections, compounds, correctedSeriesIds = Set(1L))

  test("basic series: corrections applied inside the window, fast path outside") {
    val cat = catalog(Map.empty)
    val ts1 = CorrectedReader
      .read(cat, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00")
      .orderBy("datetime").collect()
    assert(ts1(0).getDouble(1) == 20.0) // uncorrected
    assert(ts1(6).getDouble(1) == 25.0) // 23.0 + 2 offset
    // ts2 has no corrections: plain scan
    val ts2 = CorrectedReader
      .read(cat, 2L, "2023-01-01 00:00:00", "2023-01-02 00:00:00")
      .orderBy("datetime").collect()
    assert(ts2(0).getDouble(1) == 100.0)
  }

  test("expression compound with exact members; reference fixture formula") {
    val cat = catalog(Map(
      10L -> CompoundDef(
        Some("cond / (1 + 0.0191 * (temp - 25))"),
        Seq(Member("temp", 1L, 1), Member("cond", 2L, 2))
      )
    ))
    val out = CorrectedReader
      .read(cat, 10L, "2023-01-01 00:00:00", "2023-01-02 00:00:00")
      .orderBy("datetime").collect()
    assert(out.length == 24)
    // at 00:00 temp is CORRECTED ts1? no: correction window starts 06:00.
    // temp=20, cond=100 -> 100 / (1 + 0.0191*(-5))
    assert(math.abs(out(0).getDouble(1) - 100.0 / (1 + 0.0191 * -5)) < 1e-9)
    // at 06:00 temp corrected to 25 -> denominator 1 -> cond as-is
    assert(math.abs(out(6).getDouble(1) - 106.0) < 1e-9)
  }

  test("fallback compound prefers the primary member") {
    val cat = catalog(Map(
      6L -> CompoundDef(None, Seq(Member("primary", 2L, 1), Member("backup", 3L, 2)))
    ))
    val out = CorrectedReader
      .read(cat, 6L, "2023-01-01 00:00:00", "2023-01-02 00:00:00")
      .orderBy("datetime").collect()
    assert(out.length == 48) // disjoint timestamps: union of both members
    assert(out(0).getDouble(1) == 100.0) // :00 rows from primary
    assert(out(1).getDouble(1) == 50.0) // :30 rows filled by backup
  }

  test("tolerance member aligns to anchor timestamps") {
    val cat = catalog(Map(
      11L -> CompoundDef(
        Some("a + b"),
        Seq(Member("a", 2L, 1), Member("b", 3L, 2, toleranceSeconds = Some(3600L)))
      )
    ))
    val out = CorrectedReader
      .read(cat, 11L, "2023-01-01 00:00:00", "2023-01-02 00:00:00")
      .orderBy("datetime").collect()
    assert(out.nonEmpty)
    // anchor 00:00 (a=100) matches member 00:30 (b=50) -> 150
    assert(out(0).getDouble(1) == 150.0)
  }

  test("resample stage bins the resolved series with explicit bins") {
    val cat = catalog(Map.empty)
    val out = CorrectedReader
      .read(cat, 2L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", resampleSeconds = Some(21600L))
      .orderBy("datetime").collect()
    assert(out.length == 4)
    assert(out.head.getAs[Double]("value") == (100.0 + 105.0) / 2.0 + 0.0) // mean of 100..105
  }

  test("compound cycles are rejected") {
    val cat = catalog(Map(
      20L -> CompoundDef(None, Seq(Member("x", 21L, 1))),
      21L -> CompoundDef(None, Seq(Member("y", 20L, 1)))
    ))
    val e = intercept[IllegalArgumentException] {
      CorrectedReader.read(cat, 20L, "2023-01-01 00:00:00", "2023-01-02 00:00:00").collect()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("correctedSnapshotAt: post-T correction edits and measurement updates are rolled back") {
    import spark.implicits._
    val mCur = Seq(
      (1L, 1L, "2023-01-01 06:00:00", 10.0, "2023-01-01 06:00:00"), // updated after T: log holds old 9.0
      (2L, 1L, "2023-01-01 07:00:00", 20.0, "2023-01-01 07:00:00") // untouched
      // row 3 deleted after T -> only in the log
    ).toDF("measurement_row_id", "timeseries_id", "dt_s", "value", "created_s")
      .withColumn("datetime", to_timestamp(col("dt_s")))
      .withColumn("created", to_timestamp(col("created_s")))
      .drop("dt_s", "created_s")
    val mLog = Seq(
      (1L, 1L, "2023-01-01 06:00:00", 9.0, "2023-01-01 06:00:00", "2023-01-03 00:00:00", "U"),
      (3L, 1L, "2023-01-01 08:00:00", 30.0, "2023-01-01 08:00:00", "2023-01-03 00:00:00", "D")
    ).toDF("measurement_row_id", "timeseries_id", "dt_s", "value", "created_s", "action_s", "action")
      .withColumn("datetime", to_timestamp(col("dt_s")))
      .withColumn("created", to_timestamp(col("created_s")))
      .withColumn("action_ts", to_timestamp(col("action_s")))
      .drop("dt_s", "created_s", "action_s")
    // current correction offset +5 (edited after T from +2); a second
    // correction created after T must not apply at T
    val cCur = Seq(
      (10L, 1L, "offset_linear", 5.0, 1, "2023-01-01 00:00:00"),
      (11L, 1L, "scale", 200.0, 2, "2023-01-05 00:00:00")
    ).toDF("correction_id", "timeseries_id", "ctype", "value1", "priority", "created_s")
      .withColumn("start_dt", to_timestamp(lit("2023-01-01 00:00:00")))
      .withColumn("end_dt", to_timestamp(lit("2023-01-02 00:00:00")))
      .withColumn("value2", lit(null).cast("double"))
      .withColumn("window_seconds", lit(null).cast("long"))
      .withColumn("equation", lit(null).cast("string"))
      .withColumn("created", to_timestamp(col("created_s")))
      .drop("created_s")
    val cLog = Seq((10L, 1L, "offset_linear", 2.0, 1, "2023-01-01 00:00:00", "2023-01-04 00:00:00"))
      .toDF("correction_id", "timeseries_id", "ctype", "value1", "priority", "created_s", "action_s")
      .withColumn("start_dt", to_timestamp(lit("2023-01-01 00:00:00")))
      .withColumn("end_dt", to_timestamp(lit("2023-01-02 00:00:00")))
      .withColumn("value2", lit(null).cast("double"))
      .withColumn("window_seconds", lit(null).cast("long"))
      .withColumn("equation", lit(null).cast("string"))
      .withColumn("created", to_timestamp(col("created_s")))
      .withColumn("action_ts", to_timestamp(col("action_s")))
      .drop("created_s", "action_s")
    val out = CorrectedReader
      .correctedSnapshotAt(mCur, mLog, cCur, cLog, "2023-01-02 12:00:00")
      .orderBy("datetime")
      .collect()
      .map(r => r.getTimestamp(r.fieldIndex("datetime")).toString -> r.getDouble(r.fieldIndex("corrected")))
      .toMap
    // at T: offset was +2 (not +5), scale didn't exist, row1 was 9.0,
    // row3 not yet deleted
    assert(out == Map(
      "2023-01-01 06:00:00.0" -> 11.0, // 9 + 2
      "2023-01-01 07:00:00.0" -> 22.0, // 20 + 2
      "2023-01-01 08:00:00.0" -> 32.0 // 30 + 2 (delete happened after T)
    ))
  }
}
