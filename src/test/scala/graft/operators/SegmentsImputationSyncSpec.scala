package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegmentsImputationSyncSpec extends SparkSpec {

  private def pts(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq
      .toDF("timeseries_id", "dt_s", "grade")
      .withColumn("datetime", to_timestamp(col("dt_s")))
      .drop("dt_s")
  }

  test("Segments.fromPoints: RLE with half-open ends meeting next start") {
    val df = pts(
      (1L, "2023-01-01 00:00:00", "A"),
      (1L, "2023-01-01 01:00:00", "A"),
      (1L, "2023-01-01 02:00:00", "B"),
      (1L, "2023-01-01 03:00:00", "A"),
      (2L, "2023-01-01 00:00:00", "C")
    )
    val segs = Segments
      .fromPoints(df, Seq("timeseries_id"), "datetime", "grade")
      .orderBy("timeseries_id", "start_dt")
      .select("timeseries_id", "grade", "n_points", "start_dt", "end_dt")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getTimestamp(3).toString, Option(r.getTimestamp(4)).map(_.toString)))
      .toList
    assert(segs == List(
      (1L, "A", 2L, "2023-01-01 00:00:00.0", Some("2023-01-01 02:00:00.0")),
      (1L, "B", 1L, "2023-01-01 02:00:00.0", Some("2023-01-01 03:00:00.0")),
      (1L, "A", 1L, "2023-01-01 03:00:00.0", None),
      (2L, "C", 1L, "2023-01-01 00:00:00.0", None)
    ))
  }

  private def vals(rows: (Long, String, Option[Double])*) = {
    import spark.implicits._
    rows.toSeq
      .toDF("timeseries_id", "dt_s", "value")
      .withColumn("datetime", to_timestamp(col("dt_s")))
      .drop("dt_s")
  }

  test("Imputation.locf forward fills, backward fills leading nulls") {
    val df = vals(
      (1L, "2023-01-01 00:00:00", None),
      (1L, "2023-01-01 01:00:00", Some(5.0)),
      (1L, "2023-01-01 02:00:00", None),
      (1L, "2023-01-01 03:00:00", Some(8.0)),
      (1L, "2023-01-01 04:00:00", None)
    )
    val out = Imputation
      .locf(df, Seq("timeseries_id"), Seq("datetime"), "value")
      .orderBy("datetime")
      .select("filled")
      .collect()
      .map(_.getDouble(0))
      .toList
    assert(out == List(5.0, 5.0, 5.0, 8.0, 8.0))
  }

  test("Imputation.linearInterpolate fills bounded gaps and flags imputed") {
    val df = vals(
      (1L, "2023-01-01 00:00:00", Some(10.0)),
      (1L, "2023-01-01 01:00:00", None),
      (1L, "2023-01-01 02:00:00", None),
      (1L, "2023-01-01 03:00:00", Some(40.0)),
      (1L, "2023-01-01 10:00:00", None), // trailing: no next anchor
      (2L, "2023-01-01 00:00:00", Some(0.0)),
      (2L, "2023-01-01 12:00:00", None),
      (2L, "2023-01-02 00:00:00", Some(24.0)) // 24h bracket > maxGap
    )
    val out = Imputation
      .linearInterpolate(df, Seq("timeseries_id"), "datetime", "value", maxGapSeconds = Some(4 * 3600L))
      .orderBy("timeseries_id", "datetime")
      .select("filled", "imputed")
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getDouble(0), r.getBoolean(1)))
      .toList
    assert(out == List(
      (10.0, false), (20.0, true), (30.0, true), (40.0, false), (null, false),
      (0.0, false), (null, false), (24.0, false)
    ))
  }

  test("Synchronize.diff classifies insert/update/delete/keep/protected") {
    import spark.implicits._
    val local = Seq(
      (1L, 1.0, false), // keep
      (2L, 2.0, false), // update (remote 2.5)
      (3L, 3.0, false), // delete (absent remote)
      (4L, 4.0, true),  // protected update (remote 4.5)
      (5L, 5.0, true)   // protected delete
    ).toDF("id", "value", "no_update")
    val remote = Seq((1L, 1.0), (2L, 2.5), (4L, 4.5), (6L, 6.0)).toDF("id", "value")
    val out = Synchronize
      .diff(local, remote, Seq("id"), Seq("value"), Some("no_update"))
      .select("id", "action")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out == Map(
      1L -> "keep", 2L -> "update", 3L -> "delete",
      4L -> "protected", 5L -> "protected", 6L -> "insert"
    ))
  }

  test("Synchronize.resolve: remote wins except protected local rows") {
    import spark.implicits._
    val local = Seq((2L, 2.0, false), (4L, 4.0, true), (5L, 5.0, true), (7L, 7.0, false)).toDF("id", "value", "no_update")
    val remote = Seq((2L, 2.5), (4L, 4.5), (6L, 6.0)).toDF("id", "value")
    val out = Synchronize
      .resolve(local, remote, Seq("id"), Seq("value"), "no_update")
      .select("id", "value")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    // 7 deleted (absent remote, not protected); 5 survives (protected);
    // 4 keeps local 4.0; 2 takes remote 2.5; 6 inserted
    assert(out == Map(2L -> 2.5, 4L -> 4.0, 5L -> 5.0, 6L -> 6.0))
  }

  test("Imputation.fillFromDonors: best-ranked co-timestamped donor + offset, rank fallback") {
    import spark.implicits._
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2023-01-01 $h%02d:00:00")
    // target 1: missing at hours 1 and 2. donor 2 (rank 1, offset +10)
    // has hour 1 only; donor 3 (rank 2, offset -5) has both.
    val df = Seq(
      (1L, t(0), Some(100.0)), (1L, t(1), None), (1L, t(2), None),
      (2L, t(0), Some(90.0)), (2L, t(1), Some(95.0)),
      (3L, t(0), Some(80.0)), (3L, t(1), Some(85.0)), (3L, t(2), Some(88.0))
    ).toDF("k", "dt", "v")
    val donors = Seq((1L, 1, 2L, 10.0), (1L, 2, 3L, -5.0))
      .toDF("target", "rank", "donor", "avg_offset")
    val out = Imputation
      .fillFromDonors(df, "k", "dt", "v", donors)
      .filter(col("k") === 1L)
      .collect()
      .map(r => r.getTimestamp(1).toString -> ((Option(r.get(r.fieldIndex("filled"))), r.getBoolean(r.fieldIndex("imputed")))))
      .toMap
    assert(out("2023-01-01 00:00:00.0") == ((Some(100.0), false)))
    assert(out("2023-01-01 01:00:00.0") == ((Some(105.0), true))) // 95 + 10, rank 1
    assert(out("2023-01-01 02:00:00.0") == ((Some(83.0), true))) // 88 - 5, rank-2 fallback
  }
}
