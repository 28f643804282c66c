package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceUpsertSpec extends SparkSpec {

  test("Upsert: DoNothing keeps target rows, DoUpdate replaces them; last update wins") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "value")
    val updates = Seq((2L, "b", 99.0), (2L, "b", 98.0), (3L, "c", 30.0))
      .toDF("id", "k", "value")
      .withColumn("batch_pos", monotonically_increasing_id())
    val nothing = Upsert(target, updates.drop("batch_pos"), Seq("id"), Upsert.DoNothing)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nothing == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    val update = Upsert(target, updates, Seq("id"), Upsert.DoUpdate, orderCol = Some("batch_pos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(update == Map(1L -> 10.0, 2L -> 98.0, 3L -> 30.0))
  }

  test("Upsert resolves conflicting duplicate keys by a total order (retry-stable)") {
    import spark.implicits._
    val target = Seq((1L, "z", 1.0)).toDF("id", "k", "value")
    // no orderCol: max over the payload struct — ("c", 30.0) beats ("a", 99.0)
    val noOrd = Upsert(
      target,
      Seq((3L, "c", 30.0), (3L, "a", 99.0)).toDF("id", "k", "value"),
      Seq("id"),
      Upsert.DoUpdate
    ).collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(noOrd(3L) == ("c", 30.0))
    // tied orderCol: tie broken by the remaining columns, never scan order
    val tied = Upsert(
      target,
      Seq((3L, "a", 99.0, 7L), (3L, "c", 30.0, 7L)).toDF("id", "k", "value", "seq"),
      Seq("id"),
      Upsert.DoUpdate,
      orderCol = Some("seq")
    ).collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(tied(3L) == ("c", 30.0))
  }

  test("compact rewrites many small files into few, preserving rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, i % 40L, i * 0.5)).toDF("id", "k", "v")
    df.repartition(40).write.parquet(dir) // 40 tiny files
    val (before, after) = TableMaintenance
      .compact(spark, dir, targetFileBytes = 10L * 1024 * 1024, sortCols = Seq("k", "id"))
    assert(before == 40)
    assert(after == 1, s"all rows fit one target-size file, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) == 5000L * 5001 / 2)
  }

  test("retain drops rows older than the window") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2023-12-31 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
    ).toDF("id", "ts")
    val kept = TableMaintenance
      .retain(df, "ts", "2024-01-15 00:00:00", 14 * 86400L)
      .collect().map(_.getLong(0)).toList
    assert(kept == List(2L))
  }

  test("trimDailyTail and trimSegmentTail clamp to the last measurement") {
    import spark.implicits._
    val meas = Seq((1L, java.sql.Timestamp.valueOf("2024-01-10 06:00:00")))
      .toDF("timeseries_id", "datetime")
    val daily = Seq(
      (1L, java.sql.Date.valueOf("2024-01-10")),
      (1L, java.sql.Date.valueOf("2024-01-11")), // past last -> trimmed
      (2L, java.sql.Date.valueOf("2024-02-01")) // no measurements -> kept
    ).toDF("timeseries_id", "date")
    assert(
      TableMaintenance.trimDailyTail(daily, meas).collect()
        .map(r => (r.getLong(0), r.getDate(1).toString)).toSet ==
        Set((1L, "2024-01-10"), (2L, "2024-02-01"))
    )
    val segs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.sql.Timestamp.valueOf("2024-01-20 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-12 00:00:00"), java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    ).toDF("timeseries_id", "start_dt", "end_dt")
    val trimmed = TableMaintenance.trimSegmentTail(segs, meas).collect()
    assert(trimmed.length == 1) // segment starting past last point dropped
    assert(trimmed.head.getTimestamp(2).toString == "2024-01-10 06:00:00.0") // end clamped
  }

  test("feb29Interpolate averages Feb 28 / Mar 1 stats with LEAST count") {
    import spark.implicits._
    val daily = Seq(
      ("a", java.sql.Date.valueOf("2020-02-28"), Some(10.0), 4L),
      ("a", java.sql.Date.valueOf("2020-02-29"), None, 0L),
      ("a", java.sql.Date.valueOf("2020-03-01"), Some(20.0), 6L),
      ("b", java.sql.Date.valueOf("2020-02-29"), None, 0L) // no neighbors
    ).toDF("series_key", "date", "mean", "doy_count")
    val out = TableMaintenance
      .feb29Interpolate(daily, "series_key", "date", Seq("mean"))
      .filter(month(col("date")) === 2 && dayofmonth(col("date")) === 29)
      .collect()
      .map(r => r.getString(0) -> ((if (r.isNullAt(2)) null else r.getDouble(2)), r.getLong(3)))
      .toMap
    assert(out("a") == ((15.0, 4L)))
    assert(out("b") == ((null, 0L)))
  }
}
