package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AddContinuousSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("manual insert: validation, period assignment, upsert, bounded daily refresh") {
    import spark.implicits._
    val catalog = Seq((1L, "basic"), (2L, "compound")).toDF("timeseries_id", "timeseries_type")
    val measurements = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0, Some(3600L))
    ).toDF("timeseries_id", "datetime", "value", "period_seconds")
    val dailyBase = graft.operators.DailyAggregate(
      measurements.withColumn("agg_type", lit("mean")).withColumn("offset_hours", lit(0))
    )

    // 8 hourly points: the 3-consecutive-changes cadence heuristic
    // needs >= 3 smoothed diffs before it accepts a period
    val hourlyRows = (0 until 8).map(i => (1L, ts(f"2024-01-02 0$i%d:00:00"), (i + 1).toDouble))
    val batch = (hourlyRows ++ Seq(
      (2L, ts("2024-01-02 00:00:00"), 7.0), // compound: rejected
      (9L, ts("2024-01-02 00:00:00"), 8.0)  // unknown series: rejected
    )).toDF("timeseries_id", "datetime", "value")
      .withColumn("imputed", lit(null).cast("boolean"))

    val out = AddContinuous.run(batch, catalog, measurements, dailyBase,
      aggTypes = Map(1L -> ("mean", 0)))

    val rejects = out.rejects.collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(rejects == Set((2L, "compound_timeseries"), (9L, "unknown_timeseries")))

    val acc = out.accepted.orderBy("datetime").collect()
    assert(acc.length == 8)
    assert(acc.forall(!_.getAs[Boolean]("imputed")))
    assert(acc.forall(_.getAs[Long]("period_seconds") == 3600L))

    // store: 1 existing + 8 new
    assert(out.measurements.count() == 9)

    // daily: Jan 1 row untouched, Jan 2 mean of 1..8 = 4.5
    val daily = out.daily.orderBy("date").collect()
    assert(daily.length == 2)
    assert(daily(1).getAs[Double]("value") == 4.5)
  }
}
