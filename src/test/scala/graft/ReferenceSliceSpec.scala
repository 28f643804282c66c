package graft

import graft.operators.CorrectedReader.{Catalog, CompoundDef}
import graft.operators.{CorrectedReader, DailyAggregate, DoyStats}
import graft.sources.{SeriesConfig, SyntheticAdapter}
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice: the reference's own fixture
  * series -> one fixture correction -> corrected read -> daily mean ->
  * DOY historical stats with percent_historic_range — the exact read
  * path of `continuous.measurements_calculated_daily` fed by
  * `refresh_calculated_daily`, asserted against hand-computed values
  * of the fixture formula (`R/create_test_DB.R:874-1053`).
  */
class ReferenceSliceSpec extends SparkSpec {

  private val from = "2021-01-01 00:00:00"
  private val to = "2023-02-01 00:00:00"

  private def fixtureValue(epoch: Long): Double =
    BigDecimal(10.0 + math.sin(epoch / 86400.0) * 0.25)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  private lazy val corrected = {
    import spark.implicits._
    val cfg = SeriesConfig(
      1L, "downloadSynthetic",
      Map("series" -> "water_level", "step_seconds" -> "3600", "from" -> from, "to" -> to)
    )
    val measurements = SyntheticAdapter
      .fetch(spark, cfg, java.sql.Timestamp.valueOf(from))
      .withColumn("timeseries_id", lit(1L))
      .select("timeseries_id", "datetime", "value")
    // the fixture correction: offset +0.25 on 2023-01-03 -> 2023-01-05
    val corrections = Seq(
      (1L, 1L, "2023-01-03 00:00:00", "2023-01-05 00:00:00", "offset_linear", Some(0.25), Option.empty[Double], Option.empty[Long], Option.empty[String], 1)
    ).toDF("correction_id", "timeseries_id", "start_s", "end_s", "ctype", "value1", "value2", "window_seconds", "equation", "priority")
      .withColumn("start_dt", to_timestamp(col("start_s")))
      .withColumn("end_dt", to_timestamp(col("end_s")))
      .drop("start_s", "end_s")
    val cat = Catalog(measurements, corrections, Map.empty[Long, CompoundDef], Set(1L))
    CorrectedReader.read(cat, 1L, from, to)
  }

  test("corrected read applies the fixture correction exactly inside its window") {
    val at = (s: String) => java.sql.Timestamp.valueOf(s)
    val byDt = corrected
      .filter(col("datetime").isin(at("2023-01-03 12:00:00"), at("2023-01-02 12:00:00")))
      .collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(1))
      .toMap
    val e3 = at("2023-01-03 12:00:00").getTime / 1000L
    val e2 = at("2023-01-02 12:00:00").getTime / 1000L
    assert(math.abs(byDt("2023-01-03 12:00:00.0") - (fixtureValue(e3) + 0.25)) < 1e-9)
    assert(math.abs(byDt("2023-01-02 12:00:00.0") - fixtureValue(e2)) < 1e-9)
  }

  test("daily mean and DOY stats over the corrected series match hand computation") {
    val daily = DailyAggregate(
      corrected
        .withColumn("timeseries_id", lit(1L))
        .withColumn("agg_type", lit("mean"))
        .withColumn("offset_hours", lit(0))
    )
    val jan3 = daily.filter(col("date") === "2023-01-03").select("value").head().getDouble(0)
    val base = java.sql.Timestamp.valueOf("2023-01-03 00:00:00").getTime / 1000L
    val expected = (0 until 24).map(h => fixtureValue(base + h * 3600L) + 0.25).sum / 24.0
    assert(math.abs(jan3 - expected) < 1e-9, s"daily mean $jan3 vs $expected")

    val doy = DoyStats(
      daily.withColumn("series_key", lit("1")),
      seriesKey = "series_key",
      dateCol = "date",
      valueCol = "value"
    )
    val row = doy.filter(col("date") === "2023-01-03").head()
    assert(row.getLong(row.fieldIndex("doy_count")) == 2L, "two prior years share DOY Jan 3")
    val mn = row.getDouble(row.fieldIndex("min"))
    val mx = row.getDouble(row.fieldIndex("max"))
    val q50 = row.getDouble(row.fieldIndex("q50"))
    assert(mn <= q50 && q50 <= mx)
    val phr = row.getDouble(row.fieldIndex("percent_historic_range"))
    // Jan 3 2023 carries the +0.25 correction; prior years don't -> above range
    assert(phr > 100.0, s"corrected value must sit above the uncorrected history, phr=$phr")
  }
}
