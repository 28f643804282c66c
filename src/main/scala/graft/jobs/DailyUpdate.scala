package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.{AdapterRegistry, IncrementalIngest, SeriesConfig}

/** The batch ingest+derive pipeline — `dailyUpdate()`
  * (`R/dailyUpdate.R:27` in YukonWRB/AquaCache, lifecycle SURVEY
  * §3.1): fetch new points per series from the registered sources,
  * upsert into the measurement store, derive corrected values, and
  * incrementally refresh the daily + DOY statistics for exactly the
  * changed ranges.
  *
  * Execution shape on a cluster: steps 1-2 are one append job
  * (shuffle on the series key = single writer per series); step 3 is
  * map-side (broadcast corrections); steps 4-5 scan only partitions
  * covered by the changed ranges. Nothing recomputes full history.
  */
object DailyUpdate {

  final case class Result(
      appended: DataFrame,
      measurements: DataFrame,
      corrected: DataFrame,
      daily: DataFrame,
      changedRanges: DataFrame
  )

  /** @param catalog     active series configs (source_fx dispatch,
    *                     defaults, agg types via `aggTypes`)
    * @param measurements current measurement store
    * @param dailyBase    current daily table (refreshed incrementally)
    * @param corrections  correction dimension (may be empty)
    * @param aggTypes     per-series (agg_type, offset_hours)
    */
  def run(
      spark: SparkSession,
      catalog: Seq[SeriesConfig],
      measurements: DataFrame,
      dailyBase: DataFrame,
      corrections: DataFrame,
      registry: AdapterRegistry,
      aggTypes: Map[Long, (String, Int)]
  ): Result = {
    import spark.implicits._

    // 1. incremental fetch (last-point watermark per series)
    val appended = IncrementalIngest
      .getNewContinuous(spark, catalog, measurements, registry)
      .select("timeseries_id", "datetime", "value", "period_seconds")

    // 2. upsert into the store (conflict on (series, datetime): new wins)
    val merged = Upsert(
      measurements.select("timeseries_id", "datetime", "value", "period_seconds"),
      appended,
      keys = Seq("timeseries_id", "datetime"),
      mode = Upsert.DoUpdate
    )

    // 3. corrected values (broadcast fold; pass-through when empty)
    val corrected =
      if (corrections.isEmpty) merged.withColumn("corrected", col("value"))
      else Corrections(merged, corrections)

    // 4. changed ranges -> bounded daily recompute
    val changes = IncrementalIngest.changedRanges(appended)
    val aggMap = typedLit(aggTypes.map { case (k, v) => k -> v._1 })
    val offMap = typedLit(aggTypes.map { case (k, v) => k -> v._2 })
    val withMeta = corrected
      .withColumn("agg_type", coalesce(aggMap(col("timeseries_id")), lit("mean")))
      .withColumn("offset_hours", coalesce(offMap(col("timeseries_id")), lit(0)))
      .withColumn("value", col("corrected"))
    val daily = IncrementalDaily.refresh(withMeta, dailyBase, changes)

    Result(appended, merged, corrected, daily, changes)
  }

  /** DOY historical stats over the refreshed daily frame, recomputed
    * only for the (series, doy) groups the changed days touch.
    */
  def refreshDoyStats(daily: DataFrame, changes: DataFrame): DataFrame = {
    val changedDays = changes.select(
      col("timeseries_id"),
      explode(
        sequence(to_date(col("range_start")), to_date(col("range_end")))
      ).as("date")
    )
    val scoped = IncrementalDaily.affectedDoyScope(daily, changedDays)
    DoyStats(
      scoped.withColumn("series_key", col("timeseries_id").cast("string")),
      seriesKey = "series_key",
      dateCol = "date",
      valueCol = "value"
    )
  }
}
