package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalog datetime-bounds maintenance — the reference keeps
  * `timeseries.start_datetime` / `end_datetime` / `last_new_data`
  * consistent with the measurement tables via statement triggers
  * (`inst/patches/patch_41.R:618-960` in YukonWRB/AquaCache:
  * `refresh_basic_timeseries_datetime_bounds`,
  * `refresh_basic_metadata_on_measurements_insert`). Here the same
  * contracts are batch merges a write job chains after its append:
  * the per-series extrema aggregate map-side-combines down to one row
  * per touched series (bounded by the catalog, never by the batch),
  * and the catalog join broadcasts that aggregate — no shuffle of
  * either the batch or the catalog, so the maintenance step costs one
  * pass over the appended partition files at any scale.
  */
object BoundsMaintenance {

  /** The AFTER INSERT statement trigger
    * (`refresh_basic_metadata_on_measurements_insert`,
    * `inst/patches/patch_41.R:877-915`): per-series (min, max)
    * `datetime` of the appended batch merged into the catalog with
    * null-safe LEAST/GREATEST, and `last_new_data` stamped `asOf` on
    * every touched series. Only `timeseries_type = 'basic'` rows
    * update; untouched and non-basic rows pass through unchanged.
    *
    * `catalog` needs (timeseries_id, timeseries_type, start_datetime,
    * end_datetime, last_new_data); `batch` needs (timeseries_id,
    * datetime). `asOf` stands in for the trigger's CURRENT_TIMESTAMP
    * so replays are deterministic.
    */
  def mergeInsertBounds(catalog: DataFrame, batch: DataFrame, asOf: Column): DataFrame = {
    val ins = batch
      .groupBy(col("timeseries_id"))
      .agg(min(col("datetime")).as("__ins_start"), max(col("datetime")).as("__ins_end"))
    val touched =
      coalesce(col("__ins_start").isNotNull && col("timeseries_type") === "basic", lit(false))
    catalog
      .join(broadcast(ins), Seq("timeseries_id"), "left")
      .withColumn(
        "start_datetime",
        when(!touched, col("start_datetime"))
          .when(col("start_datetime").isNull, col("__ins_start"))
          .otherwise(least(col("start_datetime"), col("__ins_start")))
      )
      .withColumn(
        "end_datetime",
        when(!touched, col("end_datetime"))
          .when(col("end_datetime").isNull, col("__ins_end"))
          .otherwise(greatest(col("end_datetime"), col("__ins_end")))
      )
      .withColumn("last_new_data", when(touched, asOf).otherwise(col("last_new_data")))
      .drop("__ins_start", "__ins_end")
  }

  /** The exact recompute
    * (`refresh_basic_timeseries_datetime_bounds`,
    * `inst/patches/patch_41.R:618-676`): start/end per series as the
    * null-skipping MIN/MAX over BOTH fact tables (realtime
    * measurements and calculated daily — either may have no rows for a
    * series), replacing the stored bounds on every 'basic' catalog
    * row. The delete/update triggers route here; an insert-only path
    * uses the cheaper [[mergeInsertBounds]].
    *
    * Column contract: `catalog` carries (timeseries_id,
    * timeseries_type, start_datetime, end_datetime); `continuous`
    * carries (timeseries_id, datetime); `daily` carries
    * (timeseries_id, datetime) OR the daily table's native
    * (timeseries_id, date) — a `date`-typed column is cast to a UTC
    * midnight timestamp inside, matching the reference's
    * `date::timestamp AT TIME ZONE 'UTC'` in patch_41.
    *
    * Cardinality: unlike [[mergeInsertBounds]]' batch-touched-series
    * aggregate, this aggregate has one row per series WITH DATA —
    * catalog-sized, potentially millions of rows at the 100 TB
    * target. No broadcast hint here for that reason: the join keys
    * match, and AQE picks broadcast when the aggregate measures small
    * and a shuffle join when it doesn't.
    */
  def refreshBasicBounds(catalog: DataFrame, continuous: DataFrame, daily: DataFrame): DataFrame = {
    val dailyTs =
      if (daily.columns.contains("datetime")) daily
      else
        // date -> midnight timestamp in the session timezone; engine
        // sessions here pin spark.sql.session.timeZone=UTC, so this is
        // the reference's `date::timestamp AT TIME ZONE 'UTC'`
        daily.withColumn("datetime", col("date").cast("timestamp"))
    def bounds(df: DataFrame, s: String, e: String) =
      df.groupBy(col("timeseries_id"))
        .agg(min(col("datetime")).as(s), max(col("datetime")).as(e))
    val b = bounds(continuous, "__rs", "__re")
      .join(bounds(dailyTs, "__ds", "__de"), Seq("timeseries_id"), "full")
      // Spark least/greatest skip NULLs (null only when all inputs
      // are), mirroring the reference's MIN/MAX-over-VALUES shape
      .select(
        col("timeseries_id"),
        least(col("__rs"), col("__ds")).as("__bs"),
        greatest(col("__re"), col("__de")).as("__be")
      )
    val basic = col("timeseries_type") === "basic"
    catalog
      .join(b, Seq("timeseries_id"), "left")
      .withColumn("start_datetime", when(basic, col("__bs")).otherwise(col("start_datetime")))
      .withColumn("end_datetime", when(basic, col("__be")).otherwise(col("end_datetime")))
      .drop("__bs", "__be")
  }
}
