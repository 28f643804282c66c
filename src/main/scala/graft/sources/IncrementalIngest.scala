package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental "new data since last point" ingest driver —
  * `getNewContinuous` (`R/getNewContinuous.R:31` in
  * YukonWRB/AquaCache): per active series, find the last stored
  * point, dispatch the registered `source_fx` adapter from
  * last + 1 second, validate/filter, default-fill, and append.
  *
  * Spark shape: the catalog is metadata (driver-side loop over
  * series, like the reference's worker pool); each adapter returns a
  * DataFrame and the union is ONE append job. Last-point lookup is a
  * single groupBy(max) over the fact table — partition-pruned when
  * the table is partitioned by series bucket. Per-series writer
  * exclusivity comes from shuffle-by-key (SURVEY §2.10): one task
  * owns one series' rows.
  */
object IncrementalIngest {

  /** @return the new measurement rows to append (canonical schema +
    *         timeseries_id), strictly after each series' last point
    */
  def getNewContinuous(
      spark: SparkSession,
      catalog: Seq[SeriesConfig],
      measurements: DataFrame,
      registry: AdapterRegistry
  ): DataFrame = {
    import spark.implicits._
    val lastPoints: Map[Long, java.sql.Timestamp] = measurements
      .groupBy(col("timeseries_id"))
      .agg(max(col("datetime")).as("last_dt"))
      .as[(Long, java.sql.Timestamp)]
      .collect()
      .toMap

    def startOf(cfg: SeriesConfig): java.sql.Timestamp =
      lastPoints
        .get(cfg.timeseriesId)
        .map(t => new java.sql.Timestamp(t.getTime + 1000L))
        .getOrElse(java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))

    def guard(fetched: DataFrame, cfg: SeriesConfig): DataFrame = {
      val guarded = lastPoints.get(cfg.timeseriesId) match {
        // re-check under the "lock": never re-append the last point
        case Some(t) => fetched.filter(col("datetime") > lit(t))
        case None    => fetched
      }
      guarded
        .withColumn("timeseries_id", lit(cfg.timeseriesId))
        .withColumn("grade", coalesce(col("grade"), lit(cfg.defaultGrade.orNull)))
        .withColumn("approval", coalesce(col("approval"), lit(cfg.defaultApproval.orNull)))
        .withColumn(
          "period_seconds",
          coalesce(col("period_seconds"), lit(cfg.recordRateSeconds.map(Long.box).orNull))
        )
    }

    // cache-sharing task groups (`R/getNewContinuous.R:286-316`):
    // series of a SharedFetchAdapter with equal cache keys share ONE
    // fetch from the earliest start; everything else fetches per series
    val known = catalog.filter(c => registry.contains(c.sourceFx))
    val frames = known.groupBy(_.sourceFx).toSeq.sortBy(_._1).flatMap {
      case (fx, cfgs) =>
        registry(fx) match {
          case sa: SharedFetchAdapter =>
            cfgs.groupBy(sa.cacheKey).toSeq.sortBy(_._1).flatMap { case (_, group) =>
              val earliest = group.map(startOf).minBy(_.getTime)
              val shared0 = sa.fetchShared(spark, group, earliest)
              // barrier: N extracts must not re-run the fetch
              val shared = if (group.size > 1) shared0.localCheckpoint(false) else shared0
              group.map(cfg => guard(sa.extract(shared, cfg), cfg))
            }
          case adapter =>
            cfgs.map(cfg => guard(adapter.fetch(spark, cfg, startOf(cfg)), cfg))
        }
    }
    if (frames.isEmpty)
      spark.emptyDataFrame
    else frames.reduce(_.unionByName(_))
  }

  /** Changed ranges per series from an appended batch — the input of
    * the incremental daily recompute (the reference's statement
    * triggers collect exactly (tsid, min, max) of touched rows,
    * `inst/patches/patch_41.R:2951-2992`).
    */
  def changedRanges(appended: DataFrame): DataFrame =
    appended
      .groupBy(col("timeseries_id"))
      .agg(min(col("datetime")).as("range_start"), max(col("datetime")).as("range_end"))
}
