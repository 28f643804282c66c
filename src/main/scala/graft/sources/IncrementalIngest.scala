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
    *
    * Scale notes: adapter fetches are parameterized by a per-series
    * start timestamp, which MUST exist at driver time — but the
    * collection is explicitly bounded to the WORKLIST (the catalog
    * passed in, already driver-resident metadata), never O(all series
    * in the fact table): the last-point aggregate is semi-joined to
    * the catalog ids first. The correctness-critical "never re-append
    * at-or-before the last point" guard is NOT the driver map — it is
    * a distributed broadcast join against the last-point frame, so a
    * fetched batch of any size is filtered executor-side.
    */
  def getNewContinuous(
      spark: SparkSession,
      catalog: Seq[SeriesConfig],
      measurements: DataFrame,
      registry: AdapterRegistry
  ): DataFrame = {
    import spark.implicits._
    val known = catalog.filter(c => registry.contains(c.sourceFx))
    val catalogIds = known.map(_.timeseriesId)
    // bounded by |worklist|: prune the fact scan to cataloged series
    // (partition/bucket-pruned under TableLayout) before aggregating
    val lastPointsDf = measurements
      .filter(col("timeseries_id").isin(catalogIds: _*))
      .groupBy(col("timeseries_id"))
      .agg(max(col("datetime")).as("last_dt"))
    val lastPoints: Map[Long, java.sql.Timestamp] = lastPointsDf
      .as[(Long, java.sql.Timestamp)]
      .collect()
      .toMap

    def startOf(cfg: SeriesConfig): java.sql.Timestamp =
      lastPoints
        .get(cfg.timeseriesId)
        .map(t => new java.sql.Timestamp(t.getTime + 1000L))
        .getOrElse(java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))

    def normalize(fetched: DataFrame, cfg: SeriesConfig): DataFrame =
      fetched
        .withColumn("timeseries_id", lit(cfg.timeseriesId))
        .withColumn("grade", coalesce(col("grade"), lit(cfg.defaultGrade.orNull)))
        .withColumn("approval", coalesce(col("approval"), lit(cfg.defaultApproval.orNull)))
        .withColumn(
          "period_seconds",
          coalesce(col("period_seconds"), lit(cfg.recordRateSeconds.map(Long.box).orNull))
        )

    // cache-sharing task groups (`R/getNewContinuous.R:286-316`):
    // series of a SharedFetchAdapter with equal cache keys share ONE
    // fetch from the earliest start; everything else fetches per series
    val frames = known.groupBy(_.sourceFx).toSeq.sortBy(_._1).flatMap {
      case (fx, cfgs) =>
        registry(fx) match {
          case sa: SharedFetchAdapter =>
            cfgs.groupBy(sa.cacheKey).toSeq.sortBy(_._1).flatMap { case (_, group) =>
              val earliest = group.map(startOf).minBy(_.getTime)
              val shared0 = sa.fetchShared(spark, group, earliest)
              // barrier: N extracts must not re-run the fetch
              val shared = if (group.size > 1) shared0.localCheckpoint(false) else shared0
              group.map(cfg => normalize(sa.extract(shared, cfg), cfg))
            }
          case adapter =>
            cfgs.map(cfg => normalize(adapter.fetch(spark, cfg, startOf(cfg)), cfg))
        }
    }
    if (frames.isEmpty)
      spark.emptyDataFrame
    else {
      // re-check under the "lock" as a distributed join: never
      // re-append a row at-or-before the series' stored last point
      frames
        .reduce(_.unionByName(_))
        .join(broadcast(lastPointsDf), Seq("timeseries_id"), "left")
        .filter(col("last_dt").isNull || col("datetime") > col("last_dt"))
        .drop("last_dt")
    }
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
