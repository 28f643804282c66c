package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical layout for the 100 TB deployment (SURVEY §4): the
  * measurement fact table is written bucketed by a hash of the series
  * id and partitioned by event month, rows sorted by (series,
  * datetime) within files.
  *
  *   - month partition pruning bounds every incremental-recompute and
  *     windowed-read scan (the reference's btree (tsid, datetime DESC)
  *     role);
  *   - the series-hash bucket column co-locates a series' rows so
  *     per-series `flatMapGroups` scans and last-point lookups touch
  *     few partitions (advisory-lock/single-writer role);
  *   - within-file sort gives min/max row-group statistics -> data
  *     skipping on both series and time predicates.
  */
object TableLayout {

  val DefaultBuckets = 256

  def withLayoutColumns(
      df: DataFrame,
      seriesCol: String = "timeseries_id",
      dtCol: String = "datetime",
      nBuckets: Int = DefaultBuckets
  ): DataFrame =
    df.withColumn("series_bucket", pmod(hash(col(seriesCol)), lit(nBuckets)))
      .withColumn("event_month", date_format(col(dtCol), "yyyy-MM"))

  /** Write the measurement table in the scale layout. */
  def writeMeasurements(
      df: DataFrame,
      path: String,
      seriesCol: String = "timeseries_id",
      dtCol: String = "datetime",
      nBuckets: Int = DefaultBuckets,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    withLayoutColumns(df, seriesCol, dtCol, nBuckets)
      .repartition(col("event_month"), col("series_bucket"))
      .sortWithinPartitions(col(seriesCol), col(dtCol))
      .write
      .partitionBy("event_month", "series_bucket")
      .mode(mode)
      .parquet(path)

  /** Catalog-registered BUCKETED table (`bucketBy` + `sortBy` +
    * `saveAsTable`): two tables bucketed identically on the join key
    * sort-merge-join with NO shuffle and NO sort — the co-located
    * join (SURVEY §4). Directory partitioning (above) prunes scans;
    * bucketing additionally pins the shuffle layout, which is what a
    * repeated fact ⋈ fact join on `timeseries_id` needs at 100 TB.
    */
  def writeBucketedTable(
      df: DataFrame,
      tableName: String,
      keyCol: String,
      nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.write
      .format("parquet")
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .mode(mode)
      .saveAsTable(tableName)

  /** Windowed per-series read — partition-pruned by month and bucket. */
  def readSeriesWindow(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      seriesId: Long,
      from: String,
      to: String,
      nBuckets: Int = DefaultBuckets
  ): DataFrame = {
    val bucket = math.floorMod(
      org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(seriesId, 42),
      nBuckets
    )
    spark.read
      .parquet(path)
      .filter(
        col("series_bucket") === bucket &&
          col("event_month") >= from.substring(0, 7) &&
          col("event_month") <= to.substring(0, 7) &&
          col("timeseries_id") === seriesId &&
          col("datetime") >= lit(from).cast("timestamp") &&
          col("datetime") < lit(to).cast("timestamp")
      )
  }
}
