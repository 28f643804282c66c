package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maintenance jobs: retention deletes, tail trimming, Feb-29
  * leap-day interpolation.
  */
object TableMaintenance {

  /** Small-file compaction — the OPTIMIZE role of the reference's
    * maintenance pass (`R/maintain.R:18-25` runs VACUUM/ANALYZE; on a
    * parquet lake the equivalent debt is thousands of tiny files from
    * incremental appends). Rewrites a directory into
    * `ceil(bytes / targetFileBytes)` files, sorted within partitions
    * on `sortCols` so row-group min/max statistics survive the
    * rewrite. Returns (filesBefore, filesAfter).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil
  ): (Int, Int) = {
    val dir = new java.io.File(path)
    def parquetFiles = Option(dir.listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val arranged =
      if (sortCols.nonEmpty)
        df.repartition(nOut).sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    val tmp = path.stripSuffix("/") + "__compacting"
    arranged.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap (at scale: write to a new table version / Delta
    // OPTIMIZE; plain parquet gets a directory swap)
    val bak = path.stripSuffix("/") + "__old"
    new java.io.File(path).renameTo(new java.io.File(bak))
    new java.io.File(tmp).renameTo(new java.io.File(path))
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
      f.delete()
    }
    delete(new java.io.File(bak))
    (before.length, parquetFiles.length)
  }

  /** Forecast retention: rows older than `maxAgeSeconds` before `now`
    * are dropped (`inst/patches/patch_55.R:175-213` in
    * YukonWRB/AquaCache deletes forecasts older than 2 weeks).
    */
  def retain(df: DataFrame, tsCol: String, now: String, maxAgeSeconds: Long): DataFrame =
    df.filter(col(tsCol) >= lit(now).cast("timestamp") - expr(s"INTERVAL $maxAgeSeconds SECOND"))

  /** Tail trimming (`trim_continuous_timeseries_tail`,
    * `inst/patches/patch_48.R:113-175`): derived daily rows past the
    * series' last real measurement are deleted, and QC segments are
    * clamped so nothing extends past the last point — segments
    * starting after it are dropped entirely.
    */
  def trimDailyTail(
      daily: DataFrame,
      measurements: DataFrame,
      seriesId: String = "timeseries_id",
      dateCol: String = "date",
      dtCol: String = "datetime"
  ): DataFrame = {
    val last = measurements
      .groupBy(col(seriesId))
      .agg(max(to_date(col(dtCol))).as("__last_day"))
    daily
      .join(broadcast(last), Seq(seriesId), "left")
      .filter(col("__last_day").isNull || col(dateCol) <= col("__last_day"))
      .drop("__last_day")
  }

  def trimSegmentTail(
      segments: DataFrame,
      measurements: DataFrame,
      seriesId: String = "timeseries_id",
      dtCol: String = "datetime"
  ): DataFrame = {
    val last = measurements
      .groupBy(col(seriesId))
      .agg(max(col(dtCol)).as("__last_dt"))
    segments
      .join(broadcast(last), Seq(seriesId), "left")
      .filter(col("__last_dt").isNull || col("start_dt") <= col("__last_dt"))
      .withColumn(
        "end_dt",
        when(col("__last_dt").isNotNull && col("end_dt") > col("__last_dt"), col("__last_dt"))
          .otherwise(col("end_dt"))
      )
      .drop("__last_dt")
  }

  /** Feb-29 leap-day stats interpolation
    * (`inst/patches/patch_41.R:2847-2914`): each Feb 29 daily row gets
    * its historical stats as the elementwise mean of the same year's
    * Feb 28 and Mar 1 rows, with `doy_count` = LEAST of the two; rows
    * stay untouched when either neighbor is missing.
    */
  def feb29Interpolate(
      daily: DataFrame,
      seriesKey: String,
      dateCol: String,
      statCols: Seq[String],
      countCol: String = "doy_count"
  ): DataFrame = {
    def neighbor(m: Int, dd: Int, prefix: String) =
      daily
        .filter(month(col(dateCol)) === m && dayofmonth(col(dateCol)) === dd)
        .select(
          Seq(col(seriesKey), year(col(dateCol)).as("__yr")) ++
            (statCols :+ countCol).map(c => col(c).as(s"$prefix$c")): _*
        )
    val feb28 = neighbor(2, 28, "a_")
    val mar1 = neighbor(3, 1, "b_")
    val feb29 = daily
      .filter(month(col(dateCol)) === 2 && dayofmonth(col(dateCol)) === 29)
      .withColumn("__yr", year(col(dateCol)))
      .join(broadcast(feb28), Seq(seriesKey, "__yr"), "left")
      .join(broadcast(mar1), Seq(seriesKey, "__yr"), "left")
    val bothPresent = col(s"a_$countCol").isNotNull && col(s"b_$countCol").isNotNull
    val filled = statCols.foldLeft(feb29) { (d, c) =>
      d.withColumn(c, when(bothPresent, (col(s"a_$c") + col(s"b_$c")) / 2.0).otherwise(col(c)))
    }
    val withCount = filled
      .withColumn(countCol, when(bothPresent, least(col(s"a_$countCol"), col(s"b_$countCol"))).otherwise(col(countCol)))
      .select(daily.columns.map(col): _*)
    daily
      .filter(!(month(col(dateCol)) === 2 && dayofmonth(col(dateCol)) === 29))
      .unionByName(withCount)
  }
}
