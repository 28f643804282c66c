package graft.operators

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Day-of-year historical statistics over a daily series: for each
  * daily row, statistics of all PRIOR years' values on the same
  * normalized day-of-year — count, min, max, mean, exact interpolated
  * quantiles (q10/q25/q50/q75/q90) and
  * `percent_historic_range = (v - min)/(max - min) * 100`.
  *
  * Reference: `inst/patches/patch_41.R:2734-2845` (all-history) and
  * the rolling-30-year variants `inst/patches/patch_48.R:89-104` in
  * YukonWRB/AquaCache. Normalized DOY (`:2471-2491`): Feb 29 -> NULL,
  * and in leap years days after Feb 29 get doy - 1 so calendar days
  * align across years.
  *
  * Spark-first design: the reference's O(n·years) per-DOY self-join
  * is replaced by ONE ordered scan per (series, doy) group via
  * `flatMapGroups`. Each group holds at most one row per year
  * (≤ a few hundred values even for century-long records), so state is
  * bounded and groups parallelize across the cluster — at 100 TB this
  * is a single shuffle on (series, doy) followed by embarrassingly
  * parallel tiny-group scans; exact percentiles never need a global
  * sort or window `collect_list`.
  */
object DoyStats {

  /** Normalized day-of-year as a Column (Feb 29 -> NULL; leap-year
    * days after Feb 29 shifted down by one).
    */
  def normalizedDoy(date: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val isLeap = (year(date) % 4 === 0 && year(date) % 100 =!= 0) || (year(date) % 400 === 0)
    when(month(date) === 2 && dayofmonth(date) === 29, lit(null))
      .when(isLeap && dayofyear(date) > 60, dayofyear(date) - 1)
      .otherwise(dayofyear(date))
  }

  /** Exact percentile_cont (linear interpolation) on a sorted array. */
  def percentileCont(sorted: IndexedSeq[Double], p: Double): Double = {
    val n = sorted.length
    if (n == 1) sorted(0)
    else {
      val h = (n - 1) * p
      val lo = math.floor(h).toInt
      val hi = math.min(lo + 1, n - 1)
      sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }
  }

  private val statFields = Seq(
    StructField("doy_count", LongType, nullable = false),
    StructField("min", DoubleType, nullable = true),
    StructField("max", DoubleType, nullable = true),
    StructField("mean", DoubleType, nullable = true),
    StructField("q10", DoubleType, nullable = true),
    StructField("q25", DoubleType, nullable = true),
    StructField("q50", DoubleType, nullable = true),
    StructField("q75", DoubleType, nullable = true),
    StructField("q90", DoubleType, nullable = true),
    StructField("percent_historic_range", DoubleType, nullable = true)
  )

  /** @param daily         one row per (seriesKey, date): seriesKey
    *                      STRING, `dateCol` DATE, `valueCol` DOUBLE
    * @param rollingYears  None = all prior history; Some(y) = only
    *                      prior dates >= date - y years (the `_30yr`
    *                      family with y = 30)
    */
  def apply(
      daily: DataFrame,
      seriesKey: String = "series_key",
      dateCol: String = "date",
      valueCol: String = "value",
      rollingYears: Option[Int] = None
  ): DataFrame = {
    val outSchema = StructType(
      Seq(
        StructField(seriesKey, StringType, nullable = true),
        StructField(dateCol, DateType, nullable = true),
        StructField(valueCol, DoubleType, nullable = true)
      ) ++ statFields
    )
    val prepared = daily
      .select(
        col(seriesKey).cast(StringType),
        col(dateCol).cast(DateType),
        col(valueCol).cast(DoubleType),
        normalizedDoy(col(dateCol)).cast(IntegerType).as("ndoy")
      )

    import prepared.sparkSession.implicits._
    val enc = Encoders.row(outSchema)
    prepared
      .groupByKey { r =>
        val nd = if (r.isNullAt(3)) -1 else r.getInt(3)
        (r.getString(0), nd)
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaInt))
      .flatMapGroups { (key: (String, Int), it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(r => r.getDate(1).getTime)
        val history = ArrayBuffer.empty[(LocalDate, Double)] // date order
        rows.iterator.map { r =>
          val date = r.getDate(1).toLocalDate
          val v = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
          val stats: Seq[Any] =
            if (key._2 == -1) Seq(0L, null, null, null, null, null, null, null, null, null)
            else {
              val cutoff = rollingYears.map(y => date.minusYears(y.toLong))
              val prior = cutoff match {
                case Some(c) => history.filter { case (d, _) => !d.isBefore(c) }
                case None    => history
              }
              if (prior.isEmpty) Seq(0L, null, null, null, null, null, null, null, null, null)
              else {
                val vals = prior.map(_._2).toArray
                java.util.Arrays.sort(vals)
                val mn = vals.head
                val mx = vals.last
                val mean = vals.sum / vals.length
                val pct =
                  if (v == null || mx == mn) null
                  else java.lang.Double.valueOf((v.doubleValue - mn) / (mx - mn) * 100.0)
                Seq(
                  vals.length.toLong,
                  mn,
                  mx,
                  mean,
                  percentileCont(vals, 0.10),
                  percentileCont(vals, 0.25),
                  percentileCont(vals, 0.50),
                  percentileCont(vals, 0.75),
                  percentileCont(vals, 0.90),
                  pct
                )
              }
            }
          if (v != null) history += ((date, v.doubleValue))
          Row.fromSeq(Seq(key._1, r.getDate(1), v) ++ stats)
        }
      }(enc)
  }
}
