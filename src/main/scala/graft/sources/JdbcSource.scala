package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC ingest path — the reference's database-backed sources (HYDAT
  * SQLite via tidyhydat `R/update_hydat.R:193-204`, EQWin Access via
  * odbc `R/downloadEQWin.R:43`, SnowCourse `R/downloadSnowCourse.R:20`
  * in YukonWRB/AquaCache) re-expressed as `spark.read.jdbc`.
  *
  * Spark-first design:
  *   - the incremental `datetime > start` predicate is applied as a
  *     DataFrame filter and PUSHED DOWN to the remote database by the
  *     JDBC source (visible as PushedFilters in the scan);
  *   - large tables read in parallel via
  *     `partition_col/lower_bound/upper_bound/num_partitions` — one
  *     executor connection per partition, no driver funnel;
  *   - the driver class is configuration (`driver` arg): sqlite-jdbc,
  *     UCanAccess, or any embedded driver slot in without code change
  *     (tests run Derby, which ships with Spark).
  */
class JdbcSourceAdapter(transport: Transport) extends SourceAdapter {
  override val name = "downloadJdbc"

  /** args: url (required), table OR query (required), driver,
    * datetime_col (default "datetime"), value_col (default "value"),
    * partition_col/lower_bound/upper_bound/num_partitions, fetchsize.
    */
  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DataFrame = {
    val args = cfg.args
    val url = args.getOrElse("url", throw new IllegalArgumentException("jdbc adapter needs 'url'"))
    val dtCol = args.getOrElse("datetime_col", "datetime")
    val vCol = args.getOrElse("value_col", "value")
    val dbtable = args
      .get("table")
      .orElse(args.get("query").map(q => s"($q) q"))
      .getOrElse(throw new IllegalArgumentException("jdbc adapter needs 'table' or 'query'"))
    val partOpts = (for {
      pc <- args.get("partition_col")
      lo <- args.get("lower_bound")
      hi <- args.get("upper_bound")
      np <- args.get("num_partitions")
    } yield Map(
      "partitionColumn" -> pc,
      "lowerBound" -> lo,
      "upperBound" -> hi,
      "numPartitions" -> np
    )).getOrElse(Map.empty[String, String])
    val opts = Map("dbtable" -> dbtable) ++
      args.get("driver").map("driver" -> _) ++
      args.get("fetchsize").map("fetchsize" -> _) ++ partOpts
    SourceAdapter.normalize(
      transport
        .rows(spark, url, "jdbc", opts)
        // pushed down to the remote DB by the JDBC source
        .filter(col(dtCol) >= lit(startTs))
        .select(col(dtCol).cast("timestamp").as("datetime"), col(vCol).cast("double").as("value"))
    )
  }
}

/** Default instance on the fixture transport. */
object JdbcSourceAdapter extends JdbcSourceAdapter(FileTransport)

/** HYDAT historical daily means: the authentic `DLY_FLOWS` wide layout
  * (STATION_NUMBER, YEAR, MONTH, FLOW1..FLOW31 — one column per day of
  * month) unpivoted to (station, date, value) daily rows, written as
  * `period = P1D` measurements at local noon UTC, only for local days
  * with no higher-frequency data (`R/update_hydat.R:261-440`; tidyhydat
  * `hy_daily_flows` does the same unpivot client-side).
  */
object Hydat {

  /** Unpivot a DLY_FLOWS-shaped frame to (station, date, value).
    * `stack` runs inside whole-stage codegen — no shuffle, no UDF; the
    * invalid day combinations (Feb 30/31...) are dropped by the
    * try-cast producing NULL dates.
    */
  def dailyFromDlyFlows(dly: DataFrame): DataFrame = {
    val dayCols = (1 to 31).map(d => s"FLOW$d")
    val stackExpr =
      s"stack(31, ${(1 to 31).map(d => s"$d, FLOW$d").mkString(", ")}) AS (day, value)"
    dly
      .selectExpr("STATION_NUMBER", "YEAR", "MONTH", stackExpr)
      .filter(col("value").isNotNull)
      .withColumn(
        "date",
        try_to_timestamp(
          concat_ws("-", col("YEAR"), lpad(col("MONTH"), 2, "0"), lpad(col("day"), 2, "0")),
          lit("yyyy-MM-dd")
        ).cast("date")
      )
      .filter(col("date").isNotNull)
      .select(col("STATION_NUMBER").as("station"), col("date"), col("value").cast("double"))
  }

  /** Daily rows -> canonical measurements at local noon UTC with
    * period P1D (`daily_datetime_utc`, `R/utils.R:841`): noon local =
    * 12:00 - offset hours in UTC.
    */
  def toMeasurements(daily: DataFrame, timeseriesId: Long, offsetHours: Int): DataFrame =
    daily.select(
      lit(timeseriesId).as("timeseries_id"),
      (col("date").cast("timestamp") + expr(s"INTERVAL ${12 - offsetHours} HOURS")).as("datetime"),
      col("value"),
      lit(86400L).as("period_seconds")
    )

  /** Keep only HYDAT rows for local days with NO existing
    * higher-frequency data — a day is high-frequency when any of its
    * rows has period <> 1 day or a datetime off local noon
    * (`R/update_hydat.R:285-308`). One aggregation on the (pruned)
    * existing window + a broadcast-able anti-join.
    */
  def mergeNewDaily(
      hydatMeasurements: DataFrame,
      existing: DataFrame,
      offsetHours: Int
  ): DataFrame = {
    val localDate = to_date(col("datetime") + expr(s"INTERVAL $offsetHours HOURS"))
    val noonUtc = (col("local_date").cast("timestamp") + expr(s"INTERVAL ${12 - offsetHours} HOURS"))
    val hfDates = existing
      .withColumn("local_date", localDate)
      .groupBy(col("timeseries_id"), col("local_date"))
      .agg(
        max(
          !(col("period_seconds") <=> lit(86400L)) ||
            !(col("datetime") <=> noonUtc)
        ).as("has_hf")
      )
      .filter(col("has_hf"))
      .select(col("timeseries_id"), col("local_date"))
    hydatMeasurements
      .withColumn("local_date", localDate)
      .join(hfDates, Seq("timeseries_id", "local_date"), "left_anti")
      .drop("local_date")
  }
}
