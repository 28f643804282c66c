package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cache-sharing fetch groups — the reference's session-level response
  * cache (`R/downloadECCCwx.R:1-8` in YukonWRB/AquaCache): one ECCC
  * station response carries MANY parameters, so all series of one
  * (station, interval) share a single remote fetch, and the ingest
  * driver groups its worklist accordingly
  * (`R/getNewContinuous.R:286-316`).
  *
  * An adapter that fetches a multi-parameter payload implements this
  * trait; `IncrementalIngest` groups its catalog by `cacheKey`, calls
  * `fetchShared` ONCE per group (materialization barrier so re-use
  * doesn't re-fetch), and extracts each series' canonical frame from
  * the shared response.
  */
trait SharedFetchAdapter extends SourceAdapter {

  /** Series with equal keys share one fetch (e.g. "station|hourly"). */
  def cacheKey(cfg: SeriesConfig): String

  /** One fetch for the whole group, from the EARLIEST start across the
    * group's members (per-series re-filtering happens in extract /
    * the ingest guard).
    */
  def fetchShared(spark: SparkSession, group: Seq[SeriesConfig], startTs: java.sql.Timestamp): DataFrame

  /** Project one series' canonical measurement frame out of the
    * shared response.
    */
  def extract(shared: DataFrame, cfg: SeriesConfig): DataFrame

  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DataFrame =
    extract(fetchShared(spark, Seq(cfg), startTs), cfg)
}

/** Deterministic multi-parameter station weather source (the ECCC
  * shape): one response per (station, step) with temp / rh / wind
  * columns; each series extracts one parameter column. `args`:
  * "station", "parameter" (temp_c|rh_pct|wind_kmh), "step_seconds",
  * "from", "to".
  */
object StationWeatherAdapter extends SharedFetchAdapter {
  override val name = "downloadStationWeather"

  override def cacheKey(cfg: SeriesConfig): String =
    s"${cfg.args.getOrElse("station", "?")}|${cfg.args.getOrElse("step_seconds", "3600")}"

  override def fetchShared(
      spark: SparkSession,
      group: Seq[SeriesConfig],
      startTs: java.sql.Timestamp
  ): DataFrame = {
    val cfg = group.head
    val step = cfg.args.getOrElse("step_seconds", "3600").toLong
    val from = cfg.args.getOrElse("from", "2023-01-01 00:00:00")
    val to = cfg.args.getOrElse("to", "2023-01-08 00:00:00")
    val stationSeed = cfg.args.getOrElse("station", "S1").hashCode.abs % 100
    val t = col("epoch").cast("double")
    spark
      .range(0, (java.sql.Timestamp.valueOf(to).getTime - java.sql.Timestamp.valueOf(from).getTime) / 1000L / step)
      .withColumnRenamed("id", "n")
      .withColumn("epoch", unix_timestamp(lit(from)) + col("n") * step)
      .withColumn("datetime", timestamp_seconds(col("epoch")))
      .withColumn("temp_c", round(lit(-5.0 + stationSeed * 0.1) + sin(t / 43200.0) * 6.0, 2))
      .withColumn("rh_pct", round(lit(70.0) + cos(t / 86400.0) * 20.0, 1))
      .withColumn("wind_kmh", round(lit(12.0) + sin(t / 21600.0) * 8.0, 1))
      .filter(col("datetime") >= lit(startTs))
      .select("datetime", "temp_c", "rh_pct", "wind_kmh")
  }

  override def extract(shared: DataFrame, cfg: SeriesConfig): DataFrame = {
    val param = cfg.args.getOrElse("parameter", "temp_c")
    require(
      Seq("temp_c", "rh_pct", "wind_kmh").contains(param),
      s"unknown station-weather parameter $param"
    )
    SourceAdapter.normalize(
      shared.select(col("datetime"), col(param).as("value"))
    )
  }
}
