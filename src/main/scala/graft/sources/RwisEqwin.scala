package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RWIS (Road Weather Information System) ingest —
  * `R/downloadRWIS.R:16-131` in YukonWRB/AquaCache. The reference
  * reads a Postgres `measurements_measurement` table whose parameter
  * columns are ARRAYS, unnested server-side; `-9999` is the missing
  * sentinel; duplicate datetimes after unnest are an error.
  *
  * The unnest stays SERVER-side here too (it's part of the pushed
  * query); the sentinel filter and the duplicate-datetime assertion
  * are Spark-side — the assertion via `raise_error`, so it rides the
  * normal execution with no extra driver job.
  */
class RwisAdapter(transport: Transport) extends SourceAdapter {
  override val name = "downloadRWIS"

  private val jdbc = new JdbcSourceAdapter(transport)

  private val DefaultTemplate =
    "SELECT measurement_time AS datetime, value " +
      "FROM public.measurements_measurement, UNNEST({parameter}) AS value " +
      "WHERE station_id = {station_id}"

  /** args: url, driver?, station_id, parameter, query_template?
    * (placeholders {parameter}, {station_id}).
    */
  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DataFrame = {
    val q = cfg.args
      .getOrElse("query_template", DefaultTemplate)
      .replace("{parameter}", cfg.args("parameter"))
      .replace("{station_id}", cfg.args("station_id"))
    val jdbcCfg = cfg.copy(args = cfg.args + ("query" -> q, "datetime_col" -> "datetime", "value_col" -> "value"))
    val fetched = jdbc
      .fetch(spark, jdbcCfg, startTs)
      .filter(col("value") =!= -9999.0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("datetime"))
    fetched
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn(
        "value",
        when(col("__n") > 1, raise_error(concat(lit("duplicate RWIS datetimes for station "), lit(cfg.args("station_id")))))
          .otherwise(col("value"))
      )
      .drop("__n")
  }
}

/** Default instance on the fixture transport. */
object RwisAdapter extends RwisAdapter(FileTransport)

/** EQWin (MS Access water-quality DB) ingest —
  * `R/downloadEQWin.R:43` (742 LoC): a JDBC read of lab results whose
  * values are STRINGS with censoring prefixes (`<0.005`, `>100`,
  * `:674-687`), mapped to database parameters via the same import-key
  * shape as ECCC (`inst/import_keys/EQWin.csv`). Decomposing the
  * string into (flag, numeric value) reduces the whole adapter to
  * [[EcccWq.mapResults]] — conversion, offset, censoring and skip
  * rules are shared.
  */
class EqwinAdapter(transport: Transport) extends DiscreteAdapter {
  override val name = "downloadEQWin"

  /** args: url, driver?, query (must yield station, datetime,
    * param_code, units, value_str), key (import-key CSV path).
    */
  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DiscreteBatch = {
    val rows = transport.rows(
      spark,
      cfg.args("url"),
      "jdbc",
      Map("dbtable" -> s"(${cfg.args("query")}) q") ++ cfg.args.get("driver").map("driver" -> _)
    )
    val trimmed = trim(col("value_str"))
    val raw = rows
      .select(
        col("station").as("site"),
        col("datetime").cast("timestamp").as("datetime"),
        col("param_code").as("variable"),
        col("units").as("unit"),
        // decompose '<x' / '>x' into (flag, numeric)
        when(trimmed.startsWith("<") || trimmed.startsWith(">"), substring(trimmed, 1, 1))
          .otherwise(lit(""))
          .as("flag"),
        when(
          trimmed.startsWith("<") || trimmed.startsWith(">"),
          expr("try_cast(substring(trim(value_str), 2) AS DOUBLE)")
        ).otherwise(expr("try_cast(trim(value_str) AS DOUBLE)")).as("value"),
        concat(col("station"), lit("|"), col("datetime").cast("string")).as("source_sample_id")
      )
      .filter(col("datetime") >= lit(startTs) && col("value").isNotNull)
    val key = transport.rows(spark, cfg.args("key"), "csv", Map("header" -> "true"))
    DiscreteBatch(EcccWq.samplesFrom(raw), EcccWq.mapResults(raw, key))
  }
}

/** Default instance on the fixture transport. */
object EqwinAdapter extends EqwinAdapter(FileTransport)
