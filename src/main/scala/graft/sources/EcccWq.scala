package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ECCC long-term water-quality CSV ingest with import-key parameter
  * mapping — `R/downloadECCCwq.R:23` in YukonWRB/AquaCache, key shape
  * `inst/import_keys/downloadECCCeq1.csv`:
  * `input_param, input_unit, parameter_id, conversion, result_type,
  * sample_fraction, result_value_type, result_speciation_id,
  * matrix_state`.
  *
  * Semantics mirrored from the reference:
  *   - a mapping row is matched on (VARIABLE, UNIT); unmapped
  *     variables and mappings without a parameter_id are skipped
  *     (`downloadECCCwq.R:296-320`);
  *   - value = VALUE * conversion + result_offset
  *     (`:327-329`; the legacy key has no offset column -> 0);
  *   - FLAG '<' / '>' turn the converted value into a censored
  *     below/above-detection condition (result NULL,
  *     condition_value = value, `:330-352`); any other non-empty
  *     flag drops the row;
  *   - one sample per distinct datetime; import_source_id =
  *     comma-joined source sample ids (`:270-282`).
  *
  * Spark-first: the key is a tiny dimension — ONE broadcast hash join
  * against the (arbitrarily large) results file; flags and conversion
  * are codegen'd projections. No driver-side loops.
  */
object EcccWq {

  /** Raw columns expected after normalization: site, datetime, variable,
    * unit, value, flag, source_sample_id.
    */
  def normalizeRaw(csv: DataFrame): DataFrame = {
    // the real export uses bilingual/accented headers; accept both
    def pick(names: String*): org.apache.spark.sql.Column =
      names.collectFirst { case n if csv.columns.contains(n) => col(n) }
        .getOrElse(lit(null))
    csv.select(
      pick("SITE_NO").as("site"),
      pick("DATE_TIME_HEURE").cast("timestamp").as("datetime"),
      pick("VARIABLE").as("variable"),
      pick("UNIT_UNITE", "UNIT_UNITÉ").as("unit"),
      pick("VALUE_VALEUR").cast("double").as("value"),
      pick("FLAG_MARQUEUR").as("flag"),
      pick("SAMPLE_ID_ECHANTILLON", "SAMPLE_ID_ÉCHANTILLON").as("source_sample_id")
    )
  }

  /** Import-key mapping join + flag/censoring semantics. `key` needs
    * the legacy-key columns; a missing result_offset column is 0.
    */
  def mapResults(raw: DataFrame, key: DataFrame): DataFrame = {
    val offset =
      if (key.columns.contains("result_offset")) coalesce(col("result_offset").cast("double"), lit(0.0))
      else lit(0.0)
    val k = key.select(
      col("input_param"),
      col("input_unit"),
      col("parameter_id").cast("long").as("parameter_id"),
      coalesce(col("conversion").cast("double"), lit(1.0)).as("conversion"),
      offset.as("result_offset"),
      col("result_type").cast("long").as("result_type"),
      col("sample_fraction").cast("long").as("sample_fraction"),
      col("result_value_type").cast("long").as("result_value_type"),
      col("result_speciation_id").cast("long").as("result_speciation_id"),
      col("matrix_state")
    )
    val flag = coalesce(col("flag"), lit(""))
    raw
      .filter(col("variable").isNotNull && length(col("variable")) > 0)
      .join(
        broadcast(k),
        col("variable") === col("input_param") && col("unit") === col("input_unit"),
        "inner"
      )
      .filter(col("parameter_id").isNotNull)
      // unrecognized non-empty flags are skipped with a warning in the
      // reference -> dropped here
      .filter(flag.isin("", "<", ">"))
      .withColumn("converted", col("value") * col("conversion") + col("result_offset"))
      .select(
        col("datetime"),
        col("source_sample_id"),
        col("parameter_id"),
        col("result_type"),
        col("sample_fraction"),
        col("result_value_type"),
        col("result_speciation_id"),
        col("matrix_state"),
        when(flag.isin("<", ">"), lit(null).cast("double")).otherwise(col("converted")).as("result"),
        when(flag === "<", lit("below detection"))
          .when(flag === ">", lit("above detection"))
          .cast("string")
          .as("condition"),
        when(flag.isin("<", ">"), col("converted")).as("condition_value")
      )
  }

  /** One sample per distinct datetime; import_source_id = comma-joined
    * distinct source ids (sorted for determinism).
    */
  def samplesFrom(raw: DataFrame): DataFrame =
    raw
      .groupBy(col("datetime"))
      .agg(
        array_join(array_sort(collect_set(col("source_sample_id"))), ",").as("import_source_id")
      )
      .withColumn("sample_type", lit("sample-routine"))
      .withColumn("collection_method", lit("Water Bottle"))
}

/** File-based discrete adapter over the ECCC CSV + import key CSV.
  * args: file, key, location (SITE_NO), optional tz_offset_hours
  * (input-local -> UTC shift, the reference's `tz` parameter).
  */
class EcccWqAdapter(transport: Transport) extends DiscreteAdapter {
  override val name = "downloadECCCwq"

  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DiscreteBatch = {
    val file = cfg.args("file")
    val keyPath = cfg.args("key")
    val location = cfg.args("location")
    val tzOffset = cfg.args.getOrElse("tz_offset_hours", "0").toInt
    def csv(p: String) = transport.rows(spark, p, "csv", Map("header" -> "true"))
    val raw = EcccWq
      .normalizeRaw(csv(file))
      .withColumn("datetime", col("datetime") - expr(s"INTERVAL $tzOffset HOURS"))
      .filter(col("site") === location && col("datetime") >= lit(startTs))
    val results = EcccWq.mapResults(raw, csv(keyPath))
    val samples = EcccWq.samplesFrom(raw)
      .join(
        results.select(col("datetime")).distinct(),
        Seq("datetime"),
        "left_semi"
      )
    DiscreteBatch(samples, results)
  }
}

/** Default instance on the fixture transport. */
object EcccWqAdapter extends EcccWqAdapter(FileTransport)
