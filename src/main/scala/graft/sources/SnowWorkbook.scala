package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snow-survey workbook import with the reference's QA/QC rules —
  * `R/readSnowWorkbook.R` (YukonWRB/AquaCache), 1,015 LoC of
  * sheet-by-sheet validation. The container has no Excel codec, so the
  * input is the workbook's LOGICAL content exported per sheet (one
  * header row per sheet + one row per measurement sample) — the
  * openxlsx cell plumbing is the only part not reproduced; every
  * validation/derivation rule below cites its line.
  *
  * Rules:
  *   - depth 0 forces SWE 0 (`:138`);
  *   - method: workbook value, overridden to "average" when an
  *     estimated average exists and the method is not a bulk sample
  *     (`:186-195`);
  *   - unknown location name -> sheet rejected (`:141-179`);
  *   - end time before start time -> sheet rejected (`:612-624`);
  *   - standard method: sample datetimes evenly spaced over
  *     [start, end] fractional days from survey-date local midnight
  *     (UTC-7), SWE cm -> rounded mm (half-even, R round), depth cm
  *     rounded; missing SWE/depth on any sample -> rejected
  *     (`:631-651`, `:762-800`);
  *   - bulk / average: ONE row from the calculated averages
  *     (estimate_flag true only for "average"); missing average
  *     SWE/depth -> rejected (`:652-760`);
  *   - sheets with no samples and no header content are skipped
  *     (`:109-120`).
  *
  * Spark shape: sheets and samples are columnar frames; every rule is
  * a codegen'd projection or a broadcast join against the locations
  * dim — one workbook or ten million sheets run the same plan.
  */
object SnowWorkbook {

  final case class SnowImport(surveys: DataFrame, measurements: DataFrame, rejects: DataFrame)

  /** @param sheets  sheet_id, location_name, target_date, survey_date,
    *                sampler_name, method, start_days, end_days,
    *                est_avg_present, calc_depth_cm, calc_swe_cm
    * @param samples sheet_id, sample_no, depth_cm, swe_cm,
    *                exclude_flag, note
    * @param locations location_id, name
    */
  def process(sheets: DataFrame, samples: DataFrame, locations: DataFrame): SnowImport = {
    // depth 0 forces SWE 0 (readSnowWorkbook.R:138)
    val cleaned = samples.withColumn(
      "swe_cm",
      when(col("depth_cm") === 0.0, lit(0.0)).otherwise(col("swe_cm"))
    )
    val perSheet = cleaned
      .groupBy(col("sheet_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(when(col("swe_cm").isNull, 1).otherwise(0)).as("n_missing_swe"),
        sum(when(col("depth_cm").isNull, 1).otherwise(0)).as("n_missing_depth")
      )
    val annotated = sheets
      .join(perSheet, Seq("sheet_id"), "left")
      .na.fill(0L, Seq("n_samples", "n_missing_swe", "n_missing_depth"))
      .withColumn(
        "method_resolved",
        // "bulk sample" normalizes to "bulk" so it takes the averaged
        // path rather than passing validation and emitting zero rows.
        when(col("est_avg_present") && lower(col("method")) =!= "bulk sample", lit("average"))
          .otherwise(
            when(lower(col("method")) === "bulk sample", lit("bulk"))
              .otherwise(lower(col("method")))
          )
      )
      .join(broadcast(locations.select(col("name").as("location_name"), col("location_id"))), Seq("location_name"), "left")

    val isEmpty = col("n_samples") === 0 && col("survey_date").isNull && col("calc_swe_cm").isNull
    val needsCalc = col("method_resolved").isin("bulk", "average")
    val reason = when(isEmpty, "empty_sheet")
      .when(col("location_id").isNull, "unknown_location")
      .when(col("end_days") < col("start_days"), "end_before_start")
      .when(!needsCalc && col("method_resolved") =!= "standard", "unknown_method")
      .when(needsCalc && (col("calc_swe_cm").isNull || col("calc_depth_cm").isNull), "missing_average")
      .when(!needsCalc && (col("n_missing_swe") > 0 || col("n_missing_depth") > 0), "missing_sample_values")
    val flagged = annotated.withColumn("reject_reason", reason)
    val rejects = flagged
      .filter(col("reject_reason").isNotNull && col("reject_reason") =!= "empty_sheet")
      .select(col("sheet_id"), col("location_name"), col("reject_reason"))
    val ok = flagged.filter(col("reject_reason").isNull)

    val surveys = ok.select(
      col("sheet_id").as("survey_id"),
      col("location_id"),
      col("target_date"),
      col("survey_date"),
      col("sampler_name"),
      col("method_resolved").as("method")
    )

    // Survey-date local midnight (UTC-7) + fractional-day offset.
    // DELIBERATE deviation from the reference: readSnowWorkbook.R
    // embeds 'Etc/GMT-7' in the string handed to as.POSIXct, which
    // default parsing ignores (session-tz dependent) — and under POSIX
    // sign inversion Etc/GMT-7 would be UTC+7 anyway. We pin the
    // physically-correct Yukon offset (UTC-7) explicitly.
    def sampleTs(days: org.apache.spark.sql.Column) =
      timestamp_seconds(
        unix_timestamp(col("survey_date").cast("timestamp")) + 7L * 3600L +
          (days * 86400.0).cast("long")
      )

    // standard: linspace(start, end, n) like seq.int(length.out = n)
    val w = Window.partitionBy(col("sheet_id")).orderBy(col("sample_no"))
    val standard = ok
      .filter(col("method_resolved") === "standard")
      .select(
        col("sheet_id"), col("survey_date"), col("start_days"), col("end_days"),
        col("n_samples")
      )
      .join(cleaned, Seq("sheet_id"))
      .withColumn("i", row_number().over(w))
      .withColumn(
        "days",
        when(col("n_samples") === 1, col("start_days")).otherwise(
          col("start_days") +
            (col("end_days") - col("start_days")) * (col("i") - 1) / (col("n_samples") - 1)
        )
      )
      .select(
        col("sheet_id").as("survey_id"),
        sampleTs(col("days")).as("sample_datetime"),
        lit(false).as("estimate_flag"),
        coalesce(col("exclude_flag"), lit(false)).as("exclude_flag"),
        bround(col("swe_cm") * 10).as("swe_mm"), // R round = half-even
        bround(col("depth_cm")).as("depth_cm"),
        col("note")
      )

    val averaged = ok
      .filter(needsCalc)
      .select(
        col("sheet_id").as("survey_id"),
        sampleTs(col("start_days")).as("sample_datetime"),
        (col("method_resolved") === "average").as("estimate_flag"),
        lit(false).as("exclude_flag"),
        bround(col("calc_swe_cm") * 10).as("swe_mm"),
        bround(col("calc_depth_cm")).as("depth_cm"),
        lit(null).cast("string").as("note")
      )

    SnowImport(surveys, standard.unionByName(averaged), rejects)
  }
}
