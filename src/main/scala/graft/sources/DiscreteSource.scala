package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Discrete (sample/result) ingest contract — the reference's
  * `getNewDiscrete` path (`R/getNewDiscrete.R:50` in
  * YukonWRB/AquaCache): a discrete adapter returns TWO frames, the
  * samples (location, datetime, collection metadata) and their
  * results (per-parameter values with censoring), keyed together by
  * `import_source_id` so re-imports reconcile instead of duplicating.
  */
final case class DiscreteBatch(samples: DataFrame, results: DataFrame)

trait DiscreteAdapter extends Serializable {
  def name: String
  def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DiscreteBatch
}

/** Deterministic synthetic discrete fixture, the shape of the
  * reference's `downloadSyntheticDiscrete` fixtures (FIXTURES.md §4):
  * monthly grab samples with field pH / specific conductance results
  * including censored non-detects.
  */
object SyntheticDiscreteAdapter extends DiscreteAdapter {
  override val name = "downloadSyntheticDiscrete"

  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DiscreteBatch = {
    val n = cfg.args.getOrElse("n_samples", "8").toInt
    val samples = spark
      .range(1, n + 1L)
      .select(
        col("id").as("sample_id"),
        concat(lit("SYN-S"), col("id")).as("import_source_id"),
        timestamp_seconds(unix_timestamp(lit("2023-01-01 10:00:00")) + (col("id") - 1) * 86400L * 30)
          .as("datetime"),
        lit(1L).as("location_id"),
        lit(0.5).as("z_m"),
        (col("id") % 4 === 0).as("is_qc_replicate")
      )
      .filter(col("datetime") >= lit(startTs))
    val results = samples
      .select(col("sample_id"), col("datetime"))
      .select(
        col("sample_id"),
        explode(
          array(
            struct(lit("pH").as("parameter"), (lit(6.7) + col("sample_id") % 5 * 0.1).as("result"), lit(null).cast("string").as("condition"), lit(null).cast("double").as("condition_value")),
            struct(lit("specific_conductance").as("parameter"), (lit(118.0) + col("sample_id") * 1.45).as("result"), lit(null).cast("string").as("condition"), lit(null).cast("double").as("condition_value")),
            // every third sample's metal is a censored non-detect
            struct(
              lit("dissolved_zinc").as("parameter"),
              when(col("sample_id") % 3 === 0, lit(null).cast("double")).otherwise(lit(0.004) + col("sample_id") * 0.001).as("result"),
              when(col("sample_id") % 3 === 0, lit("< DL")).cast("string").as("condition"),
              when(col("sample_id") % 3 === 0, lit(0.005)).cast("double").as("condition_value")
            )
          )
        ).as("r")
      )
      .select(col("sample_id"), col("r.*"))
    DiscreteBatch(samples, results)
  }
}
