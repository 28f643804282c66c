package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Censored-result statistics for discrete water-quality data.
  *
  * The reference models non-detects as `result = NULL` with a
  * condition + condition value (`discrete.results`:
  * `result_condition = '< DL'`, `result_condition_value`,
  * `inst/patches/patch_11.R:994-1017` in YukonWRB/AquaCache — a NULL
  * result REQUIRES a condition). Summaries here use the standard
  * substitution convention: censored observations contribute
  * `condition_value / 2` to means/sums, detected-only min/max are
  * reported alongside, and censoring is counted explicitly.
  */
object CensoredStats {

  /** @param results columns: keys..., result (nullable double),
    *                condition (nullable string), condition_value
    *                (nullable double)
    * @param meanScale when set, `mean_sub` is computed over values
    *                  pre-rounded to 1/scale — each element becomes an
    *                  exact integer, so the sum (and thus the mean) is
    *                  bit-identical across partitionings and engines.
    *                  None keeps the raw double mean.
    * @return per-key: n, n_censored, mean_sub (DL/2 substitution),
    *         min_detected, max_detected, max_dl
    */
  def summarize(results: DataFrame, keys: Seq[String], meanScale: Option[Long] = None): DataFrame = {
    val censored = col("result").isNull && col("condition").isNotNull
    val substituted = when(censored, col("condition_value") / 2.0).otherwise(col("result"))
    val meanExpr = meanScale match {
      case Some(sc) => avg(round(substituted * sc).cast("long")) / sc.toDouble
      case None     => avg(substituted)
    }
    results
      .filter(col("result").isNotNull || col("condition").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(censored, 1).otherwise(0)).as("n_censored"),
        meanExpr.as("mean_sub"),
        min(col("result")).as("min_detected"),
        max(col("result")).as("max_detected"),
        max(when(censored, col("condition_value"))).as("max_dl")
      )
  }
}
