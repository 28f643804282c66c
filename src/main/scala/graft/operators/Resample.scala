package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resampling to a fixed time step with explicit empty bins.
  *
  * Reference semantics (`inst/patches/patch_44.R:1904-2073` in
  * YukonWRB/AquaCache): bins floor-aligned from `p_from`
  * (`:2008-2028`), statistic ∈ min/max/mean/median, and empty bins
  * emitted explicitly via `generate_series` left join (`:2057-2070`);
  * output `period := step`.
  *
  * Scale: aggregation is one shuffle on (keys, bin); the bin spine is
  * `sequence()` per distinct key — both sides partition on the same
  * keys. The spine side is (n_keys × n_bins) rows of a few columns —
  * negligible next to the fact table.
  */
object Resample {

  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      dtCol: String,
      valueCol: String,
      stepSeconds: Long,
      fromTs: String, // 'yyyy-MM-dd HH:mm:ss' UTC inclusive
      toTs: String, // exclusive
      statistic: String = "mean"
  ): DataFrame = {
    require(Set("mean", "min", "max", "median").contains(statistic), statistic)
    val fromEpoch = unix_timestamp(lit(fromTs))
    val binTs = timestamp_seconds(
      fromEpoch + floor((unix_micros(col(dtCol)) / 1e6 - fromEpoch) / stepSeconds).cast("long") * stepSeconds
    )
    val statCol = statistic match {
      case "mean"   => avg(col(valueCol))
      case "min"    => min(col(valueCol))
      case "max"    => max(col(valueCol))
      case "median" => expr(s"percentile($valueCol, 0.5)")
    }
    val aggs = df
      .filter(col(dtCol) >= lit(fromTs).cast("timestamp") && col(dtCol) < lit(toTs).cast("timestamp"))
      .withColumn("bin_ts", binTs)
      .groupBy((keyCols.map(col) :+ col("bin_ts")): _*)
      .agg(statCol.as("value"), count(col(valueCol)).as("n"))

    val spine = df
      .select(keyCols.map(col): _*)
      .distinct()
      .crossJoin(
        df.sparkSession
          .range(1)
          .select(
            explode(
              sequence(
                lit(fromTs).cast("timestamp"),
                lit(toTs).cast("timestamp") - expr(s"INTERVAL $stepSeconds SECOND"),
                expr(s"INTERVAL $stepSeconds SECOND")
              )
            ).as("bin_ts")
          )
      )

    spine
      .join(aggs, keyCols :+ "bin_ts", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("period_seconds", lit(stepSeconds))
  }
}
