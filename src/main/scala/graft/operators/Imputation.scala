package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap filling: LOCF (forward + backward) and bounded linear
  * interpolation between observed anchors.
  *
  * Reference: `zoo::na.locf` both directions in period inference
  * (`R/calculate_period.R:132-135`) and linear self-interpolation in
  * `R/imputeMissing.R:1104-1169` (YukonWRB/AquaCache).
  *
  * Spark-first: `last(ignoreNulls)`/`first(ignoreNulls)` window
  * functions — one shuffle on the series key; no per-group collection.
  */
object Imputation {

  /** Forward fill then (optionally) backward fill. */
  def locf(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String = "filled",
      backward: Boolean = true
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val fwd = last(col(valueCol), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    val filled =
      if (backward) {
        val bwd = first(col(valueCol), ignoreNulls = true)
          .over(w.rowsBetween(0, Window.unboundedFollowing))
        coalesce(fwd, bwd)
      } else fwd
    df.withColumn(outCol, filled)
  }

  /** Donor-based gap fill (`R/imputeMissing.R:543-606,886-901`): a
    * missing point takes the best-ranked donor's co-timestamped value
    * plus that donor's fitted mean offset, falling back through the
    * donor ranking when a donor lacks the timestamp. Donor discovery /
    * offset fitting / ranking is the q_donor_offsets pipeline — this
    * operator consumes its output.
    *
    * @param donors (target, rank, donor, avg_offset) — per-series
    *               metadata, broadcast
    */
  def fillFromDonors(
      df: DataFrame,
      keyCol: String,
      dtCol: String,
      valueCol: String,
      donors: DataFrame,
      outCol: String = "filled"
  ): DataFrame = {
    val missing = df.filter(col(valueCol).isNull).select(col(keyCol).as("target"), col(dtCol))
    val donorVals = df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("donor"), col(dtCol), col(valueCol).as("donor_value"))
    val candidates = missing
      .join(broadcast(donors), Seq("target"))
      .join(donorVals, Seq("donor", dtCol)) // co-timestamped donor points
      .withColumn("fill", col("donor_value") + col("avg_offset"))
    val w = Window.partitionBy(col("target"), col(dtCol)).orderBy(col("rank"), col("donor"))
    val best = candidates
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("target").as(keyCol), col(dtCol), col("fill"), col("donor").as("fill_donor"))
    df.join(best, Seq(keyCol, dtCol), "left")
      .withColumn(outCol, coalesce(col(valueCol).cast("double"), col("fill")))
      .withColumn("imputed", col(valueCol).isNull && col("fill").isNotNull)
      .drop("fill")
  }

  /** Linear interpolation of NULL runs between observed anchors,
    * bounded by `maxGapSeconds` (NULL stays NULL when the bracketing
    * anchors are too far apart or a side is missing). `imputed` marks
    * filled rows — the reference writes `imputed = TRUE` the same way.
    */
  def linearInterpolate(
      df: DataFrame,
      keyCols: Seq[String],
      dtCol: String,
      valueCol: String,
      outCol: String = "filled",
      maxGapSeconds: Option[Long] = None
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(dtCol))
    val before = w.rowsBetween(Window.unboundedPreceding, 0)
    val after = w.rowsBetween(0, Window.unboundedFollowing)
    val v = col(valueCol)
    val t = unix_micros(col(dtCol)).cast("double") / 1e6
    val prevV = last(when(v.isNotNull, v), ignoreNulls = true).over(before)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(before)
    val nextV = first(when(v.isNotNull, v), ignoreNulls = true).over(after)
    val nextT = first(when(v.isNotNull, t), ignoreNulls = true).over(after)
    val gapOk: Column = maxGapSeconds match {
      case Some(g) => (nextT - prevT) <= lit(g.toDouble)
      case None    => lit(true)
    }
    val interp = prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)
    val filledCol = when(v.isNotNull, v.cast("double"))
      .when(prevV.isNotNull && nextV.isNotNull && gapOk, interp)
    df.withColumn(outCol, filledCol)
      .withColumn("imputed", v.isNull && filledCol.isNotNull)
  }
}
