package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length encoding of point observations into half-open value
  * segments — the first step of the reference's QC interval
  * maintenance (`rle()` at `R/adjust_functions.R:583-595` in
  * YukonWRB/AquaCache): consecutive equal values per series collapse
  * to `[start_dt, end_dt)` segments, each segment ending where the
  * next begins (the last one open-ended/NULL).
  *
  * Spark-first: the classic gaps-and-islands pair of windows (lag ->
  * change flag -> running sum -> group) — one shuffle on the series
  * key, no per-group collection, arbitrary series length.
  */
object Segments {

  def fromPoints(
      df: DataFrame,
      keyCols: Seq[String],
      dtCol: String,
      valueCol: String,
      orderCols: Seq[String] = Nil
  ): DataFrame = {
    val ord = (dtCol +: orderCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val changed = when(
      !(col(valueCol) <=> lag(col(valueCol), 1).over(w)) ||
        row_number().over(w) === 1,
      1
    ).otherwise(0)
    val grouped = df
      .withColumn("chg", changed)
      .withColumn("seg_grp", sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keyCols.map(col) :+ col("seg_grp")): _*)
      .agg(
        min(col(dtCol)).as("start_dt"),
        max(col(dtCol)).as("last_dt"),
        first(col(valueCol)).as(valueCol),
        count(lit(1)).as("n_points")
      )
    val wSeg = Window.partitionBy(keyCols.map(col): _*).orderBy(col("start_dt"))
    grouped
      .withColumn("end_dt", lead(col("start_dt"), 1).over(wSeg))
      .drop("seg_grp")
  }
}
