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

  /** Spline self-interpolation of NULL runs
    * (`R/imputeMissing.R:1104-1169`): an NA run is filled only when
    * its length is within [minGap, maxGap] and it does not touch the
    * series tail; the spline is fit over the +-20-row context window
    * around the run (valid rows only) at ROW positions — the
    * reference fits on row indices, not timestamps — and evaluated at
    * the gap positions. Per-series `flatMapGroups` after one shuffle
    * on the key: gap state is sequential, groups are bounded.
    */
  def splineFill(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      minGap: Int = 1,
      maxGap: Int = 10,
      contextRows: Int = 20
  ): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(
      Seq(
        StructField(keyCol, LongType, nullable = false),
        StructField(orderCol, TimestampType, nullable = true),
        StructField("filled", DoubleType, nullable = true),
        StructField("imputed", BooleanType, nullable = false)
      )
    )
    df.select(
      col(keyCol).cast("long"),
      col(orderCol).cast("timestamp"),
      col(valueCol).cast("double")
    ).groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        val rows = it
          .map(r => (r.getTimestamp(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
          .toArray
          .sortBy(r => (r._1.getTime, r._1.getNanos))
        val n = rows.length
        val filled: Array[Option[Double]] = rows.map(_._2)
        val imputed = Array.fill(n)(false)
        var i = 0
        while (i < n) {
          if (rows(i)._2.isEmpty) {
            var j = i
            while (j < n && rows(j)._2.isEmpty) j += 1
            val len = j - i
            // fill only interior runs within the gap bounds
            // (imputeMissing.R:1110-1125: end_pos < nrow guard)
            if (len >= minGap && len <= maxGap && j < n && i > 0) {
              val lo = math.max(0, i - contextRows)
              val hi = math.min(n - 1, j - 1 + contextRows)
              val ctx = (lo to hi).filter(k => rows(k)._2.isDefined)
              if (ctx.size >= 2) {
                val xs = ctx.map(_.toDouble + 1.0).toArray // 1-based row positions
                val ys = ctx.map(k => rows(k)._2.get).toArray
                val xout = (i until j).map(_.toDouble + 1.0).toArray
                val fit = graft.kernels.SplineKernel.naturalSpline(xs, ys, xout)
                var k = i
                while (k < j) {
                  filled(k) = Some(fit(k - i))
                  imputed(k) = true
                  k += 1
                }
              }
            }
            i = j
          } else i += 1
        }
        rows.iterator.zipWithIndex.map { case ((t, _), idx) =>
          Row(key, t, filled(idx).map(Double.box).orNull, imputed(idx))
        }
      }(Encoders.row(schema))
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
