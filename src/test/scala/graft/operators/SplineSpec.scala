package graft.operators

import graft.SparkSpec
import graft.kernels.SplineKernel
import org.apache.spark.sql.functions._

class SplineSpec extends SparkSpec {

  test("natural spline kernel matches hand-solved systems") {
    // 3 knots (1,0),(2,1),(3,0): m1 = -3, S(1.5) = 0.6875
    val y1 = SplineKernel.naturalSpline(Array(1, 2, 3), Array(0, 1, 0), Array(1.5))
    assert(math.abs(y1(0) - 0.6875) < 1e-12)
    // uneven knots (1,0),(2,1),(4,0): m1 = -1.5, S(3) = 0.875
    val y2 = SplineKernel.naturalSpline(Array(1, 2, 4), Array(0, 1, 0), Array(3.0))
    assert(math.abs(y2(0) - 0.875) < 1e-12)
    // interpolation is exact at the knots
    val y3 = SplineKernel.naturalSpline(Array(1, 2, 4), Array(0, 1, 0), Array(2.0, 4.0))
    assert(math.abs(y3(0) - 1.0) < 1e-12 && math.abs(y3(1)) < 1e-12)
    // 2 knots degenerate to the chord
    val y4 = SplineKernel.naturalSpline(Array(0, 2), Array(0, 4), Array(1.0))
    assert(y4(0) == 2.0)
  }

  test("extrapolation beyond the knots is linear, like R's natural spline") {
    // knots (1,0),(2,1),(3,0): symmetric, m1 = -3
    // boundary slopes: S'(1) = b0 = 1 - 1*(-3)/6 = 1.5; S'(3) = -1.5
    val xs = Array(1.0, 2.0, 3.0)
    val ys = Array(0.0, 1.0, 0.0)
    val out = SplineKernel.naturalSpline(xs, ys, Array(0.0, 4.0, 5.0))
    assert(math.abs(out(0) - (0.0 + 1.5 * (0.0 - 1.0))) < 1e-12) // -1.5
    assert(math.abs(out(1) - (0.0 - 1.5 * (4.0 - 3.0))) < 1e-12) // -1.5
    // linear: one more unit out adds exactly the slope again
    assert(math.abs((out(2) - out(1)) - -1.5) < 1e-12)
  }

  test("splineFill fills interior bounded gaps only, flags imputed") {
    import spark.implicits._
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-01 ${i}%02d:00:00")
    val df = Seq(
      // series 1: single interior gap at position 3 of (0, 1, null, 0)
      (1L, ts(1), Some(0.0)), (1L, ts(2), Some(1.0)), (1L, ts(3), None), (1L, ts(4), Some(0.0)),
      // series 2: trailing gap -> never filled
      (2L, ts(1), Some(5.0)), (2L, ts(2), Some(6.0)), (2L, ts(3), None),
      // series 3: gap of 3 > maxGap=2 -> unfilled
      (3L, ts(1), Some(1.0)), (3L, ts(2), None), (3L, ts(3), None), (3L, ts(4), None), (3L, ts(5), Some(1.0))
    ).toDF("timeseries_id", "datetime", "value")
      .withColumn("value", col("value").cast("double"))
    val out = Imputation
      .splineFill(df, "timeseries_id", "datetime", "value", minGap = 1, maxGap = 2)
      .orderBy("timeseries_id", "datetime")
      .collect()
    // series 1: natural spline over positions (1,0),(2,1),(4,0) at x=3
    val s1 = out.filter(_.getLong(0) == 1L)
    assert(math.abs(s1(2).getDouble(2) - 0.875) < 1e-12)
    assert(s1(2).getBoolean(3))
    assert(s1.map(_.getBoolean(3)).count(identity) == 1)
    // series 2: trailing gap stays null
    val s2 = out.filter(_.getLong(0) == 2L)
    assert(s2(2).isNullAt(2) && !s2(2).getBoolean(3))
    // series 3: oversized gap stays null
    val s3 = out.filter(_.getLong(0) == 3L)
    assert(s3.count(r => r.isNullAt(2)) == 3)
    assert(!s3.exists(_.getBoolean(3)))
  }

  test("splineFill respects minGap (short gaps left for other methods)") {
    import spark.implicits._
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2023-01-01 ${i}%02d:00:00")
    val df = Seq(
      (1L, ts(1), Some(0.0)), (1L, ts(2), None), (1L, ts(3), Some(2.0))
    ).toDF("timeseries_id", "datetime", "value")
      .withColumn("value", col("value").cast("double"))
    val out = Imputation
      .splineFill(df, "timeseries_id", "datetime", "value", minGap = 2, maxGap = 5)
      .orderBy("datetime")
      .collect()
    assert(out(1).isNullAt(2) && !out(1).getBoolean(3))
  }
}
