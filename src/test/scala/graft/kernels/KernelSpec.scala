package graft.kernels

import graft.functions.PeriodFormat
import org.scalatest.funsuite.AnyFunSuite

class KernelSpec extends AnyFunSuite {

  private def hourly(n: Int, start: Long = 1672531200L): Array[Long] =
    Array.tabulate(n)(i => start + i * 3600L)

  test("PeriodFormat round-trips common cadences") {
    assert(PeriodFormat.fromHours(1.0) == "P0DT1H0M0S")
    assert(PeriodFormat.fromHours(0.25) == "P0DT0H15M0S")
    assert(PeriodFormat.fromHours(24.0) == "P1DT0H0M0S")
    assert(PeriodFormat.fromHours(26.5) == "P1DT2H30M0S")
    assert(PeriodFormat.toSeconds("P0DT1H0M0S").contains(3600L))
    assert(PeriodFormat.toSeconds("P1DT0H0M0S").contains(86400L))
    assert(PeriodFormat.toSeconds("P0DT0H15M0S").contains(900L))
    assert(PeriodFormat.toSeconds("garbage").isEmpty)
    for (secs <- Seq(300L, 900L, 3600L, 7200L, 21600L, 86400L, 90000L))
      assert(PeriodFormat.toSeconds(PeriodFormat.fromSeconds(secs)).contains(secs))
  }

  test("PeriodKernel: steady hourly cadence fills every row") {
    val p = PeriodKernel.inferPeriods(hourly(10))
    assert(p.forall(_.contains("P0DT1H0M0S")))
  }

  test("PeriodKernel: cadence change 1h -> 6h detected and anchored") {
    val dts = hourly(10) ++ Array.tabulate(10)(i => hourly(10).last + (i + 1) * 21600L)
    val p = PeriodKernel.inferPeriodSeconds(dts)
    assert(p.head.contains(3600L))
    assert(p.last.contains(21600L))
    assert(p.flatten.distinct.toSet == Set(3600L, 21600L))
  }

  test("PeriodKernel: too few points -> undetermined") {
    assert(PeriodKernel.inferPeriods(hourly(2)).forall(_.isEmpty))
    assert(PeriodKernel.inferPeriods(Array(1L)).forall(_.isEmpty))
  }

  test("IncrementKernel: basic increments relative to running max") {
    val dts = hourly(4)
    val (_, inc) = IncrementKernel.computeIncrements(dts, Array(0.0, 5.0, 12.0, 11.0))
    assert(inc.toList == List(None, Some(5.0), Some(7.0), Some(0.0)))
  }

  test("IncrementKernel: hard reset on large drop") {
    val dts = hourly(5)
    val (_, inc) =
      IncrementKernel.computeIncrements(dts, Array(0.0, 10.0, 30.0, 5.0, 12.0), resetDrop = 20.0)
    assert(inc.toList == List(None, Some(10.0), Some(20.0), Some(0.0), Some(7.0)))
  }

  test("IncrementKernel: small drop is NOT a reset; fluctuation measured vs running max") {
    val dts = hourly(4)
    val (_, inc) =
      IncrementKernel.computeIncrements(dts, Array(0.0, 10.0, 8.0, 12.0), resetDrop = 20.0)
    // 8 -> no reset (drop 2), inc 0; 12 vs max(10, 8) -> 2
    assert(inc.toList == List(None, Some(10.0), Some(0.0), Some(2.0)))
  }

  test("IncrementKernel: min_pos floors noise without advancing baseline") {
    val dts = hourly(4)
    val (_, inc) =
      IncrementKernel.computeIncrements(dts, Array(0.0, 1.0, 1.5, 4.0), minPos = 2.0)
    // +1 and +0.5 below floor -> 0; then 4 vs max(0, 1.5): add 2.5 >= 2
    assert(inc.toList == List(None, Some(0.0), Some(0.0), Some(2.5)))
  }

  test("IncrementKernel: reference boundary semantics (tests/testthat/test-compute_increments.R)") {
    // drop of exactly reset_drop IS a reset (<= -reset_drop, :48)
    val dts5 = hourly(6)
    val (_, i1) = IncrementKernel.computeIncrements(
      dts5, Array(30.0, 10.0, 11.0, 12.0, 13.0, 14.0), resetDrop = 20.0)
    assert(i1.toList == List(None, Some(0.0), Some(1.0), Some(1.0), Some(1.0), Some(1.0)))
    // the reference's wiggle vector: c(10, 9, 10.5, 11, 12, 13) -> 0, 0.5, 0.5, 1, 1
    val (_, i2) = IncrementKernel.computeIncrements(
      dts5, Array(10.0, 9.0, 10.5, 11.0, 12.0, 13.0), resetDrop = 20.0)
    assert(i2.toList == List(None, Some(0.0), Some(0.5), Some(0.5), Some(1.0), Some(1.0)))
    // add == min_pos IS counted (the reference implementation is
    // `add >= min_pos`, compute_increments.R:56 — its test comment
    // says strict > but never exercises a tie)
    val dts3 = hourly(3)
    val (_, i3) = IncrementKernel.computeIncrements(
      dts3, Array(0.0, 2.0, 2.5), minPos = 2.0)
    assert(i3.toList == List(None, Some(2.0), Some(0.0)))
  }

  test("IncrementKernel: densifies gaps and blocks increments across oversized gaps") {
    // hourly cadence established, then a 5-hour observation gap
    val dts = hourly(8) ++ Array(hourly(8).last + 5 * 3600L, hourly(8).last + 6 * 3600L)
    val vals = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 20.0, 21.0)
    val (outDts, inc) = IncrementKernel.computeIncrements(dts, vals, maxGap = 2)
    assert(outDts.length == 14) // 4 NA rows inserted in the 5h gap
    val byDt = outDts.zip(inc).toMap
    // first valid after the oversized gap: no increment, re-baselined
    assert(byDt(hourly(8).last + 5 * 3600L).isEmpty)
    // next point: increment from new baseline
    assert(byDt(hourly(8).last + 6 * 3600L).contains(1.0))
  }

  test("IncrementKernel: small gap (<= maxGap) still blocks edge increments but keeps baseline") {
    val dts = hourly(8) ++ Array(hourly(8).last + 3 * 3600L, hourly(8).last + 4 * 3600L)
    val vals = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 9.0, 10.0)
    val (outDts, inc) = IncrementKernel.computeIncrements(dts, vals, maxGap = 2)
    val byDt = outDts.zip(inc).toMap
    // 2 NA rows inserted; run length 2 <= maxGap: edge rows get no
    // increment (NA neighbors) but baseline survives
    assert(byDt(hourly(8).last + 3 * 3600L).isEmpty)
    assert(byDt(hourly(8).last + 4 * 3600L).contains(1.0))
  }

  test("IncrementKernel: requires at least two points") {
    intercept[IllegalArgumentException] {
      IncrementKernel.computeIncrements(Array(1L), Array(1.0))
    }
  }
}
