package graft.kernels

import scala.collection.mutable.ArrayBuffer

/** Increment extraction from cumulative gauge data (standpipe
  * precipitation): resets on large drops, positive-noise floor,
  * gap-bounded computation over a series densified at its inferred
  * cadence.
  *
  * Behavioral parity with `R/compute_increments.R:13-138`
  * (YukonWRB/AquaCache):
  *   - the series is densified with NA rows at the inferred cadence
  *     inside observation gaps (`:33-67`);
  *   - crossing an NA run longer than `maxGap` points yields no
  *     increment and re-baselines at the first valid value;
  *   - a drop <= -resetDrop is a true reset (increment 0, baseline =
  *     new value);
  *   - otherwise increment = value - max(runningMax, prev) when
  *     >= minPos (re-baselining), else 0.
  */
object IncrementKernel {

  /** @return densified (epochSeconds, increment) pairs, increments
    *         None for NA rows / gap crossings / the first row
    */
  def computeIncrements(
      epochSeconds: Array[Long],
      values: Array[Double],
      resetDrop: Double = 20.0,
      minPos: Double = 0.0,
      maxGap: Int = 0
  ): (Array[Long], Array[Option[Double]]) = {
    require(epochSeconds.length == values.length)
    require(epochSeconds.length >= 2, "timeseries must have at least two points")

    // ---- densify at inferred cadence ----
    val periodSecs = PeriodKernel.inferPeriodSeconds(epochSeconds)
    val dts = ArrayBuffer.empty[Long]
    val vs = ArrayBuffer.empty[Option[Double]]
    var i = 0
    while (i < epochSeconds.length) {
      dts += epochSeconds(i)
      vs += Some(values(i))
      if (i < epochSeconds.length - 1) {
        periodSecs(i) match {
          case Some(p) if p > 0 && epochSeconds(i) + p < epochSeconds(i + 1) =>
            val gapSec = epochSeconds(i + 1) - epochSeconds(i)
            val nMissing = (gapSec / p - 1).toInt
            var k = 1
            while (k <= nMissing) {
              dts += epochSeconds(i) + k * p
              vs += None
              k += 1
            }
          case _ =>
        }
      }
      i += 1
    }

    val n = dts.length
    // preceding NA run lengths
    val naRunLen = new Array[Int](n)
    var run = 0
    i = 0
    while (i < n) {
      if (vs(i).isEmpty) { run += 1; naRunLen(i) = run }
      else run = 0
      i += 1
    }
    // RLE-style: every member of an NA run carries the FULL run length
    i = n - 1
    while (i > 0) {
      if (vs(i).isEmpty && vs(i - 1).isEmpty) naRunLen(i - 1) = naRunLen(i)
      i -= 1
    }

    val inc = Array.fill[Option[Double]](n)(None)
    var lastMax = values(0)
    i = 1
    while (i < n) {
      val cur = vs(i)
      val prev = vs(i - 1)
      if (prev.isEmpty && naRunLen(i - 1) > maxGap) {
        // oversized gap: no increment, re-baseline at first valid
        cur.foreach(v => lastMax = v)
      } else if (cur.isEmpty || prev.isEmpty) {
        // small gap edge: no increment, baseline unchanged
      } else {
        val v = cur.get
        val d = v - prev.get
        if (d <= -resetDrop) {
          lastMax = v
          inc(i) = Some(0.0)
        } else {
          val base = math.max(lastMax, prev.get)
          val add = v - base
          if (add >= minPos) {
            inc(i) = Some(add)
            lastMax = v
          } else {
            inc(i) = Some(0.0)
          }
        }
      }
      i += 1
    }
    (dts.toArray, inc)
  }
}
