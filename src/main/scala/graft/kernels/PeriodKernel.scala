package graft.kernels

import graft.functions.PeriodFormat

/** Cadence (period) inference over one series' sorted datetimes.
  *
  * Behavioral parity with `R/calculate_period.R:77-135`
  * (YukonWRB/AquaCache): successive gaps in hours are smoothed with a
  * centered rolling median (k = 3, ends NA); a cadence CHANGE is
  * declared after three consecutive smoothed values that differ from
  * the last accepted cadence (the 3-consecutive-changes heuristic,
  * `:88-107`), anchored at the datetime two diffs back; accepted
  * cadences become ISO-8601 period strings, LOCF-filled forward then
  * backward. Returns None per row when no cadence was ever
  * conclusive (the reference then fetches extra DB rows; callers with
  * no DB leave the period NULL).
  */
object PeriodKernel {

  /** Rolling median of 3, centered, ends None. */
  private[kernels] def rollMedian3(xs: Array[Double]): Array[Option[Double]] = {
    val out = Array.fill[Option[Double]](xs.length)(None)
    var i = 1
    while (i < xs.length - 1) {
      val a = xs(i - 1); val b = xs(i); val c = xs(i + 1)
      val mid = math.max(math.min(a, b), math.min(math.max(a, b), c))
      out(i) = Some(mid)
      i += 1
    }
    out
  }

  /** @param epochSeconds sorted, distinct datetimes of one series
    * @return per-row ISO-8601 period strings (None = undetermined)
    */
  def inferPeriods(epochSeconds: Array[Long]): Array[Option[String]] = {
    val n = epochSeconds.length
    if (n < 2) return Array.fill(n)(None)
    val diffs = Array.tabulate(n - 1)(i => (epochSeconds(i + 1) - epochSeconds(i)) / 3600.0)
    val smoothed = rollMedian3(diffs)
    // scan for 3-consecutive-change pattern (R indices are 1-based;
    // smoothed(j) here corresponds to R's smoothed_diffs[j+1])
    var consecutive = 0
    var lastDiff = 0.0
    val periods = Array.fill[Option[String]](n)(None)
    var j = 0
    while (j < smoothed.length) {
      smoothed(j) match {
        case Some(s) if s != lastDiff =>
          consecutive += 1
          if (consecutive == 3) {
            lastDiff = s
            // R anchors at data$datetime[j-2] with j 1-based over
            // diffs; 0-based row index = (j+1) - 2 - 1 = j - 2
            val anchor = j - 2
            if (anchor >= 0) periods(anchor) = Some(PeriodFormat.fromHours(s))
            consecutive = 0
          }
        case _ =>
          consecutive = 0
      }
      j += 1
    }
    if (!periods.exists(_.isDefined)) return periods // all None: undetermined
    // LOCF forward then backward
    var last: Option[String] = None
    var i = 0
    while (i < n) {
      if (periods(i).isDefined) last = periods(i) else periods(i) = last
      i += 1
    }
    var next: Option[String] = None
    i = n - 1
    while (i >= 0) {
      if (periods(i).isDefined) next = periods(i) else periods(i) = next
      i -= 1
    }
    periods
  }

  /** Period per row in seconds (None when undetermined). */
  def inferPeriodSeconds(epochSeconds: Array[Long]): Array[Option[Long]] =
    inferPeriods(epochSeconds).map(_.flatMap(PeriodFormat.toSeconds))
}
