package graft.kernels

/** Natural cubic spline interpolation — the spline self-imputation
  * path of `R/imputeMissing.R:1128-1144` (YukonWRB/AquaCache), which
  * fits `stats::spline` over a +-20-row context window around each NA
  * run and evaluates at the gap positions. The reference's default is
  * R's fmm end condition; this implementation uses the natural end
  * condition (zero second derivative) — identical away from the
  * window edges, documented deviation at them.
  */
object SplineKernel {

  /** Fit a natural cubic spline through (xs, ys) (xs strictly
    * increasing, n >= 2) and evaluate at xout. Outside
    * [xs.head, xs.last] the spline extends LINEARLY with the boundary
    * slope — matching R's stats::spline natural method, which also
    * extrapolates linearly.
    */
  def naturalSpline(xs: Array[Double], ys: Array[Double], xout: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 2 && ys.length == n, "need >= 2 knots")
    if (n == 2) {
      val slope = (ys(1) - ys(0)) / (xs(1) - xs(0))
      return xout.map(x => ys(0) + slope * (x - xs(0)))
    }
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    // Thomas algorithm for the (n-2)-unknown tridiagonal system of
    // second derivatives; m(0) = m(n-1) = 0 (natural).
    val sub = new Array[Double](n - 2)
    val diag = new Array[Double](n - 2)
    val sup = new Array[Double](n - 2)
    val rhs = new Array[Double](n - 2)
    var i = 0
    while (i < n - 2) {
      sub(i) = h(i) / 6.0
      diag(i) = (h(i) + h(i + 1)) / 3.0
      sup(i) = h(i + 1) / 6.0
      rhs(i) = (ys(i + 2) - ys(i + 1)) / h(i + 1) - (ys(i + 1) - ys(i)) / h(i)
      i += 1
    }
    i = 1
    while (i < n - 2) {
      val w = sub(i) / diag(i - 1)
      diag(i) -= w * sup(i - 1)
      rhs(i) -= w * rhs(i - 1)
      i += 1
    }
    val m = new Array[Double](n)
    if (n > 2) {
      m(n - 2) = rhs(n - 3) / diag(n - 3)
      i = n - 4
      while (i >= 0) {
        m(i + 1) = (rhs(i) - sup(i) * m(i + 2)) / diag(i)
        i -= 1
      }
    }
    def segB(k: Int): Double =
      (ys(k + 1) - ys(k)) / h(k) - h(k) * (2.0 * m(k) + m(k + 1)) / 6.0
    xout.map { x =>
      if (x < xs(0)) {
        // linear extension with the first-derivative at the left knot
        ys(0) + segB(0) * (x - xs(0))
      } else if (x > xs(n - 1)) {
        // first derivative of the last segment evaluated at its end
        val k = n - 2
        val c = m(k) / 2.0
        val d = (m(k + 1) - m(k)) / (6.0 * h(k))
        val slopeEnd = segB(k) + 2.0 * c * h(k) + 3.0 * d * h(k) * h(k)
        ys(n - 1) + slopeEnd * (x - xs(n - 1))
      } else {
        // segment lookup (xout is small; binary search not needed)
        var k = 0
        while (k < n - 2 && x > xs(k + 1)) k += 1
        val dx = x - xs(k)
        val c = m(k) / 2.0
        val d = (m(k + 1) - m(k)) / (6.0 * h(k))
        ys(k) + segB(k) * dx + c * dx * dx + d * dx * dx * dx
      }
    }
  }
}
