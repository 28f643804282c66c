package graft.functions

/** ISO-8601 period strings <-> seconds, the reference's interchange
  * format for measurement cadence (`R/calculate_period.R:110-135` in
  * YukonWRB/AquaCache builds `P{d}DT{h}H{m}M{s}S` from fractional
  * hours; `lubridate::period()` parses it back).
  */
object PeriodFormat {

  /** Format fractional HOURS into the reference's exact shape
    * `P{d}DT{h}H{m}M{s}S` (seconds rounded half-even like R's
    * `round`).
    */
  def fromHours(hours: Double): String = {
    val days = math.floor(hours / 24).toLong
    val remainingHours = hours % 24
    val h = math.floor(remainingHours).toLong
    val fracMinutes = (remainingHours - math.floor(remainingHours)) * 60
    val m = math.floor(fracMinutes).toLong
    val s = math.rint((fracMinutes - m) * 60).toLong
    s"P${days}DT${h}H${m}M${s}S"
  }

  def fromSeconds(seconds: Long): String = fromHours(seconds / 3600.0)

  private val Re =
    """P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?""".r

  /** Parse `PnDTnHnMnS` (any component optional) to seconds. */
  def toSeconds(iso: String): Option[Long] = iso match {
    case Re(d, h, m, s) if Seq(d, h, m, s).exists(_ != null) =>
      def l(x: String) = Option(x).map(_.toDouble).getOrElse(0.0)
      Some(math.rint(l(d) * 86400 + l(h) * 3600 + l(m) * 60 + l(s)).toLong)
    case _ => None
  }

  /** Column form of [[toSeconds]] for the day-time shapes
    * `fromHours` emits (`PnDTnHnMnS`; no month/year components) —
    * pure regexp projection, codegen'd, null on null/unparseable
    * input.
    */
  def toSecondsCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def part(re: String) = {
      val x = regexp_extract(c, re, 1)
      coalesce(when(x === "", lit(0L)).otherwise(x.cast("long")), lit(0L))
    }
    when(
      c.isNull || !(c rlike "^P"),
      lit(null).cast("long")
    ).otherwise(
      part("(\\d+)D") * 86400L + part("(\\d+)H") * 3600L +
        part("(\\d+)M") * 60L + part("(\\d+)S")
    )
  }
}
