package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Imperial→metric normalization at ingest — the NWIS adapter's
  * conversion step (`R/downloadNWIS.R:17` in YukonWRB/AquaCache: USGS
  * level/flow/temperature arrive in ft / cfs / °F and are stored
  * metric), plus the `inf_to_na` scrub (`R/utils.R:785`) applied
  * before any value reaches statistics.
  */
object UnitConvert {

  /** NaN/±Inf -> NULL, keeping the row (unlike the ingest filter,
    * which drops value-less rows entirely).
    */
  def infToNa(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity, lit(null))
      .otherwise(c)

  val FtPerM = 3.28084
  val CfsPerCms = 35.314666212661

  def ftToM(c: Column): Column = c / FtPerM
  def cfsToCms(c: Column): Column = c / CfsPerCms
  def fToC(c: Column): Column = (c - 32.0) * 5.0 / 9.0

  /** Conversion registry keyed by the adapter-args string. */
  val byName: Map[String, Column => Column] = Map(
    "ft_to_m" -> ftToM,
    "cfs_to_cms" -> cfsToCms,
    "f_to_c" -> fToC,
    "none" -> identity
  )

  /** Apply the named conversion (after the inf scrub). */
  def convert(name: String, c: Column): Column =
    byName.getOrElse(
      name,
      throw new IllegalArgumentException(s"unknown unit conversion $name")
    )(infToNa(c))
}
