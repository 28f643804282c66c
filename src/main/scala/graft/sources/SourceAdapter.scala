package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest adapter contract, mirroring the reference's `source_fx`
  * dynamic dispatch (`do.call(source_fx, args)` with
  * `start_datetime` = last DB point + 1, `R/getNewContinuous.R:469-486`
  * in YukonWRB/AquaCache): every adapter returns the canonical
  * measurement frame and is registered under its `source_fx` name.
  *
  * Canonical output schema: datetime TIMESTAMP, value DOUBLE, and
  * optional grade/approval/qualifier/owner/contributor STRING,
  * period_seconds LONG — exactly the optional columns the reference
  * accepts from adapters (`R/getNewContinuous.R:504-556`); missing
  * ones are filled with series defaults downstream.
  */
final case class SeriesConfig(
    timeseriesId: Long,
    sourceFx: String,
    /** parsed source_fx_args JSON (the reference stores jsonb) */
    args: Map[String, String],
    defaultGrade: Option[String] = None,
    defaultApproval: Option[String] = None,
    recordRateSeconds: Option[Long] = None
)

trait SourceAdapter extends Serializable {
  def name: String

  /** Fetch rows with datetime >= startTs (inclusive); adapters may
    * over-fetch — the incremental driver re-filters under its lock.
    */
  def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DataFrame
}

object SourceAdapter {
  val CanonicalColumns: Seq[String] =
    Seq("datetime", "value", "grade", "approval", "qualifier", "period_seconds")

  /** Project any adapter output onto the canonical schema, adding
    * missing optional columns as nulls (default-fill happens later
    * against series metadata).
    */
  def normalize(df: DataFrame): DataFrame = {
    val withCols = CanonicalColumns.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d
      else
        d.withColumn(
          c,
          lit(null).cast(c match {
            case "datetime"       => TimestampType
            case "value"          => DoubleType
            case "period_seconds" => LongType
            case _                => StringType
          })
        )
    }
    withCols
      .select(CanonicalColumns.map(col): _*)
      .filter(col("datetime").isNotNull && col("value").isNotNull && !isnan(col("value")))
  }
}

/** Registry keyed by `source_fx` name — the dynamic-dispatch table. */
final class AdapterRegistry(adapters: Seq[SourceAdapter]) extends Serializable {
  private val byName: Map[String, SourceAdapter] = adapters.map(a => a.name -> a).toMap
  def apply(name: String): SourceAdapter =
    byName.getOrElse(name, throw new IllegalArgumentException(s"no adapter registered for source_fx '$name'"))
  def contains(name: String): Boolean = byName.contains(name)
}
