package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog CRUD gates — `R/addACTimeseries.R` / `R/addACLocation.R`
  * (YukonWRB/AquaCache): new catalog rows are validated against the
  * existing dimension tables before insert. The reference stops on the
  * first bad row; batch-first Spark classifies EVERY row and returns
  * accepted/rejects frames so one bad series doesn't abort a
  * ten-million-row catalog import.
  *
  * All existence checks are broadcast joins against the (small)
  * dimension tables; the duplicate check is a left-anti join on the
  * natural key — no driver-side loops.
  */
object CatalogOps {

  final case class CatalogImport(accepted: DataFrame, rejects: DataFrame)

  /** The natural key that makes a timeseries unique
    * (`addACTimeseries.R`'s duplicate probe).
    */
  val SeriesKey: Seq[String] = Seq("location", "parameter_id", "media_id", "aggregation_type", "record_rate")

  /** Validate a batch of new timeseries rows.
    *
    * @param incoming   location, parameter_id, media_id,
    *                   aggregation_type, record_rate, start_datetime,
    *                   source_fx (nullable), share_with
    * @param locations  known locations: location (name)
    * @param parameters known parameters: parameter_id
    * @param media      known media types: media_id
    * @param adapterNames registered source_fx names (the dynamic
    *                   dispatch table — a bad name would fail at
    *                   fetch time otherwise)
    * @param existing   current timeseries catalog with the SeriesKey
    *                   columns
    */
  def validateNewTimeseries(
      incoming: DataFrame,
      locations: DataFrame,
      parameters: DataFrame,
      media: DataFrame,
      adapterNames: Seq[String],
      existing: DataFrame
  ): CatalogImport = {
    val locs = locations
      .select(lower(col("location")).as("__loc_key"))
      .distinct()
      .withColumn("__loc_ok", lit(true))
    val params = parameters
      .select(col("parameter_id"))
      .distinct()
      .withColumn("__param_ok", lit(true))
    val med = media
      .select(col("media_id"))
      .distinct()
      .withColumn("__media_ok", lit(true))
    // duplicate probe normalizes location case, like the existence check
    val dupKey = "__loc_key" +: SeriesKey.tail
    val dup = existing
      .withColumn("__loc_key", lower(col("location")))
      .select(dupKey.map(col): _*)
      .distinct()
      .withColumn("__dup", lit(true))
    val joined = incoming
      .withColumn("__loc_key", lower(col("location")))
      .join(broadcast(locs), Seq("__loc_key"), "left")
      .join(broadcast(params), Seq("parameter_id"), "left")
      .join(broadcast(med), Seq("media_id"), "left")
      .join(broadcast(dup), dupKey, "left")
    val badFx = col("source_fx").isNotNull &&
      !col("source_fx").isin(adapterNames: _*)
    val reason = when(col("start_datetime").isNull, "missing_start_datetime")
      .when(col("location").isNull, "missing_location")
      .when(col("__loc_ok").isNull, "unknown_location")
      .when(col("parameter_id").isNull, "missing_parameter")
      .when(col("__param_ok").isNull, "unknown_parameter")
      .when(col("__media_ok").isNull, "unknown_media")
      .when(badFx, "unknown_source_fx")
      .when(size(coalesce(col("share_with"), array())) === 0, "missing_share_with")
      .when(col("__dup").isNotNull, "duplicate_timeseries")
    val flagged = joined
      .withColumn("reject_reason", reason)
      .drop("__loc_key", "__loc_ok", "__param_ok", "__media_ok", "__dup")
    CatalogImport(
      accepted = flagged.filter(col("reject_reason").isNull).drop("reject_reason"),
      rejects = flagged
        .filter(col("reject_reason").isNotNull)
        .select(col("location"), col("parameter_id"), col("reject_reason"))
    )
  }

  /** Validate new locations (`addACLocation.R`): name present and not
    * yet taken (case-insensitive), latitude/longitude ranges, a
    * visibility group.
    */
  def validateNewLocations(incoming: DataFrame, existing: DataFrame): CatalogImport = {
    val taken = existing
      .select(lower(col("location")).as("__loc_key"))
      .distinct()
      .withColumn("__taken", lit(true))
    val flagged = incoming
      .withColumn("__loc_key", lower(col("location")))
      .join(broadcast(taken), Seq("__loc_key"), "left")
      .withColumn(
        "reject_reason",
        when(col("location").isNull || trim(col("location")) === "", "missing_name")
          .when(col("__taken").isNotNull, "duplicate_location")
          .when(abs(col("latitude")) > 90.0 || col("latitude").isNull, "bad_latitude")
          .when(abs(col("longitude")) > 180.0 || col("longitude").isNull, "bad_longitude")
          .when(size(coalesce(col("share_with"), array())) === 0, "missing_share_with")
      )
      .drop("__loc_key", "__taken")
    CatalogImport(
      accepted = flagged.filter(col("reject_reason").isNull).drop("reject_reason"),
      rejects = flagged
        .filter(col("reject_reason").isNotNull)
        .select(col("location"), col("reject_reason"))
    )
  }
}
