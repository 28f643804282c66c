package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Borehole / well CRUD gates — `R/insertACBorehole.R:1-418`
  * (YukonWRB/AquaCache): a borehole insert validates required fields,
  * referenced dimensions (location, purpose) and cross-field rules
  * (permafrost interval, bedrock-depth consistency), then fans out to
  * up to three child tables (permafrost layers, well attributes,
  * document links) keyed by the new borehole id.
  *
  * The reference stops on the first bad argument of ONE borehole;
  * batch-first Spark classifies EVERY incoming row (same checks, same
  * precedence) and returns accepted/reject frames plus the three child
  * frames, so one bad row doesn't abort a bulk import. All dimension
  * probes are broadcast joins; id assignment is a window over the
  * accepted set seeded from max(existing) — no driver-side loops.
  */
object Boreholes {

  /** accepted: incoming columns + borehole_id; rejects: incoming +
    * reject_reason; permafrost/wells/docLinks: child-table rows for
    * the accepted boreholes.
    */
  final case class BoreholeImport(
      accepted: DataFrame,
      rejects: DataFrame,
      permafrost: DataFrame,
      wells: DataFrame,
      docLinks: DataFrame
  )

  /** Validate a batch of borehole candidates and derive child rows.
    *
    * @param incoming  borehole_name, latitude, longitude, location_id
    *                  (nullable), purpose_id (nullable),
    *                  well_purpose_id (nullable), permafrost_present,
    *                  permafrost_top_m, permafrost_bot_m,
    *                  bedrock_reached (nullable bool),
    *                  depth_to_bedrock_m, is_well, casing_diameter_mm,
    *                  screen_top_depth_m, screen_bottom_depth_m,
    *                  share_with (array<string>), document_id
    *                  (nullable) — extra columns pass through
    * @param locations known location ids: location_id
    * @param purposes  known borehole/well purposes: purpose_id
    * @param existing  current boreholes: borehole_id, borehole_name,
    *                  latitude, longitude
    */
  def validate(
      incoming: DataFrame,
      locations: DataFrame,
      purposes: DataFrame,
      existing: DataFrame
  ): BoreholeImport = {
    import org.apache.spark.sql.expressions.Window
    val locs = locations
      .select(col("location_id"))
      .distinct()
      .withColumn("__loc_ok", lit(true))
    val purp = purposes
      .select(col("purpose_id"))
      .distinct()
      .withColumn("__purp_ok", lit(true))
    val wpurp = purp
      .select(col("purpose_id").as("well_purpose_id"), col("__purp_ok").as("__wpurp_ok"))
    // duplicate probe on the natural key (name, lat, lon), name
    // case-insensitive like the reference's location checks
    val dup = existing
      .select(
        lower(col("borehole_name")).as("__bh_key"),
        col("latitude"),
        col("longitude")
      )
      .distinct()
      .withColumn("__dup", lit(true))
    val joined = incoming
      .withColumn("__bh_key", lower(col("borehole_name")))
      .join(broadcast(locs), Seq("location_id"), "left")
      .join(broadcast(purp), Seq("purpose_id"), "left")
      .join(broadcast(wpurp), Seq("well_purpose_id"), "left")
      .join(broadcast(dup), Seq("__bh_key", "latitude", "longitude"), "left")
    // first-match-wins, mirroring the reference's stop-on-first-error
    // order: required fields, dimension existence, cross-field rules,
    // visibility, duplicate probe last
    val reason = when(
      col("borehole_name").isNull || trim(col("borehole_name")) === "",
      "missing_name"
    )
      .when(col("latitude").isNull || abs(col("latitude")) > 90.0, "bad_latitude")
      .when(col("longitude").isNull || abs(col("longitude")) > 180.0, "bad_longitude")
      .when(col("location_id").isNotNull && col("__loc_ok").isNull, "unknown_location")
      .when(col("purpose_id").isNotNull && col("__purp_ok").isNull, "unknown_purpose")
      .when(
        col("is_well") && col("well_purpose_id").isNotNull && col("__wpurp_ok").isNull,
        "unknown_well_purpose"
      )
      .when(
        col("permafrost_present") &&
          (col("permafrost_top_m").isNull || col("permafrost_bot_m").isNull),
        "missing_permafrost_depths"
      )
      .when(
        col("permafrost_present") && col("permafrost_bot_m") <= col("permafrost_top_m"),
        "bad_permafrost_interval"
      )
      .when(
        col("bedrock_reached") === true && col("depth_to_bedrock_m").isNull,
        "missing_depth_to_bedrock"
      )
      .when(
        col("bedrock_reached") === false && col("depth_to_bedrock_m").isNotNull,
        "unexpected_depth_to_bedrock"
      )
      .when(col("depth_to_bedrock_m") < 0.0, "negative_depth_to_bedrock")
      .when(size(coalesce(col("share_with"), array())) === 0, "missing_share_with")
      .when(col("__dup").isNotNull, "duplicate_borehole")
    val flagged = joined
      .withColumn("reject_reason", reason)
      .drop("__bh_key", "__loc_ok", "__purp_ok", "__wpurp_ok", "__dup")
    // deterministic id assignment: max existing id (broadcast 1-row
    // frame, no driver action) + dense order over the natural key —
    // range-partitioned rank (SeqIds), not a single-task window
    val accepted = SeqIds.assignIdsAbove(
      existing,
      "borehole_id",
      flagged.filter(col("reject_reason").isNull).drop("reject_reason"),
      Seq(lower(col("borehole_name")), col("latitude"), col("longitude")),
      "borehole_id"
    )
    val rejects = flagged.filter(col("reject_reason").isNotNull)
    val permafrost = accepted
      .filter(col("permafrost_present"))
      .select(
        col("borehole_id"),
        col("permafrost_top_m").as("depth_from_m"),
        col("permafrost_bot_m").as("depth_to_m")
      )
    val wells = accepted
      .filter(col("is_well"))
      .select(
        col("borehole_id"),
        col("casing_diameter_mm"),
        col("screen_top_depth_m"),
        col("screen_bottom_depth_m"),
        col("well_purpose_id"),
        col("share_with")
      )
    // document type follows the reference: "well log" when the
    // borehole is a well, "borehole log" otherwise
    val docLinks = accepted
      .filter(col("document_id").isNotNull)
      .select(
        col("borehole_id"),
        col("document_id"),
        when(col("is_well"), "well log").otherwise("borehole log").as("document_type")
      )
    BoreholeImport(accepted, rejects, permafrost, wells, docLinks)
  }
}
