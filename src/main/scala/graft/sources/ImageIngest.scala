package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Station-image series ingest — `R/getNewImages.R:1-182` (per-series
  * incremental fetch from the `last_img` watermark, `active` filter,
  * `source_fx` dispatch), `R/insertACImage.R` (skip-existing upsert on
  * (img_series_id, datetime)), `R/downloadWSCImages.R:16-91` /
  * `R/downloadNupointImages.R` (the fetchers; HTTP out of scope —
  * zero egress — everything after the bytes arrive is here).
  *
  * Spark shape: images are rows `(img_series_id, img_ts, payload
  * binary, format string)`; the catalog is a DataFrame joined — not
  * collected — so a million camera series is the same plan as ten.
  * The payload is opaque binary end-to-end (the multimodal-column
  * discipline of SURVEY §8.2); decode/thumbnail is `ml.Multimodal`'s
  * job, not the ingest path's.
  */
object ImageIngest {

  /** Incremental new-image selection.
    *
    * @param catalog img_series_id, last_img (nullable ts watermark),
    *                active boolean
    * @param fetched img_series_id, img_ts, payload, format
    * @return canonical new rows, exactly-once per (series, img_ts):
    *         active series only, strictly after the watermark,
    *         same-timestamp duplicates resolved deterministically
    *         (lowest fingerprint wins), plus a content fingerprint.
    */
  def newImages(catalog: DataFrame, fetched: DataFrame): DataFrame = {
    val cat = catalog
      .filter(col("active"))
      .select(col("img_series_id"), col("last_img"))
    val fresh = fetched
      .join(cat, Seq("img_series_id"))
      .filter(col("last_img").isNull || col("img_ts") > col("last_img"))
      .drop("last_img")
      .withColumn(
        "fingerprint",
        graft.functions.PortableHash.md5num56(col("payload"))
      )
    val w = Window
      .partitionBy(col("img_series_id"), col("img_ts"))
      .orderBy(col("fingerprint"))
    fresh
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Skip-existing append (`insertACImage`'s ON CONFLICT DO NOTHING):
    * drop rows whose (series, ts) already exist — a left-anti join, no
    * driver round trip.
    */
  def skipExisting(incoming: DataFrame, existing: DataFrame): DataFrame =
    incoming.join(
      existing.select(col("img_series_id"), col("img_ts")),
      Seq("img_series_id", "img_ts"),
      "left_anti"
    )

  final case class RegisterResult(accepted: DataFrame, rejects: DataFrame)
  final case class SeedResult(kept: DataFrame, rolledBack: DataFrame)

  /** `source_fx_args` parser — the reference's "argument1: value1,
    * argument2: value2" string becomes a compact JSON object
    * (`R/addACImageSeries.R:77-90`): entries split on ",\\s*", each key
    * is everything before the FIRST colon, each value everything after
    * it (colons allowed inside values); a colon-less entry keeps the
    * whole text as both key and value, exactly like R's no-match
    * `sub`. Pure codegen'd string ops — no UDF.
    */
  def parseFxArgs(args: Column): Column = {
    val entries = transform(
      split(args, ",\\s*"),
      e =>
        struct(
          regexp_replace(e, ":.*", "").as("key"),
          regexp_replace(e, "^[^:]+:\\s*", "").as("value")
        )
    )
    // last-wins on duplicate keys (R named-list semantics): under the
    // default EXCEPTION map-key-dedup policy a repeated key would
    // throw at execution time and fail the whole registration batch
    val deduped = filter(
      entries,
      (e, i) =>
        !exists(
          slice(entries, i + lit(2), greatest(size(entries) - i - lit(1), lit(0))),
          later => later.getField("key") === e.getField("key")
        )
    )
    when(args.isNull, lit(null).cast("string"))
      .otherwise(to_json(map_from_entries(deduped)))
  }

  /** Image-series registration gates — `R/addACImageSeries.R:19-138`:
    * the location must exist (`:36-49`), share_with must be a
    * non-empty set of known groups (`:57-59` plus the share_with
    * trigger the DB enforces), one auto series per location
    * (`:61-73`), and start/source_fx must be present for the fetch
    * trigger to mean anything. Accepted rows get sequential ids above
    * max(existing) and `first_img = last_img = start_datetime` (the
    * pre-fetch watermark, `:92-105`); the seeded first fetch then
    * confirms or rolls back via [[seedFirstFetch]].
    *
    * Batch-first like the raster twin
    * ([[RasterIngest.registerSeries]]): every gate is a broadcast
    * join + one flag projection, so registering a million cameras is
    * the same plan as one.
    */
  def registerSeries(
      incoming: DataFrame,
      locations: DataFrame,
      groups: DataFrame,
      existing: DataFrame
  ): RegisterResult = {
    val locs = broadcast(
      locations.select(col("location_id"), lit(true).as("__known_loc"))
    )
    val groupArr = broadcast(
      groups.select(collect_set(col("group_name")).as("__groups"))
    )
    val dupes = broadcast(
      existing.select(col("location_id")).distinct().withColumn("__dup", lit(true))
    )
    val flagged = incoming
      .join(locs, Seq("location_id"), "left")
      .join(dupes, Seq("location_id"), "left")
      .crossJoin(groupArr) // one-row dimension
      .withColumn(
        "reject_reason",
        when(col("start_datetime").isNull, "missing_start")
          .when(col("source_fx").isNull, "missing_source_fx")
          .when(col("__known_loc").isNull, "unknown_location")
          .when(
            // NULL-safe: size(NULL) is -1 (legacy sizeOfNull) and
            // forall over NULL is NULL, so a bare <= 0 / negated
            // forall would let a NULL share_with (or one containing
            // a NULL element) slip past the non-empty-known-groups
            // gate the reference's trigger enforces
            col("share_with").isNull ||
              size(col("share_with")) === 0 ||
              !coalesce(
                forall(
                  col("share_with"),
                  g => coalesce(array_contains(col("__groups"), g), lit(false))
                ),
                lit(false)
              ),
            "bad_share_with"
          )
          .when(col("__dup").isNotNull, "duplicate_series")
      )
    val wBatch = Window
      .partitionBy(col("location_id"))
      .orderBy(col("reject_reason").isNotNull, col("src_key"))
    val batchGated = flagged
      .withColumn("__batch_rank", row_number().over(wBatch))
      .withColumn(
        "reject_reason",
        coalesce(col("reject_reason"), when(col("__batch_rank") > 1, "duplicate_in_batch"))
      )
    val rejects = batchGated
      .filter(col("reject_reason").isNotNull)
      .select(col("src_key"), col("location_id"), col("reject_reason"))
    val accepted = graft.operators.SeqIds
      .assignIdsAbove(
        existing,
        "img_series_id",
        batchGated.filter(col("reject_reason").isNull),
        Seq(col("src_key")),
        "img_series_id",
        // image-SERIES registration is a dimension-sized CRUD batch by
        // contract (one row per camera) — the documented smallBatch hatch
        smallBatch = true
      )
      .withColumn("source_fx_args", parseFxArgs(col("source_fx_args")))
      .withColumn("first_img", col("start_datetime"))
      .withColumn("last_img", col("start_datetime"))
      .withColumn("active", lit(true))
      .withColumn(
        "description",
        lit("Image series automatically taken from a web or server location.")
      )
      .drop("__max_id", "__seq", "__known_loc", "__dup", "__groups", "__batch_rank", "reject_reason")
    RegisterResult(accepted, rejects)
  }

  /** The seeded first fetch (`R/addACImageSeries.R:106-137`): a new
    * series whose first fetch finds nothing is DELETED (the reference's
    * rollback-with-warning); one that finds images gets `first_img` =
    * min(fetched datetime) and `last_img` = max. One aggregation over
    * the fetched batch, one broadcast-able join back.
    */
  def seedFirstFetch(accepted: DataFrame, fetchedImages: DataFrame): SeedResult = {
    val seeded = fetchedImages
      .groupBy(col("img_series_id"))
      .agg(min(col("img_ts")).as("__first"), max(col("img_ts")).as("__last"))
    val kept = accepted
      .join(seeded, Seq("img_series_id"))
      .withColumn("first_img", col("__first"))
      .withColumn("last_img", col("__last"))
      .drop("__first", "__last")
    val rolledBack = accepted
      .join(seeded.select("img_series_id"), Seq("img_series_id"), "left_anti")
      .select(col("src_key"), col("location_id"), col("img_series_id"))
    SeedResult(kept, rolledBack)
  }

  /** Per-series latest image + the new watermark — what `getNewImages`
    * writes back to `image_series.last_img` after a fetch round.
    */
  def latestPerSeries(images: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("img_series_id"))
      .orderBy(col("img_ts").desc, col("fingerprint"))
    images
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(
        col("img_series_id"),
        col("img_ts").as("last_img"),
        col("fingerprint").as("last_fingerprint"),
        length(col("payload")).as("last_bytes")
      )
  }
}
