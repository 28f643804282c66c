package graft.sources

import org.apache.spark.sql.DataFrame
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
