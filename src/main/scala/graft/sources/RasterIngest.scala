package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The incremental raster-fetch driver — `R/getNewRasters.R:80-220` in
  * YukonWRB/AquaCache: per-series fetch-start ("next_instant")
  * resolution by raster type, preliminary-replacement for reanalysis,
  * issue-based watermarks for forecasts, and the post-fetch watermark
  * advance.
  *
  * Spark shape: the catalog and the store's reference index are
  * DataFrames joined per series — no driver-side loop, no collect; a
  * catalog of ten million raster series plans exactly like ten. Tiles
  * themselves are `operators.Raster` rows.
  */
object RasterIngest {

  /** Per-series fetch start instant (the reference's `next_instant`).
    *
    * @param catalog  raster_series_id, raster_type
    *                 ('reanalysis' | 'forecast' | other),
    *                 end_datetime, last_issue, active
    * @param storeRef existing-raster index: raster_series_id,
    *                 valid_from, valid_to, flag (nullable;
    *                 'PRELIMINARY' marks replaceable reanalysis)
    * @return active series with `fetch_from`:
    *   - reanalysis: 1s before the earliest PRELIMINARY raster newer
    *     than end_datetime - 30d (so prelims get replaced), else 1s
    *     after the last stored valid_to, else the series end_datetime
    *     (`getNewRasters.R:157-196`);
    *   - forecast: last_issue, else end_datetime + 1s (`:200-208`);
    *   - other: end_datetime + 1s (`:210-219`).
    */
  def fetchPlan(catalog: DataFrame, storeRef: DataFrame): DataFrame = {
    val prelim = storeRef
      .filter(col("flag") === "PRELIMINARY")
      .groupBy(col("raster_series_id"))
      .agg(min(col("valid_from")).as("__prelim_from"))
    val lastStored = storeRef
      .groupBy(col("raster_series_id"))
      .agg(max(col("valid_to")).as("__last_valid_to"))
    val secs = (c: org.apache.spark.sql.Column) => unix_timestamp(c)
    catalog
      .filter(col("active"))
      .join(prelim, Seq("raster_series_id"), "left")
      .join(lastStored, Seq("raster_series_id"), "left")
      // a prelim only triggers replacement when inside the 30-day
      // lookback from the series watermark
      .withColumn(
        "__prelim_eligible",
        when(
          col("__prelim_from") > timestamp_seconds(secs(col("end_datetime")) - 30L * 86400L),
          col("__prelim_from")
        )
      )
      .withColumn(
        "fetch_from",
        when(
          col("raster_type") === "reanalysis",
          coalesce(
            timestamp_seconds(secs(col("__prelim_eligible")) - 1),
            timestamp_seconds(secs(col("__last_valid_to")) + 1),
            col("end_datetime")
          )
        ).when(
          col("raster_type") === "forecast",
          coalesce(col("last_issue"), timestamp_seconds(secs(col("end_datetime")) + 1))
        ).otherwise(timestamp_seconds(secs(col("end_datetime")) + 1))
      )
      .drop("__prelim_from", "__last_valid_to", "__prelim_eligible")
  }

  /** Merge fetched tiles into the store (`getNewRasters.R:280-420` +
    * the keep_forecasts pass):
    *
    *   - reanalysis: incoming replaces any stored raster whose
    *     valid_ts falls at/after the series' earliest incoming
    *     valid_ts (that's how PRELIMINARY rasters get overwritten by
    *     finals) — an anti range-join, then union;
    *   - forecast: union then `Raster.supersedeForecasts(selective)`,
    *     so the newest issue wins per (valid, tile) and uncovered old
    *     forecasts survive.
    *
    * Tile frames carry raster_type; both branches shuffle only on the
    * series/tile keys.
    */
  def mergeFetched(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val inReanalysis = incoming.filter(col("raster_type") === "reanalysis")
    val inOther = incoming.filter(col("raster_type") =!= "reanalysis")
    val replaceFrom = inReanalysis
      .groupBy(col("series_id"), col("band"))
      .agg(min(col("valid_ts")).as("__replace_from"))
    val keptExisting = existing
      .join(broadcast(replaceFrom), Seq("series_id", "band"), "left")
      .filter(
        col("__replace_from").isNull ||
          col("raster_type") =!= "reanalysis" ||
          col("valid_ts") < col("__replace_from")
      )
      .drop("__replace_from")
    graft.operators.Raster.supersedeForecasts(
      keptExisting.unionByName(inReanalysis).unionByName(inOther),
      "selective"
    )
  }

  /** Post-merge watermark advance (`getNewRasters.R:430-470`): new
    * end_datetime = max stored valid_ts, new last_issue = max issue_ts
    * (forecast series only).
    */
  def advanceWatermarks(catalog: DataFrame, merged: DataFrame): DataFrame = {
    val marks = merged
      .groupBy(col("series_id").as("raster_series_id"))
      .agg(
        max(col("valid_ts")).as("__new_end"),
        max(when(col("raster_type") === "forecast", col("issue_ts"))).as("__new_issue")
      )
    catalog
      .join(marks, Seq("raster_series_id"), "left")
      .withColumn("end_datetime", coalesce(greatest(col("__new_end"), col("end_datetime")), col("end_datetime")))
      .withColumn("last_issue", coalesce(greatest(col("__new_issue"), col("last_issue")), col("__new_issue"), col("last_issue")))
      .drop("__new_end", "__new_issue")
  }

  final case class RegisterResult(accepted: DataFrame, rejects: DataFrame)

  /** Raster-series registration — `R/addACRasterSeries.R:25-120`
    * (YukonWRB/AquaCache): validates model / parameter / fetch
    * function / type, resolves the matrix state (explicit wins; a
    * multi-state parameter resolves through its media, anything else
    * takes the parameter default — `resolve_parameter_matrix_state`
    * in `R/utils.R` errors rather than catalog a NULL matrix state,
    * so an unresolvable media is a reject here, never a NULL insert),
    * refuses duplicate (model, parameter, type, matrix_state) series
    * — matrix compared null-safely, matching the reference's
    * `IS NOT DISTINCT FROM` dup probe — both against the existing
    * catalog and within the batch itself (the reference's
    * one-at-a-time flow would reject the second of two identical
    * incoming rows; lowest src_key wins here), and seeds the new
    * catalog row's watermark at `start_datetime` so the fetch driver
    * ([[fetchPlan]]) begins exactly there. Batch-first; every dim is
    * broadcast and ids assign above max(existing) via the
    * range-partitioned rank ([[graft.operators.SeqIds]]) — no
    * single-task window on a bulk import.
    *
    * @param incoming      src_key, model, parameter_id,
    *                      start_datetime, source_fx, raster_type
    *                      (+ optional media_id, matrix_state_id,
    *                      z_value, z_units)
    * @param parameters    parameter_id, default_matrix_state_id,
    *                      multi_state
    * @param knownFx       single column source_fx of fetchable fns
    * @param existing      raster_series_id, model, parameter_id,
    *                      raster_type, matrix_state_id
    * @param mediaDefaults media_id, default_matrix_state_id (the
    *                      media→matrix resolution table, same dim
    *                      [[graft.jobs.AddDiscrete]] joins)
    */
  def registerSeries(
      incoming: DataFrame,
      parameters: DataFrame,
      knownFx: DataFrame,
      existing: DataFrame,
      mediaDefaults: DataFrame
  ): RegisterResult = {
    import org.apache.spark.sql.expressions.Window
    val dims = broadcast(
      parameters.select(
        col("parameter_id"),
        col("default_matrix_state_id"),
        col("multi_state"),
        lit(true).as("__known_param")
      )
    )
    val fx = broadcast(knownFx.select(col("source_fx"), lit(true).as("__known_fx")))
    val media = broadcast(
      mediaDefaults.select(
        col("media_id"),
        col("default_matrix_state_id").as("__media_matrix")
      )
    )
    val dupes = broadcast(
      existing
        .select(
          col("model").as("__dup_model"),
          col("parameter_id").as("__dup_param"),
          col("raster_type").as("__dup_type"),
          col("matrix_state_id").as("__dup_matrix")
        )
        .distinct()
        .withColumn("__dup", lit(true))
    )
    val resolved = incoming
      .join(dims, Seq("parameter_id"), "left")
      .join(fx, Seq("source_fx"), "left")
      .join(media, Seq("media_id"), "left")
      .withColumn(
        "__resolved_matrix",
        coalesce(
          col("matrix_state_id"),
          when(col("multi_state"), col("__media_matrix"))
            .otherwise(col("default_matrix_state_id"))
        )
      )
    val flagged = resolved
      .join(
        dupes,
        col("model") === col("__dup_model") &&
          col("parameter_id") === col("__dup_param") &&
          col("raster_type") === col("__dup_type") &&
          col("__resolved_matrix") <=> col("__dup_matrix"),
        "left"
      )
      .withColumn(
        "reject_reason",
        when(col("model").isNull, "missing_model")
          .when(col("start_datetime").isNull, "missing_start")
          .when(col("source_fx").isNull, "missing_source_fx")
          .when(!col("raster_type").isin("forecast", "reanalysis"), "bad_type")
          .when(col("__known_param").isNull, "unknown_parameter")
          .when(col("__known_fx").isNull, "unknown_source_fx")
          .when(
            col("matrix_state_id").isNull && col("multi_state") && col("media_id").isNull,
            "ambiguous_matrix_state"
          )
          .when(
            col("matrix_state_id").isNull && col("multi_state") && col("__media_matrix").isNull,
            "unresolved_matrix_state"
          )
          .when(col("z_value").isNotNull && col("z_units").isNull, "missing_z_units")
          .when(col("__dup").isNotNull, "duplicate_series")
      )
    // intra-batch dup: among otherwise-accepted rows sharing the dup
    // key, only the lowest src_key survives (ordering rejected rows
    // last keeps the accepted ranks dense)
    val wBatch = Window
      .partitionBy(
        col("model"), col("parameter_id"), col("raster_type"), col("__resolved_matrix")
      )
      .orderBy(col("reject_reason").isNotNull, col("src_key"))
    val batchGated = flagged
      .withColumn("__batch_rank", row_number().over(wBatch))
      .withColumn(
        "reject_reason",
        coalesce(
          col("reject_reason"),
          when(col("__batch_rank") > 1, "duplicate_in_batch")
        )
      )
    val rejects = batchGated
      .filter(col("reject_reason").isNotNull)
      .select(col("src_key"), col("reject_reason"))
    val accepted = graft.operators.SeqIds
      .assignIdsAbove(
        existing,
        "raster_series_id",
        batchGated.filter(col("reject_reason").isNull),
        Seq(col("src_key")),
        "raster_series_id"
      )
      .withColumn("matrix_state_id", col("__resolved_matrix"))
      // the fetch driver's watermark: fetching starts at start_datetime
      .withColumn("end_datetime", col("start_datetime"))
      .withColumn("last_issue", lit(null).cast("timestamp"))
      .withColumn("active", lit(true))
      .drop(
        "__max_id", "__seq", "__known_param", "__known_fx", "__dup", "__dup_model",
        "__dup_param", "__dup_type", "__dup_matrix", "__media_matrix",
        "__resolved_matrix", "__batch_rank", "default_matrix_state_id",
        "multi_state", "reject_reason"
      )
    RegisterResult(accepted, rejects)
  }

  final case class ModelRasterResult(accepted: DataFrame, rejects: DataFrame)

  /** Batch-first re-expression of the reference's one-raster
    * `insertACModelRaster` (`R/insertACModelRaster.R:1-237` in
    * YukonWRB/AquaCache): metadata reference-row insertion for model
    * rasters, with the reference's gates —
    *
    *   - timestamp coercion (`:32-95`): a 10-char date-only string is
    *     midnight UTC; date-only `valid_to`/`issued` extend to
    *     end-of-day (+23.9999 h = the reference's exact 86399.64 s);
    *     an uncoercible value rejects the row (the reference stops);
    *     `issued` may be absent (NA allowed);
    *   - units (`:97-111`): absent -> empty per-band defaults joined
    *     ", "; one element applies as-is; several elements must match
    *     the band count exactly or the row rejects;
    *   - the series must resolve to EXACTLY ONE
    *     `raster_series_index` row (`:130-147`) — unknown or
    *     ambiguous series reject; `parameter_id` / `media_id` /
    *     `matrix_state_id` inherit from the index row, `model`
    *     falls back to it when the insert leaves it null;
    *   - `band_names` is stored in the reference's "{{b1},{b2}}"
    *     literal shape (`:149-152`);
    *   - reference ids assign above max(existing) via the
    *     distributed rank ([[graft.operators.SeqIds]]).
    *
    * @param incoming    src_key, raster_series_id,
    *                    band_names ARRAY<STRING>, units ARRAY<STRING>
    *                    (nullable), valid_from_raw / valid_to_raw /
    *                    issued_raw STRING, model, source, description,
    *                    flag (all nullable strings)
    * @param seriesIndex raster_series_id, parameter_id, media_id,
    *                    matrix_state_id, model
    * @param existing    reference_id (the stored reference rows)
    */
  def insertModelRasters(
      incoming: DataFrame,
      seriesIndex: DataFrame,
      existing: DataFrame
  ): ModelRasterResult = {
    val EndOfDayMicros = 86399640000L // 60*60*23.9999 s, as the reference
    def coerce(raw: Column, endOfDay: Boolean): Column = {
      val dateOnly = length(raw) === 10
      val asDate = try_to_timestamp(raw, lit("yyyy-MM-dd"))
      val full = try_to_timestamp(raw)
      val base = when(dateOnly, asDate).otherwise(full)
      if (!endOfDay) base
      else when(dateOnly, timestamp_micros(unix_micros(asDate) + EndOfDayMicros)).otherwise(full)
    }
    val idx = broadcast(
      seriesIndex
        .groupBy(col("raster_series_id"))
        .agg(
          count(lit(1)).as("__idx_n"),
          first(col("parameter_id")).as("parameter_id"),
          first(col("media_id")).as("media_id"),
          first(col("matrix_state_id")).as("matrix_state_id"),
          first(col("model")).as("__idx_model")
        )
    )
    val coerced = incoming
      .join(idx, Seq("raster_series_id"), "left")
      .withColumn("__from", coerce(col("valid_from_raw"), endOfDay = false))
      .withColumn("__to", coerce(col("valid_to_raw"), endOfDay = true))
      .withColumn("__issued", coerce(col("issued_raw"), endOfDay = true))
      .withColumn("__n_bands", size(col("band_names")))
      .withColumn(
        "reject_reason",
        when(col("band_names").isNull || col("__n_bands") < 1, "missing_bands")
          .when(col("__from").isNull, "bad_valid_from")
          .when(col("__to").isNull, "bad_valid_to")
          .when(col("issued_raw").isNotNull && col("__issued").isNull, "bad_issued")
          .when(
            col("units").isNotNull && size(col("units")) > 1 &&
              size(col("units")) =!= col("__n_bands"),
            "units_band_mismatch"
          )
          .when(col("__idx_n").isNull, "unknown_series")
          .when(col("__idx_n") > 1, "ambiguous_series")
      )
    val rejects = coerced
      .filter(col("reject_reason").isNotNull)
      .select(col("src_key"), col("reject_reason"))
    val accepted = graft.operators.SeqIds
      .assignIdsAbove(
        existing,
        "reference_id",
        coerced.filter(col("reject_reason").isNull),
        Seq(col("src_key")),
        "reference_id"
      )
      .withColumn(
        "band_names_str",
        concat(lit("{{"), array_join(col("band_names"), "},{"), lit("}}"))
      )
      .withColumn(
        "units_str",
        when(col("units").isNull, array_join(transform(col("band_names"), _ => lit("")), ", "))
          .otherwise(array_join(col("units"), ", "))
      )
      .withColumn("model", coalesce(col("model"), col("__idx_model")))
      .select(
        col("src_key"),
        col("reference_id"),
        col("raster_series_id"),
        col("band_names_str"),
        col("units_str"),
        col("__from").as("valid_from"),
        col("__to").as("valid_to"),
        col("__issued").as("issued"),
        col("model"),
        col("parameter_id"),
        col("media_id"),
        col("matrix_state_id")
      )
    ModelRasterResult(accepted, rejects)
  }

  final case class RasterInsertResult(accepted: DataFrame, rejects: DataFrame)

  /** The MANUAL (non-model) raster intake — `R/insertACRaster.R:28-120`
    * plus the bit-depth vocabulary of `R/writeRaster.R:311-321` in
    * YukonWRB/AquaCache:
    *
    *   - units gate (`insertACRaster.R:54-69`): provided units must
    *     have exactly one element or one per band, else the call stops
    *     — here the row rejects (`units_band_mismatch`), sharing the
    *     model path's semantics; absent units fall back to per-band
    *     metadata (empty strings), joined ", ";
    *   - bit depth (`insertACRaster.R:16`, `writeRaster.R:313-321`):
    *     `32BF`/`32BUI`/`32BSI` (case-insensitive) map to terra
    *     datatypes `FLT4S`/`INT4U`/`INT4S`; anything else aborts in
    *     the reference (`cli_abort`) — rejects here
    *     (`unsupported_bit_depth`);
    *   - bit depth NULL -> "parse the data to determine which 32-bit
    *     flavor": any fractional value -> 32BF, integral with
    *     negatives -> 32BSI, else 32BUI. The reference parses the
    *     in-memory terra object; here the raster may be billions of
    *     cells, so the parse is ONE distributed aggregate over the
    *     cell frame, never a driver scan;
    *   - a raster that serialises to nothing fails the write in the
    *     reference (`writeRaster.R:333-336`) — a src_key with zero
    *     cells rejects (`empty_raster`);
    *   - the `'other'` raster type must resolve
    *     (`insertACRaster.R:80-88`) or the reference stops — rows
    *     reject (`missing_other_type`) when the dimension lacks it;
    *   - band_names stored in the `{{b1},{b2}}` literal shape, units
    *     joined ", ", reference ids above max(existing) via
    *     [[graft.operators.SeqIds.assignIdsAbove]] — all exactly as
    *     the model path.
    *
    * @param incoming    src_key, band_names ARRAY<STRING> (nullable),
    *                    units ARRAY<STRING> (nullable), description,
    *                    flag, source, bit_depth (all nullable strings)
    * @param cells       the decoded raster: src_key, band, x, y,
    *                    value DOUBLE (the [[graft.operators.Raster]]
    *                    cell shape keyed by src_key)
    * @param rasterTypes raster_type_id, raster_type_name
    * @param existing    reference_id (stored reference rows)
    */
  def insertRasters(
      incoming: DataFrame,
      cells: DataFrame,
      rasterTypes: DataFrame,
      existing: DataFrame
  ): RasterInsertResult = {
    val stats = cells
      .groupBy(col("src_key"))
      .agg(
        count(lit(1)).as("__n_cells"),
        min(col("value")).as("__min_v"),
        max(
          when(col("value").isNotNull && col("value") =!= floor(col("value")), 1).otherwise(0)
        ).as("__has_frac")
      )
    // one-row dimension: NULL id when the types table lacks 'other'
    val otherType = broadcast(
      rasterTypes
        .filter(lower(trim(col("raster_type_name"))) === "other")
        .agg(max(col("raster_type_id")).as("__other_type_id"))
    )
    val gated = incoming
      .join(broadcast(stats), Seq("src_key"), "left")
      .crossJoin(otherType)
      .withColumn("__n_bands", size(col("band_names")))
      .withColumn("__bd_up", upper(trim(col("bit_depth"))))
      .withColumn(
        "reject_reason",
        when(col("band_names").isNull || col("__n_bands") < 1, "missing_bands")
          .when(
            col("units").isNotNull && size(col("units")) > 1 &&
              size(col("units")) =!= col("__n_bands"),
            "units_band_mismatch"
          )
          .when(
            col("bit_depth").isNotNull && !col("__bd_up").isin("32BF", "32BUI", "32BSI"),
            "unsupported_bit_depth"
          )
          .when(col("__n_cells").isNull || col("__n_cells") === 0, "empty_raster")
          .when(col("__other_type_id").isNull, "missing_other_type")
      )
    val rejects = gated
      .filter(col("reject_reason").isNotNull)
      .select(col("src_key"), col("reject_reason"))
    val accepted = graft.operators.SeqIds
      .assignIdsAbove(
        existing,
        "reference_id",
        gated.filter(col("reject_reason").isNull),
        Seq(col("src_key")),
        "reference_id"
      )
      .withColumn(
        "bit_depth",
        coalesce(
          col("__bd_up"),
          when(col("__has_frac") === 1, "32BF")
            .when(col("__min_v") < 0, "32BSI")
            .otherwise("32BUI")
        )
      )
      .withColumn(
        "terra_datatype",
        when(col("bit_depth") === "32BF", "FLT4S")
          .when(col("bit_depth") === "32BUI", "INT4U")
          .otherwise("INT4S")
      )
      .withColumn(
        "band_names_str",
        concat(lit("{{"), array_join(col("band_names"), "},{"), lit("}}"))
      )
      .withColumn(
        "units_str",
        when(col("units").isNull, array_join(transform(col("band_names"), _ => lit("")), ", "))
          .otherwise(array_join(col("units"), ", "))
      )
      .select(
        col("src_key"),
        col("reference_id"),
        col("__other_type_id").as("raster_type_id"),
        col("band_names_str"),
        col("units_str"),
        col("bit_depth"),
        col("terra_datatype"),
        col("description"),
        col("flag"),
        col("source")
      )
    RasterInsertResult(accepted, rejects)
  }

  /** File/URL intake wrapper — `insertACRaster(raster = <path|URL>)`
    * (`R/insertACRaster.R:50-52` routes a character argument through
    * `terra::rast` before the gates). The engine's raster exchange
    * format is a parquet cell frame (src_key, band, x, y, value); live
    * HTTP URL fetch stays behind the Transport seam like every other
    * remote source. When the caller supplies no band_names they derive
    * from the cells (the reference takes `names(raster)` directly from
    * the loaded object). Accepted rasters' cells are tiled
    * ([[graft.operators.Raster.tileGrid]]) keyed by the minted
    * reference_id and written through
    * [[graft.operators.Raster.writeTiles]] when `tilesOut` is given —
    * the reference's raster2pgsql append, re-expressed as the tile
    * writer sink.
    */
  def insertRasterFromFile(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      meta: DataFrame,
      rasterTypes: DataFrame,
      existing: DataFrame,
      tilesOut: Option[String] = None,
      tileW: Int = 64,
      tileH: Int = 64
  ): RasterInsertResult = {
    val cellsRaw = spark.read.parquet(path)
    // sort bands NUMERICALLY before stringifying — lexicographic order
    // would give '1','10','2',… at >=10 bands and misalign the
    // positional band_names/units pairing downstream
    val derived = cellsRaw
      .groupBy(col("src_key"))
      .agg(
        transform(array_sort(collect_set(col("band"))), b => b.cast("string"))
          .as("__derived_bands")
      )
    val incoming = meta
      .join(broadcast(derived), Seq("src_key"), "left")
      .withColumn("band_names", coalesce(col("band_names"), col("__derived_bands")))
      .drop("__derived_bands")
    val res = insertRasters(incoming, cellsRaw, rasterTypes, existing)
    tilesOut.foreach { out =>
      val keyed = cellsRaw
        .join(broadcast(res.accepted.select(col("src_key"), col("reference_id"))), Seq("src_key"))
        .select(
          col("reference_id").as("series_id"),
          col("band"),
          lit(null).cast("timestamp").as("issue_ts"),
          lit(null).cast("timestamp").as("valid_ts"),
          col("x"),
          col("y"),
          col("value")
        )
      graft.operators.Raster.writeTiles(graft.operators.Raster.tileGrid(keyed, tileW, tileH), out)
    }
    res
  }
}
