package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Boreholes
import graft.tables.TestTables

/** Administrative CRUD surface — the reference's manual-entry gates
  * (`R/insertACBorehole.R`, `R/addACOrg.R`, `R/updateACDocument.R`,
  * `R/db_dump.R`, `R/load_nhn.R`): borehole/well inserts with child
  * tables, small upsert gates, staged vector-layer bulk import and
  * table snapshots. Fixtures derive deterministically from the TPC-H
  * tables (suppliers stand in for borehole candidates, nations for
  * known locations) so every gate fires on some rows and the DuckDB
  * oracle replays the identical arithmetic.
  */
object AdminQueries {

  // ---- timeseries catalog registration gates -----------------------

  /** Every `addACTimeseries.R` gate fired from one nation-derived
    * batch: missing/unknown location (case-insensitive existence
    * probe), missing start, missing/unknown parameter, unknown media,
    * unregistered source_fx (NULL stays allowed), empty/NULL
    * share_with, and the case-normalized duplicate-series probe. The
    * Spark side derives every status through
    * [[graft.operators.CatalogOps.validateNewTimeseries]]'s real
    * broadcast-join machinery; the oracle states the expected
    * decision table.
    */
  private def catalogGates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.operators.CatalogOps
    val n = TestTables.nation(s, d).select(col("n_nationkey").cast("long").as("n"))
    val incoming = n.select(
      when(col("n") === 1, lit(null).cast("string"))
        .when(col("n") === 2, lit("ghost town"))
        .otherwise(concat(lit("Loc"), col("n").cast("string")))
        .as("location"),
      when(col("n") === 4, lit(null).cast("long"))
        .when(col("n") === 5, lit(999L))
        .otherwise(lit(100L) + col("n") % 3)
        .as("parameter_id"),
      when(col("n") === 6, lit(99L)).otherwise(lit(1L) + col("n") % 2).as("media_id"),
      lit("mean").as("aggregation_type"),
      lit("1h").as("record_rate"),
      when(col("n") === 0, lit(null).cast("timestamp"))
        .otherwise(timestamp_seconds(lit(1704067200L) + col("n") * 3600))
        .as("start_datetime"),
      when(col("n") === 7, lit("pullFromFtp"))
        .when(col("n") === 8, lit(null).cast("string"))
        .otherwise(lit("downloadWSC"))
        .as("source_fx"),
      when(col("n") === 9, array().cast("array<string>"))
        .when(col("n") === 10, lit(null).cast("array<string>"))
        .otherwise(array(lit("public_reader")))
        .as("share_with")
    )
    val locations = n.select(concat(lit("loc"), col("n").cast("string")).as("location"))
    val parameters = Seq(100L, 101L, 102L).toDF("parameter_id")
    val media = Seq(1L, 2L).toDF("media_id")
    // existing rows hit n=11 (case flipped — the probe must normalize)
    // and n=12 (exact case)
    val existing = Seq(
      ("LOC11", 100L + 11 % 3, 1L + 11 % 2, "mean", "1h"),
      ("Loc12", 100L + 12 % 3, 1L + 12 % 2, "mean", "1h")
    ).toDF("location", "parameter_id", "media_id", "aggregation_type", "record_rate")
    val imp = CatalogOps.validateNewTimeseries(
      incoming, locations, parameters, media,
      adapterNames = Seq("downloadWSC", "downloadNWIS"), existing = existing
    )
    imp.rejects
      .select(col("location"), col("parameter_id"), col("reject_reason").as("status"))
      .unionByName(
        imp.accepted
          .select(col("location"), col("parameter_id"), lit("accepted").as("status"))
      )
      .orderBy(col("status"), col("location").asc_nulls_last, col("parameter_id").asc_nulls_last)
  }

  private val catalogGatesSql =
    """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS n FROM nation),
      |inc AS (
      |  SELECT n,
      |         CASE WHEN n = 1 THEN NULL
      |              WHEN n = 2 THEN 'ghost town'
      |              ELSE 'Loc' || CAST(n AS VARCHAR) END AS location,
      |         CASE WHEN n = 4 THEN NULL
      |              WHEN n = 5 THEN 999
      |              ELSE 100 + n % 3 END AS parameter_id,
      |         CASE WHEN n = 0 THEN 'missing_start_datetime'
      |              WHEN n = 1 THEN 'missing_location'
      |              WHEN n = 2 THEN 'unknown_location'
      |              WHEN n = 4 THEN 'missing_parameter'
      |              WHEN n = 5 THEN 'unknown_parameter'
      |              WHEN n = 6 THEN 'unknown_media'
      |              WHEN n = 7 THEN 'unknown_source_fx'
      |              WHEN n IN (9, 10) THEN 'missing_share_with'
      |              WHEN n IN (11, 12) THEN 'duplicate_timeseries'
      |              ELSE 'accepted' END AS status
      |  FROM n
      |)
      |SELECT location, CAST(parameter_id AS BIGINT) AS parameter_id, status
      |FROM inc
      |ORDER BY status, location ASC NULLS LAST, parameter_id ASC NULLS LAST""".stripMargin

  // ---- borehole / well insert gates --------------------------------

  /** Batch borehole import over supplier-derived candidates: every
    * validation gate of `insertACBorehole` fires somewhere in the
    * batch (missing name, out-of-range latitude, unknown
    * location/purpose, permafrost interval rules, bedrock-depth
    * consistency, empty share_with, duplicate probe), and accepted
    * rows fan out to permafrost / well / document-link child rows.
    */
  private def borehole(s: SparkSession, d: String): DataFrame = {
    val sup = TestTables.supplier(s, d)
    val k = col("s_suppkey")
    val incoming = sup.select(
      k.as("src_key"),
      when(k % 17 === 0, lit(null)).otherwise(concat(lit("BH-"), col("s_name"))).as("borehole_name"),
      ((k * 13) % 200 - 95 + lit(0.25)).as("latitude"),
      ((k * 29) % 340 - 160 + lit(0.5)).as("longitude"),
      when(k % 4 === 0, k % 30).as("location_id"),
      when(k % 3 === 0, k % 8).as("purpose_id"),
      when(k % 3 === 0, k % 8).as("well_purpose_id"),
      (k % 5 === 0).as("permafrost_present"),
      when(k % 10 === 0, lit(null)).otherwise((k % 7).cast("double")).as("permafrost_top_m"),
      ((k % 7).cast("double") + when(k % 15 === 0, -1.0).otherwise(2.0)).as("permafrost_bot_m"),
      when(k % 3 === 0, lit(true)).when(k % 3 === 1, lit(false)).as("bedrock_reached"),
      when(k % 2 === 0, (k % 50).cast("double")).as("depth_to_bedrock_m"),
      (k % 2 === 0).as("is_well"),
      (lit(100) + k % 50).cast("double").as("casing_diameter_mm"),
      (k % 20).cast("double").as("screen_top_depth_m"),
      (k % 20 + 3).cast("double").as("screen_bottom_depth_m"),
      when(k % 23 === 0, array().cast("array<string>"))
        .otherwise(array(lit("public_reader"))).as("share_with"),
      when(k % 6 === 0, k + 1000).as("document_id")
    )
    val locations = TestTables.nation(s, d).select(col("n_nationkey").cast("long").as("location_id"))
    val purposes = s.range(0, 6).select(col("id").as("purpose_id"))
    // pre-existing boreholes: the first five suppliers, same natural key
    val existing = sup
      .filter(k < 5)
      .select(
        (k + 1).as("borehole_id"),
        concat(lit("BH-"), col("s_name")).as("borehole_name"),
        ((k * 13) % 200 - 95 + lit(0.25)).as("latitude"),
        ((k * 29) % 340 - 160 + lit(0.5)).as("longitude")
      )
    val imp = Boreholes.validate(incoming, locations, purposes, existing)
    val np = imp.permafrost.groupBy("borehole_id").agg(count(lit(1)).cast("int").as("n_permafrost"))
    val nw = imp.wells.groupBy("borehole_id").agg(count(lit(1)).cast("int").as("n_well"))
    val nd = imp.docLinks
      .groupBy("borehole_id")
      .agg(count(lit(1)).cast("int").as("n_doc"), min(col("document_type")).as("document_type"))
    val acceptedOut = imp.accepted
      .join(np, Seq("borehole_id"), "left")
      .join(nw, Seq("borehole_id"), "left")
      .join(nd, Seq("borehole_id"), "left")
      .select(
        col("src_key"),
        col("borehole_name"),
        lit("accepted").as("status"),
        col("borehole_id"),
        coalesce(col("n_permafrost"), lit(0)).as("n_permafrost"),
        coalesce(col("n_well"), lit(0)).as("n_well"),
        coalesce(col("n_doc"), lit(0)).as("n_doc"),
        col("document_type")
      )
    val rejectsOut = imp.rejects.select(
      col("src_key"),
      col("borehole_name"),
      col("reject_reason").as("status"),
      lit(null).cast("long").as("borehole_id"),
      lit(0).as("n_permafrost"),
      lit(0).as("n_well"),
      lit(0).as("n_doc"),
      lit(null).cast("string").as("document_type")
    )
    acceptedOut.unionByName(rejectsOut).orderBy(col("src_key"))
  }

  private val boreholeSql =
    """WITH inc AS (
      |  SELECT s_suppkey AS src_key,
      |         CASE WHEN s_suppkey % 17 = 0 THEN NULL ELSE 'BH-' || s_name END AS borehole_name,
      |         ((s_suppkey * 13) % 200 - 95 + 0.25) AS latitude,
      |         ((s_suppkey * 29) % 340 - 160 + 0.5) AS longitude,
      |         CASE WHEN s_suppkey % 4 = 0 THEN s_suppkey % 30 END AS location_id,
      |         CASE WHEN s_suppkey % 3 = 0 THEN s_suppkey % 8 END AS purpose_id,
      |         s_suppkey % 5 = 0 AS permafrost_present,
      |         CASE WHEN s_suppkey % 10 = 0 THEN NULL ELSE CAST(s_suppkey % 7 AS DOUBLE) END AS permafrost_top_m,
      |         CAST(s_suppkey % 7 AS DOUBLE) + CASE WHEN s_suppkey % 15 = 0 THEN -1.0 ELSE 2.0 END AS permafrost_bot_m,
      |         CASE WHEN s_suppkey % 3 = 0 THEN TRUE WHEN s_suppkey % 3 = 1 THEN FALSE END AS bedrock_reached,
      |         CASE WHEN s_suppkey % 2 = 0 THEN CAST(s_suppkey % 50 AS DOUBLE) END AS depth_to_bedrock_m,
      |         s_suppkey % 2 = 0 AS is_well,
      |         s_suppkey % 23 = 0 AS empty_share,
      |         CASE WHEN s_suppkey % 6 = 0 THEN s_suppkey + 1000 END AS document_id
      |  FROM supplier
      |), gated AS (
      |  SELECT *,
      |         CASE
      |           WHEN borehole_name IS NULL OR trim(borehole_name) = '' THEN 'missing_name'
      |           WHEN latitude IS NULL OR abs(latitude) > 90.0 THEN 'bad_latitude'
      |           WHEN longitude IS NULL OR abs(longitude) > 180.0 THEN 'bad_longitude'
      |           WHEN location_id IS NOT NULL AND location_id NOT IN (SELECT n_nationkey FROM nation) THEN 'unknown_location'
      |           WHEN purpose_id IS NOT NULL AND purpose_id NOT IN (0, 1, 2, 3, 4, 5) THEN 'unknown_purpose'
      |           WHEN is_well AND purpose_id IS NOT NULL AND purpose_id NOT IN (0, 1, 2, 3, 4, 5) THEN 'unknown_well_purpose'
      |           WHEN permafrost_present AND (permafrost_top_m IS NULL OR permafrost_bot_m IS NULL) THEN 'missing_permafrost_depths'
      |           WHEN permafrost_present AND permafrost_bot_m <= permafrost_top_m THEN 'bad_permafrost_interval'
      |           WHEN bedrock_reached = TRUE AND depth_to_bedrock_m IS NULL THEN 'missing_depth_to_bedrock'
      |           WHEN bedrock_reached = FALSE AND depth_to_bedrock_m IS NOT NULL THEN 'unexpected_depth_to_bedrock'
      |           WHEN depth_to_bedrock_m < 0 THEN 'negative_depth_to_bedrock'
      |           WHEN empty_share THEN 'missing_share_with'
      |           WHEN src_key < 5 THEN 'duplicate_borehole'
      |         END AS reject_reason
      |  FROM inc
      |), ids AS (
      |  SELECT *,
      |         CASE WHEN reject_reason IS NULL
      |              THEN 5 + row_number() OVER (
      |                     PARTITION BY (reject_reason IS NULL)
      |                     ORDER BY lower(borehole_name), latitude, longitude)
      |         END AS borehole_id
      |  FROM gated
      |)
      |SELECT src_key, borehole_name,
      |       coalesce(reject_reason, 'accepted') AS status,
      |       borehole_id,
      |       CAST(CASE WHEN reject_reason IS NULL AND permafrost_present THEN 1 ELSE 0 END AS INT) AS n_permafrost,
      |       CAST(CASE WHEN reject_reason IS NULL AND is_well THEN 1 ELSE 0 END AS INT) AS n_well,
      |       CAST(CASE WHEN reject_reason IS NULL AND document_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS n_doc,
      |       CASE WHEN reject_reason IS NULL AND document_id IS NOT NULL
      |            THEN CASE WHEN is_well THEN 'well log' ELSE 'borehole log' END
      |       END AS document_type
      |FROM ids
      |ORDER BY src_key""".stripMargin

  // ---- NHN basin/vector-layer bulk loader --------------------------

  /** Staged NHN import over nation-derived fixture layers: region
    * clip ('01'..'06'), bounding-box envelope filter, per-layer
    * feature naming (basins key on dataset_name, others on
    * dataset_name + nid), validity gate (one planted open ring),
    * overwrite of one pre-existing basin, and location-code prefix
    * generation from the accepted basin polygons (the
    * `generateACLocationCode` feed).
    */
  private def basinLoad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = col("n_nationkey")
    val x0 = (k % 12) * 10 - 60
    val y0 = (k % 8) * 10 - 40
    // valid closed square, except k % 11 == 7 drops the closing vertex
    def pt(x: Column, y: Column) = concat(x, lit(" "), y)
    val closing = when(k % 11 === 7, lit("")).otherwise(concat(lit(", "), pt(x0, y0)))
    val wkt = concat(
      lit("POLYGON (("),
      pt(x0, y0), lit(", "),
      pt(x0 + 4, y0), lit(", "),
      pt(x0 + 4, y0 + 4), lit(", "),
      pt(x0, y0 + 4),
      closing,
      lit("))")
    )
    val features = TestTables.nation(s, d).select(
      element_at(
        array(graft.sources.NhnLoader.ValidTargets.map(lit): _*),
        (k % 8 + 1).cast("int")
      ).as("target"),
      concat(lpad((k * 7) % 11 + 1, 2, "0"), lit("-"), col("n_name")).as("dataset_name"),
      concat(lit("N"), k.cast("string")).as("nid"),
      (k % 3 + 1).cast("string").as("edition"),
      (k % 4).cast("string").as("version"),
      wkt.as("wkt")
    )
    val existing = Seq(
      ("National Hydro Network - Basins", "01-NATION_0", "POLYGON")
    ).toDF("layer_name", "feature_name", "geom_type")
    val load = graft.sources.NhnLoader.stage(
      features,
      clip = Some(Seq("01", "02", "03", "04", "05", "06")),
      bbox = Some((-65.0, 20.0, -45.0, 45.0)),
      existing = existing,
      overwrite = true
    )
    val codes = load.accepted
      .filter(col("target") === "basins")
      .withColumn(
        "basin_code",
        concat(
          substring(col("feature_name"), 1, 2),
          lit("-"),
          lpad(
            row_number().over(
              Window.partitionBy(substring(col("feature_name"), 1, 2)).orderBy(col("feature_name"))
            ),
            3,
            "0"
          )
        )
      )
      .select(col("feature_name"), col("basin_code"))
    val acceptedOut = load.accepted
      .join(codes, Seq("feature_name"), "left")
      .select(
        col("feature_name"),
        col("layer_name"),
        col("action").as("status"),
        col("geom_type"),
        col("basin_code")
      )
    val rejectsOut = load.rejects.select(
      col("feature_name"),
      col("layer_name"),
      col("reject_reason").as("status"),
      lit(null).cast("string").as("geom_type"),
      lit(null).cast("string").as("basin_code")
    )
    acceptedOut.unionByName(rejectsOut).orderBy(col("feature_name"))
  }

  private val basinLoadSql =
    """WITH f AS (
      |  SELECT n_nationkey AS k, n_name,
      |         ['basins','junctions','flowpaths','littoral','banks',
      |          'watercourses','waterbodies','islands'][(n_nationkey % 8) + 1] AS target,
      |         lpad(CAST((n_nationkey * 7) % 11 + 1 AS VARCHAR), 2, '0') || '-' || n_name AS dataset_name,
      |         'N' || CAST(n_nationkey AS VARCHAR) AS nid,
      |         (n_nationkey % 12) * 10 - 60 AS x0,
      |         (n_nationkey % 8) * 10 - 40 AS y0
      |  FROM nation
      |), staged AS (
      |  SELECT *,
      |         CASE target
      |           WHEN 'basins' THEN 'National Hydro Network - Basins'
      |           WHEN 'junctions' THEN 'National Hydro Network - Hydro Junctions'
      |           WHEN 'flowpaths' THEN 'National Hydro Network - Flowpaths'
      |           WHEN 'littoral' THEN 'National Hydro Network - Littoral'
      |           WHEN 'banks' THEN 'National Hydro Network - Banks'
      |           WHEN 'watercourses' THEN 'National Hydro Network - Watercourses'
      |           WHEN 'waterbodies' THEN 'National Hydro Network - Waterbodies'
      |           WHEN 'islands' THEN 'National Hydro Network - Islands'
      |         END AS layer_name,
      |         CASE WHEN target = 'basins' THEN dataset_name
      |              ELSE dataset_name || '_' || nid END AS feature_name,
      |         k % 11 = 7 AS open_ring
      |  FROM f
      |  WHERE substr(dataset_name, 1, 2) IN ('01', '02', '03', '04', '05', '06')
      |    AND x0 <= 20 AND x0 + 4 >= -65 AND y0 <= 45 AND y0 + 4 >= -45
      |), gated AS (
      |  SELECT *,
      |         CASE WHEN open_ring THEN 'open_ring'
      |              WHEN target = 'basins' AND feature_name = '01-NATION_0' THEN 'replaced'
      |              ELSE 'inserted' END AS status
      |  FROM staged
      |), codes AS (
      |  SELECT feature_name,
      |         substr(dataset_name, 1, 2) || '-' ||
      |           lpad(CAST(row_number() OVER (
      |             PARTITION BY substr(dataset_name, 1, 2) ORDER BY feature_name) AS VARCHAR), 3, '0') AS basin_code
      |  FROM gated WHERE target = 'basins' AND status IN ('inserted', 'replaced')
      |)
      |SELECT g.feature_name, g.layer_name, g.status,
      |       CASE WHEN g.status <> 'open_ring' THEN 'POLYGON' END AS geom_type,
      |       c.basin_code
      |FROM gated g LEFT JOIN codes c USING (feature_name)
      |ORDER BY g.feature_name""".stripMargin

  // ---- document update gates ---------------------------------------

  /** Batch document updates over the documents table: every
    * `updateACDocument` gate fires somewhere (unknown id, too-short
    * description, unknown type label, rename collision with another
    * stored doc, no resolvable geom ids), accepted rows coalesce
    * new-over-old fields, and geom associations replace the old set
    * (two of three requested geoms resolve, mirroring the reference's
    * partial-association warning path).
    */
  private def docUpdate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = TestTables.documents(s, d).select(
      col("doc_id").as("document_id"),
      concat(lit("doc_"), col("doc_id")).as("name"),
      (col("doc_id") % 4).as("type_id"),
      col("source").as("description"),
      lit(null).cast("string").as("url")
    )
    val types = Seq(
      (0L, "report"), (1L, "thesis"), (2L, "map"), (3L, "well log"), (4L, "graph")
    ).toDF("document_type_id", "document_type_en")
    val vectors = TestTables.nation(s, d).select(col("n_nationkey").cast("long").as("geom_id"))
    val existingLinks = TestTables.documents(s, d)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("document_id"), (col("doc_id") % 25).as("geom_id"))
    val k = col("doc_id")
    val updates = TestTables.documents(s, d)
      .filter(k % 3 === 0)
      .select(
        when(k % 30 === 0, k + 1000000).otherwise(k).as("document_id"),
        when(k % 21 === 0, concat(lit("doc_"), (k - 3)))
          .otherwise(concat(lit("renamed_"), k)).as("new_name"),
        when(k % 9 === 0, lit("memo")).otherwise(lit("Report")).as("new_type"),
        when(k % 15 === 0, lit("tiny")).as("new_description"),
        when(k % 6 === 0, concat(lit("https://example.org/"), k)).as("new_url"),
        when(k % 12 === 0, array(lit(90L), lit(91L)))
          .otherwise(array(k % 25, (k + 7) % 25, k % 25 + 30)).as("new_geoms")
      )
    val upd = graft.operators.AdminOps.updateDocuments(updates, docs, types, vectors, existingLinks)
    val counts = upd.geomLinks
      .groupBy(col("document_id"))
      .agg(count(lit(1)).cast("int").as("__n_links"))
    val acceptedOut = upd.updated
      .join(counts, Seq("document_id"), "left")
      .select(
        col("document_id"),
        lit("updated").as("status"),
        col("name"),
        col("type_id"),
        col("description"),
        col("url"),
        coalesce(col("__n_links"), lit(0)).as("n_geom_links")
      )
    val rejectsOut = upd.rejects.select(
      col("document_id"),
      col("reject_reason").as("status"),
      lit(null).cast("string").as("name"),
      lit(null).cast("long").as("type_id"),
      lit(null).cast("string").as("description"),
      lit(null).cast("string").as("url"),
      lit(0).as("n_geom_links")
    )
    acceptedOut.unionByName(rejectsOut).orderBy(col("document_id"))
  }

  private val docUpdateSql =
    """WITH docs AS (
      |  SELECT doc_id AS document_id, 'doc_' || CAST(doc_id AS VARCHAR) AS name,
      |         doc_id % 4 AS type_id, source AS description
      |  FROM documents
      |), upd AS (
      |  SELECT CASE WHEN doc_id % 30 = 0 THEN doc_id + 1000000 ELSE doc_id END AS document_id,
      |         CASE WHEN doc_id % 21 = 0 THEN 'doc_' || CAST(doc_id - 3 AS VARCHAR)
      |              ELSE 'renamed_' || CAST(doc_id AS VARCHAR) END AS new_name,
      |         CASE WHEN doc_id % 9 = 0 THEN 'memo' ELSE 'Report' END AS new_type,
      |         CASE WHEN doc_id % 15 = 0 THEN 'tiny' END AS new_description,
      |         CASE WHEN doc_id % 6 = 0 THEN 'https://example.org/' || CAST(doc_id AS VARCHAR) END AS new_url,
      |         doc_id % 12 = 0 AS bad_geoms
      |  FROM documents WHERE doc_id % 3 = 0
      |), gated AS (
      |  SELECT u.*, d.name AS old_name, d.type_id AS old_type_id,
      |         d.description AS old_description,
      |         CASE
      |           WHEN d.document_id IS NULL THEN 'unknown_document'
      |           WHEN u.new_description IS NOT NULL AND length(u.new_description) < 5 THEN 'short_description'
      |           WHEN lower(u.new_type) NOT IN ('report', 'thesis', 'map', 'well log', 'graph') THEN 'unknown_type'
      |           WHEN h.document_id IS NOT NULL AND h.document_id <> u.document_id THEN 'duplicate_name'
      |           WHEN u.bad_geoms THEN 'no_valid_geoms'
      |         END AS reject_reason
      |  FROM upd u
      |  LEFT JOIN docs d USING (document_id)
      |  LEFT JOIN docs h ON h.name = u.new_name
      |)
      |SELECT document_id,
      |       coalesce(reject_reason, 'updated') AS status,
      |       CASE WHEN reject_reason IS NULL THEN coalesce(new_name, old_name) END AS name,
      |       CAST(CASE WHEN reject_reason IS NULL THEN 0 END AS BIGINT) AS type_id,
      |       CASE WHEN reject_reason IS NULL THEN coalesce(new_description, old_description) END AS description,
      |       CASE WHEN reject_reason IS NULL THEN new_url END AS url,
      |       CAST(CASE WHEN reject_reason IS NULL THEN 2 ELSE 0 END AS INT) AS n_geom_links
      |FROM gated
      |ORDER BY document_id""".stripMargin

  // ---- discrete sample/results insertion gates ---------------------

  /** addNewDiscrete over an orders-derived fixture batch
    * ([[graft.jobs.AddDiscrete]]): every ~97th order becomes one
    * sample with three results; the modular classes plant every
    * sample gate (missing location/datetime/media) and result gate
    * (unknown parameter, null result, censored-without-limit, missing
    * fraction/speciation), matrix states default from the sample's
    * media, and ids assign above max(existing)=1000.
    */
  private def addDiscrete(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = col("o_orderkey")
    val base = TestTables.orders(s, d).filter(k % 97 === 0)
    val samples = base.select(
      k.as("sample_key"),
      when(k % 7 === 0, lit(null)).otherwise(k % 50).as("location_id"),
      when(k % 11 === 0, lit(null).cast("timestamp"))
        .otherwise(col("o_orderdate").cast("timestamp"))
        .as("datetime"),
      when(k % 13 === 0, lit(null)).otherwise(k % 3 + 1).as("media_id")
    )
    val results = base
      .select(k.as("sample_key"), explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
      .select(
        col("sample_key"),
        col("r"),
        ((col("sample_key") / 97).cast("long") + col("r")) % 6 as "parameter_id",
        when((col("sample_key") + col("r")) % 17 === 0, lit(null).cast("double"))
          .otherwise((col("sample_key") % 100 + col("r")).cast("double"))
          .as("result"),
        lit(1L).as("result_type_id"),
        when((col("sample_key") + col("r")) % 17 === 0 && col("r") % 2 === 1, lit(1L))
          .as("result_condition_id"),
        when(
          (col("sample_key") + col("r")) % 17 === 0 && col("r") % 2 === 1 &&
            (col("sample_key") + col("r")) % 34 =!= 0,
          lit(0.005)
        ).as("result_condition_value"),
        when((col("sample_key") + col("r")) % 23 === 0, lit(null)).otherwise(lit(19L))
          .as("sample_fraction_id"),
        when((col("sample_key") + col("r")) % 29 === 0, lit(null)).otherwise(lit(3L))
          .as("result_speciation_id"),
        when((col("sample_key") + col("r")) % 31 === 0, lit(null)).otherwise(lit(7L))
          .as("matrix_state_id")
      )
    val parameters = Seq(
      (1L, false, false),
      (2L, true, false),
      (3L, false, true),
      (4L, false, false)
    ).toDF("parameter_id", "needs_fraction", "needs_speciation")
    val mediaDefaults = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("media_id", "default_matrix_state_id")
    val existing = Seq(Tuple1(1000L)).toDF("sample_id")

    val out = graft.jobs.AddDiscrete.run(samples, results, parameters, mediaDefaults, existing)
    val acceptedOut = out.results
      .join(out.samples.select(col("sample_key"), col("sample_id")), Seq("sample_id"))
      .select(
        col("sample_key").as("src_key"),
        col("parameter_id"),
        lit("accepted").as("status"),
        col("sample_id"),
        col("result"),
        col("matrix_state_id")
      )
    val resultRejectsOut = out.resultRejects.select(
      col("sample_key").as("src_key"),
      col("parameter_id"),
      col("reject_reason").as("status"),
      lit(null).cast("long").as("sample_id"),
      lit(null).cast("double").as("result"),
      lit(null).cast("long").as("matrix_state_id")
    )
    val sampleRejectsOut = out.sampleRejects.select(
      col("sample_key").as("src_key"),
      lit(null).cast("long").as("parameter_id"),
      col("reject_reason").as("status"),
      lit(null).cast("long").as("sample_id"),
      lit(null).cast("double").as("result"),
      lit(null).cast("long").as("matrix_state_id")
    )
    acceptedOut
      .unionByName(resultRejectsOut)
      .unionByName(sampleRejectsOut)
      .orderBy(col("src_key"), coalesce(col("parameter_id"), lit(-1L)), col("status"))
  }

  private val addDiscreteSql =
    """WITH base AS (
      |  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 = 0
      |), smp AS (
      |  SELECT k AS sample_key,
      |         CASE WHEN k % 7 = 0 THEN NULL ELSE k % 50 END AS location_id,
      |         CASE WHEN k % 11 = 0 THEN TRUE ELSE FALSE END AS null_dt,
      |         CASE WHEN k % 13 = 0 THEN NULL ELSE k % 3 + 1 END AS media_id
      |  FROM base
      |), sgated AS (
      |  SELECT *,
      |         CASE WHEN location_id IS NULL THEN 'missing_location'
      |              WHEN null_dt THEN 'missing_datetime'
      |              WHEN media_id IS NULL THEN 'missing_media'
      |         END AS sample_reject
      |  FROM smp
      |), ids AS (
      |  SELECT *,
      |         CASE WHEN sample_reject IS NULL
      |              THEN 1000 + row_number() OVER (
      |                     PARTITION BY (sample_reject IS NULL) ORDER BY sample_key)
      |         END AS sample_id
      |  FROM sgated
      |), res AS (
      |  SELECT sample_key, r,
      |         (CAST(sample_key // 97 AS BIGINT) + r) % 6 AS parameter_id,
      |         CASE WHEN (sample_key + r) % 17 = 0 THEN NULL
      |              ELSE CAST(sample_key % 100 + r AS DOUBLE) END AS result,
      |         CASE WHEN (sample_key + r) % 17 = 0 AND r % 2 = 1 THEN 1 END AS cond_id,
      |         CASE WHEN (sample_key + r) % 17 = 0 AND r % 2 = 1 AND (sample_key + r) % 34 <> 0
      |              THEN 0.005 END AS cond_value,
      |         CASE WHEN (sample_key + r) % 23 = 0 THEN NULL ELSE 19 END AS fraction_id,
      |         CASE WHEN (sample_key + r) % 29 = 0 THEN NULL ELSE 3 END AS speciation_id,
      |         CASE WHEN (sample_key + r) % 31 = 0 THEN NULL ELSE 7 END AS matrix_id
      |  FROM smp, LATERAL (SELECT unnest([0, 1, 2]) AS r)
      |), rgated AS (
      |  SELECT res.*, ids.sample_id, ids.sample_reject, ids.media_id,
      |         CASE WHEN ids.sample_reject IS NOT NULL THEN 'sample_rejected'
      |              WHEN res.parameter_id NOT IN (1, 2, 3, 4) THEN 'unknown_parameter'
      |              WHEN res.result IS NULL AND res.cond_id IS NULL THEN 'null_result'
      |              WHEN res.cond_id IN (1, 2) AND res.cond_value IS NULL THEN 'missing_condition_value'
      |              WHEN res.parameter_id = 2 AND res.fraction_id IS NULL THEN 'missing_fraction'
      |              WHEN res.parameter_id = 3 AND res.speciation_id IS NULL THEN 'missing_speciation'
      |         END AS result_reject
      |  FROM res JOIN ids USING (sample_key)
      |), accepted AS (
      |  SELECT sample_key AS src_key, parameter_id, 'accepted' AS status, sample_id, result,
      |         CAST(coalesce(matrix_id, media_id * 10) AS BIGINT) AS matrix_state_id
      |  FROM rgated WHERE result_reject IS NULL
      |), rrej AS (
      |  SELECT sample_key AS src_key, parameter_id, result_reject AS status,
      |         CAST(NULL AS BIGINT) AS sample_id, CAST(NULL AS DOUBLE) AS result,
      |         CAST(NULL AS BIGINT) AS matrix_state_id
      |  FROM rgated WHERE result_reject IS NOT NULL
      |), srej AS (
      |  SELECT sample_key AS src_key, CAST(NULL AS BIGINT) AS parameter_id,
      |         sample_reject AS status, CAST(NULL AS BIGINT) AS sample_id,
      |         CAST(NULL AS DOUBLE) AS result, CAST(NULL AS BIGINT) AS matrix_state_id
      |  FROM sgated WHERE sample_reject IS NOT NULL
      |)
      |SELECT * FROM (
      |  SELECT * FROM accepted
      |  UNION ALL SELECT * FROM rrej
      |  UNION ALL SELECT * FROM srej
      |)
      |ORDER BY src_key, coalesce(parameter_id, -1), status""".stripMargin

  // ---- document store (insertACDocument), oracle-checked -------------
  // Drives the REAL DocumentIngest.ingest over a part-derived batch and
  // hashes all three outputs in one frame: content-hash dedup (the ON
  // CONFLICT (file_hash) DO NOTHING gate — both against the existing
  // store and first-wins within the batch), the known-type gate, the
  // non-empty share_with gate, the blank-name gate, and doc↔geom link
  // fan-out restricted to known geometries. Reject precedence mirrors
  // `R/insertACDocument.R:26-160`. In-batch duplicate contents are
  // planted only on rows with distinct names, so the per-hash
  // first-wins window is tie-free in both engines.
  private def docStore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.sources.DocumentIngest
    val k = col("p_partkey").cast("long")
    val base = TestTables.part(s, d).filter(k % 19 === 0).select(k.as("k"))
    val content =
      when(col("k") % 17 === 0 && col("k") % 13 =!= 0, concat(lit("dup_"), col("k") % 2))
        .otherwise(concat(lit("c"), col("k")))
    val incoming = base.select(
      col("k"),
      when(col("k") % 13 === 0, lit("")).otherwise(concat(lit("doc_"), col("k"))).as("name"),
      element_at(
        array(lit("report"), lit("thesis"), lit("map"), lit("datasheet"), lit("image")),
        (col("k") % 5 + 1).cast("int")
      ).as("doc_type"),
      content.cast("binary").as("payload"),
      when(col("k") % 9 === 0, array().cast("array<string>"))
        .otherwise(array(lit("g1"), lit("g2")))
        .as("share_with"),
      when(col("k") % 8 === 0, lit(null).cast("array<long>"))
        .otherwise(array(col("k") % 25, col("k") % 25 + 10, lit(99L)))
        .as("geom_ids")
    )
    val knownTypes = Seq("report", "thesis", "map", "image").toDF("doc_type")
    val existing = base
      .filter(col("k") % 11 === 0)
      .select(graft.functions.PortableHash.md5num56(content.cast("binary")).as("file_hash"))
    val knownGeoms = (0L to 30L).toDF("geom_id")
    val res = DocumentIngest.ingest(incoming.drop("k"), knownTypes, existing, knownGeoms)
    val accept = res.accepted.select(
      lit("accept").as("kind"),
      col("name"),
      col("file_hash"),
      col("doc_type"),
      size(col("share_with")).cast("long").as("n_share"),
      lit(null).cast("string").as("reject_reason"),
      lit(null).cast("long").as("geom_id")
    )
    val reject = res.rejects.select(
      lit("reject").as("kind"),
      col("name"),
      lit(null).cast("long").as("file_hash"),
      lit(null).cast("string").as("doc_type"),
      lit(null).cast("long").as("n_share"),
      col("reject_reason"),
      lit(null).cast("long").as("geom_id")
    )
    val geom = res.geomLinks.select(
      lit("geom").as("kind"),
      lit(null).cast("string").as("name"),
      col("file_hash"),
      lit(null).cast("string").as("doc_type"),
      lit(null).cast("long").as("n_share"),
      lit(null).cast("string").as("reject_reason"),
      col("geom_id").cast("long").as("geom_id")
    )
    accept
      .unionByName(reject)
      .unionByName(geom)
      .orderBy(col("kind"), col("name"), col("file_hash"), col("geom_id"))
  }

  private lazy val docStoreSql = {
    val hashSql = graft.functions.PortableHash.md5num56Sql("content")
    s"""WITH base AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part WHERE p_partkey % 19 = 0),
       |inc AS (
       |  SELECT k,
       |    CASE WHEN k % 13 = 0 THEN '' ELSE 'doc_' || CAST(k AS VARCHAR) END AS name,
       |    (['report', 'thesis', 'map', 'datasheet', 'image'])[CAST(k % 5 AS INT) + 1] AS doc_type,
       |    CASE WHEN k % 17 = 0 AND k % 13 <> 0 THEN 'dup_' || CAST(k % 2 AS VARCHAR)
       |         ELSE 'c' || CAST(k AS VARCHAR) END AS content,
       |    CASE WHEN k % 9 = 0 THEN CAST(0 AS BIGINT) ELSE CAST(2 AS BIGINT) END AS n_share,
       |    (k % 8 = 0) AS geom_null
       |  FROM base
       |),
       |hashed AS (SELECT *, $hashSql AS file_hash FROM inc),
       |exist AS (SELECT file_hash FROM hashed WHERE k % 11 = 0),
       |flagged AS (
       |  SELECT h.*,
       |         ROW_NUMBER() OVER (PARTITION BY file_hash ORDER BY name) AS rn,
       |         (h.doc_type IN ('report', 'thesis', 'map', 'image')) AS type_ok,
       |         (h.file_hash IN (SELECT file_hash FROM exist)) AS exists_flag
       |  FROM hashed h
       |),
       |decided AS (
       |  SELECT *,
       |    CASE WHEN name = '' THEN 'missing_name'
       |         WHEN NOT type_ok THEN 'unknown_type'
       |         WHEN n_share = 0 THEN 'missing_share_with'
       |         WHEN exists_flag THEN 'duplicate_content'
       |         WHEN rn > 1 THEN 'duplicate_in_batch'
       |         ELSE NULL END AS reject_reason
       |  FROM flagged
       |),
       |ok AS (SELECT * FROM decided WHERE reject_reason IS NULL),
       |geoms AS (
       |  SELECT o.file_hash, g.geom_id
       |  FROM ok o, UNNEST([o.k % 25, o.k % 25 + 10, CAST(99 AS BIGINT)]) AS t(geom_id)
       |  JOIN (SELECT UNNEST(range(0, 31)) AS geom_id) g USING (geom_id)
       |  WHERE NOT o.geom_null
       |)
       |SELECT * FROM (
       |  SELECT 'accept' AS kind, name, file_hash, doc_type, n_share,
       |         CAST(NULL AS VARCHAR) AS reject_reason, CAST(NULL AS BIGINT) AS geom_id
       |  FROM ok
       |  UNION ALL
       |  SELECT 'reject', name, NULL, NULL, NULL, reject_reason, NULL
       |  FROM decided WHERE reject_reason IS NOT NULL
       |  UNION ALL
       |  SELECT 'geom', NULL, file_hash, NULL, NULL, NULL, geom_id FROM geoms
       |)
       |ORDER BY kind, name, file_hash, geom_id""".stripMargin
  }

  // ---- stored-expression safety sandbox (SURVEY §2.8) ---------------

  /** Accept/reject decision table for the stored-expression sandbox
    * (`continuous.numeric_sql_expression_is_safe`,
    * `inst/patches/patch_55.R:582-725`): every lexer rule of
    * [[graft.functions.ExpressionSandbox.validate]] fires at least
    * once — empty input, the `;` gate, both comment forms, the
    * character-class lexer gap, forbidden DML words (first-word-wins
    * order), unknown identifiers vs the case-insensitive allowlist,
    * and the approved-function path. Accepted rows additionally carry
    * the `$n`-bound rewrite and a real parse check against Spark's SQL
    * grammar (the validator's documented caller contract). Driver-side
    * evaluation is bounded by contract: the expression table is a rule
    * dictionary, never data.
    */
  private def expressionSandbox(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.ExpressionSandbox
    val idents = Set("flow", "stage")
    // (id, expression, validate against the ident allowlist?)
    val cases: Seq[(Long, String, Boolean)] = Seq(
      (1L, "$1 + $2 * 2", false),
      (2L, "round($1, 2) - abs($2)", false),
      (3L, "power($1, 0.5) + 3.5e2", false),
      (4L, "flow / stage ^ 2", true),
      (5L, "coalesce($1, 0) % 7", false),
      (6L, "", false),
      (7L, "   ", false),
      (8L, "1; drop table t", false),
      (9L, "1 -- comment", false),
      (10L, "1 /* c */ + 2", false),
      (11L, "select 1", false),
      (12L, "cast(1 as int)", false),
      (13L, "drop(5)", false),
      (14L, "foo($1)", false),
      (15L, "flow + depth", true),
      (16L, "$1 > 2", false),
      (17L, "a & b", false),
      (18L, "greatest($1, $2, 0) - least($1, $2, 0)", false),
      (19L, "ln($1) - log10($2)", false),
      (20L, "stage + Stage", true)
    )
    val rows = cases.map { case (id, e, withIdents) =>
      val st = ExpressionSandbox
        .validate(e, if (withIdents) idents else Set.empty)
        .fold(identity, _ => "ok")
      val bound =
        if (st == "ok") ExpressionSandbox.bindPlaceholders(e, Map(1 -> "v", 2 -> "w")) else null
      val parses: Option[Boolean] =
        if (st == "ok")
          Some(
            try { s.sessionState.sqlParser.parseExpression(bound); true }
            catch { case _: Throwable => false }
          )
        else None
      (id, e, st, bound, parses)
    }
    rows
      .toDF("expr_id", "expression", "status", "bound", "parses")
      .orderBy(col("expr_id"))
  }

  private val expressionSandboxSql =
    """SELECT CAST(expr_id AS BIGINT) AS expr_id, expression, status, bound,
      |       CAST(parses AS BOOLEAN) AS parses
      |FROM (VALUES
      |  (1,  '$1 + $2 * 2',                           'ok', '(v) + (w) * 2', true),
      |  (2,  'round($1, 2) - abs($2)',                'ok', 'round((v), 2) - abs((w))', true),
      |  (3,  'power($1, 0.5) + 3.5e2',                'ok', 'power((v), 0.5) + 3.5e2', true),
      |  (4,  'flow / stage ^ 2',                      'ok', 'flow / stage ^ 2', true),
      |  (5,  'coalesce($1, 0) % 7',                   'ok', 'coalesce((v), 0) % 7', true),
      |  (6,  '',                                      'empty expression', NULL, NULL),
      |  (7,  '   ',                                   'empty expression', NULL, NULL),
      |  (8,  '1; drop table t',                       ''';'' not allowed', NULL, NULL),
      |  (9,  '1 -- comment',                          'comments not allowed', NULL, NULL),
      |  (10, '1 /* c */ + 2',                         'comments not allowed', NULL, NULL),
      |  (11, 'select 1',                              'forbidden word: select', NULL, NULL),
      |  (12, 'cast(1 as int)',                        'forbidden word: cast', NULL, NULL),
      |  (13, 'drop(5)',                               'forbidden word: drop', NULL, NULL),
      |  (14, 'foo($1)',                               'unknown identifier/function: foo', NULL, NULL),
      |  (15, 'flow + depth',                          'unknown identifier/function: depth', NULL, NULL),
      |  (16, '$1 > 2',                                'disallowed characters in: $1 > 2', NULL, NULL),
      |  (17, 'a & b',                                 'disallowed characters in: a & b', NULL, NULL),
      |  (18, 'greatest($1, $2, 0) - least($1, $2, 0)', 'ok', 'greatest((v), (w), 0) - least((v), (w), 0)', true),
      |  (19, 'ln($1) - log10($2)',                    'ok', 'ln((v)) - log10((w))', true),
      |  (20, 'stage + Stage',                         'ok', 'stage + Stage', true)
      |) AS t(expr_id, expression, status, bound, parses)
      |ORDER BY expr_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_doc_store", docStore, Some(docStoreSql)),
    QueryDef("q_catalog_gates", catalogGates, Some(catalogGatesSql)),
    QueryDef("q_borehole", borehole, Some(boreholeSql)),
    QueryDef("q_basin_load", basinLoad, Some(basinLoadSql)),
    QueryDef("q_doc_update", docUpdate, Some(docUpdateSql)),
    QueryDef("q_add_discrete", addDiscrete, Some(addDiscreteSql)),
    QueryDef("q_expression_sandbox", expressionSandbox, Some(expressionSandboxSql))
  )
}
