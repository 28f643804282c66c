package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Spatial
import graft.operators.VectorStore

/** National Hydro Network staged bulk loader — `R/load_nhn.R:1-528`
  * (YukonWRB/AquaCache): up to eight vector layers from three
  * GeoPackage groups land in the `vectors` store with per-layer fixed
  * layer names/descriptions, an optional region clip on the first two
  * characters of `dataset_name` ('01'..'11'), an optional bounding-box
  * intersect filter, the (dataset_name, nid) feature-name key, and
  * overwrite-vs-fail conflict handling.
  *
  * Spark shape: the decoded layer export is one DataFrame (the gpkg
  * decode itself is environment-bound, like the reference's 300 MB
  * download); clip/bbox are scan-level predicate pushdowns; the
  * name/description projection is map-side; the validity/dup gates
  * reuse [[VectorStore.ingest]] unchanged. One deviation, documented:
  * the bbox test is envelope-intersects (vertex extent overlap), a
  * deterministic superset of the reference's exact
  * `terra::is.related(x, bbox, "intersects")`.
  */
object NhnLoader {

  /** Valid `targets` values, reference order. */
  val ValidTargets: Seq[String] = Seq(
    "basins", "junctions", "flowpaths", "littoral", "banks",
    "watercourses", "waterbodies", "islands"
  )

  /** Valid `clip` region codes: '01'..'11'. */
  val ValidClips: Seq[String] = (1 to 11).map(i => f"$i%02d")

  /** target -> store layer name (the reference's fixed layer names). */
  val LayerNames: Map[String, String] = Map(
    "basins" -> "National Hydro Network - Basins",
    "junctions" -> "National Hydro Network - Hydro Junctions",
    "flowpaths" -> "National Hydro Network - Flowpaths",
    "littoral" -> "National Hydro Network - Littoral",
    "banks" -> "National Hydro Network - Banks",
    "watercourses" -> "National Hydro Network - Watercourses",
    "waterbodies" -> "National Hydro Network - Waterbodies",
    "islands" -> "National Hydro Network - Islands"
  )

  final case class NhnLoad(accepted: DataFrame, rejects: DataFrame, loaded: Seq[String])

  /** Envelope-intersects test between a WKT polygon and
    * (xmin, xmax, ymin, ymax): the vertex extent overlaps the box.
    */
  def envelopeIntersects(
      wkt: Column,
      xmin: Double,
      xmax: Double,
      ymin: Double,
      ymax: Double
  ): Column = {
    val verts = Spatial.wktPolygonVertices(wkt)
    val xs = transform(verts, v => v.getField("x"))
    val ys = transform(verts, v => v.getField("y"))
    array_min(xs) <= xmax && array_max(xs) >= xmin &&
      array_min(ys) <= ymax && array_max(ys) >= ymin
  }

  /** Stage an NHN layer export into the vector store.
    *
    * @param features  decoded gpkg rows: target (layer key),
    *                  dataset_name, nid, wkt, edition, version
    * @param targets   layers to load (validated against
    *                  [[ValidTargets]], like the reference)
    * @param clip      optional region codes; keeps features whose
    *                  dataset_name starts with one of them
    * @param bbox      optional (xmin, xmax, ymin, ymax)
    * @param existing  current store: layer_name, feature_name,
    *                  geom_type
    * @param overwrite false: conflicts reject as duplicate_feature;
    *                  true: conflicts load with action='replaced'
    */
  def stage(
      features: DataFrame,
      targets: Seq[String] = ValidTargets,
      clip: Option[Seq[String]] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      existing: DataFrame,
      overwrite: Boolean = false
  ): NhnLoad = {
    val badTargets = targets.filterNot(ValidTargets.contains)
    require(
      badTargets.isEmpty,
      s"Invalid targets specified: ${badTargets.mkString(", ")}. " +
        s"Valid options are: ${ValidTargets.mkString(", ")}"
    )
    clip.foreach { cs =>
      val bad = cs.filterNot(ValidClips.contains)
      require(
        bad.isEmpty,
        s"Invalid clip specified: ${bad.mkString(", ")}. " +
          s"Valid options are: ${ValidClips.mkString(", ")}"
      )
    }

    val targeted = features.filter(col("target").isin(targets: _*))
    val clipped = clip match {
      case Some(cs) => targeted.filter(substring(col("dataset_name"), 1, 2).isin(cs: _*))
      case None     => targeted
    }
    val boxed = bbox match {
      case Some((xmin, xmax, ymin, ymax)) =>
        clipped.filter(envelopeIntersects(col("wkt"), xmin, xmax, ymin, ymax))
      case None => clipped
    }

    val layerName = ValidTargets
      .map(t => (t, LayerNames(t)))
      .foldLeft(lit(null).cast("string")) { case (acc, (t, name)) =>
        when(col("target") === t, name).otherwise(acc)
      }
    // basins key on the dataset name alone and carry edition/version;
    // every other layer keys on dataset_name + nid
    val named = boxed.select(
      col("target"),
      layerName.as("layer_name"),
      when(col("target") === "basins", col("dataset_name"))
        .otherwise(concat_ws("_", col("dataset_name"), col("nid")))
        .as("feature_name"),
      when(
        col("target") === "basins",
        concat(lit("Edition: "), col("edition"), lit(", Version: "), col("version"))
      ).as("description"),
      col("wkt")
    )

    val layers = features.sparkSession
      .createDataFrame(
        features.sparkSession.sparkContext
          .parallelize(targets.map(t => org.apache.spark.sql.Row(LayerNames(t)))),
        org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("layer_name", org.apache.spark.sql.types.StringType))
        )
      )
    val imp = VectorStore.ingest(named, layers, existing)
    if (!overwrite) {
      NhnLoad(
        imp.accepted.withColumn("action", lit("inserted")),
        imp.rejects,
        targets
      )
    } else {
      // conflicts become replacements: re-derive the duplicate rows
      // with their full columns (VectorStore rejects carry only the
      // key) via a semi join on the conflict key
      val dupKeys = imp.rejects
        .filter(col("reject_reason") === "duplicate_feature")
        .select("layer_name", "feature_name")
      val replaced = named
        .withColumn("geom_type", Spatial.wktGeomType(col("wkt")))
        .join(dupKeys, Seq("layer_name", "feature_name"), "left_semi")
        .withColumn("action", lit("replaced"))
      NhnLoad(
        imp.accepted.withColumn("action", lit("inserted")).unionByName(replaced),
        imp.rejects.filter(col("reject_reason") =!= "duplicate_feature"),
        targets
      )
    }
  }
}
