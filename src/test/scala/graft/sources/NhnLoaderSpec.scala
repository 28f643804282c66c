package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NHN staged loader (`R/load_nhn.R`): target/clip validation, region
  * clip + bbox filters, per-layer feature naming, and overwrite
  * semantics over the VectorStore gates.
  */
class NhnLoaderSpec extends SparkSpec {

  import spark.implicits._

  private val square = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
  private val farSquare = "POLYGON ((100 50, 104 50, 104 54, 100 54, 100 50))"

  private def features = Seq(
    ("basins", "01-YUKON", "N1", "3", "2", square),
    ("basins", "09-ATLANTIC", "N2", "1", "1", square), // clipped out
    ("flowpaths", "01-YUKON", "N3", "1", "1", square),
    ("junctions", "02-PACIFIC", "N4", "1", "1", farSquare) // bbox out
  ).toDF("target", "dataset_name", "nid", "edition", "version", "wkt")

  private val noExisting = Seq.empty[(String, String, String)]
    .toDF("layer_name", "feature_name", "geom_type")

  test("invalid targets and clip codes are refused up front") {
    intercept[IllegalArgumentException] {
      NhnLoader.stage(features, targets = Seq("rivers"), existing = noExisting)
    }
    intercept[IllegalArgumentException] {
      NhnLoader.stage(features, clip = Some(Seq("12")), existing = noExisting)
    }
  }

  test("clip + bbox filter; basins key on dataset_name with edition/version description") {
    val load = NhnLoader.stage(
      features,
      clip = Some(Seq("01", "02")),
      bbox = Some((-10.0, 10.0, -10.0, 10.0)),
      existing = noExisting
    )
    val acc = load.accepted.collect()
    val byName = acc.map(r => r.getAs[String]("feature_name") -> r).toMap
    // '09-ATLANTIC' clipped out, far junction bbox'd out
    assert(byName.keySet == Set("01-YUKON", "01-YUKON_N3"))
    assert(byName("01-YUKON").getAs[String]("layer_name") == "National Hydro Network - Basins")
    assert(byName("01-YUKON").getAs[String]("description") == "Edition: 3, Version: 2")
    assert(byName("01-YUKON_N3").getAs[String]("layer_name") == "National Hydro Network - Flowpaths")
    assert(byName("01-YUKON_N3").getAs[String]("description") == null)
    assert(acc.forall(_.getAs[String]("action") == "inserted"))
  }

  test("conflicts reject without overwrite and replace with it") {
    val existing = Seq(("National Hydro Network - Basins", "01-YUKON", "POLYGON"))
      .toDF("layer_name", "feature_name", "geom_type")
    val noOv = NhnLoader.stage(features, existing = existing, overwrite = false)
    assert(
      noOv.rejects
        .filter(col("reject_reason") === "duplicate_feature")
        .select("feature_name")
        .as[String]
        .collect()
        .toSeq == Seq("01-YUKON")
    )
    val ov = NhnLoader.stage(features, existing = existing, overwrite = true)
    val actions = ov.accepted
      .select("feature_name", "action")
      .as[(String, String)]
      .collect()
      .toMap
    assert(actions("01-YUKON") == "replaced")
    assert(ov.rejects.filter(col("reject_reason") === "duplicate_feature").count() == 0)
  }
}
