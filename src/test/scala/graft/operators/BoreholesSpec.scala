package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Borehole/well insert gates (`R/insertACBorehole.R`): every
  * validation rule classifies its row, accepted rows get sequential
  * ids above the existing max, and child frames (permafrost, wells,
  * document links) carry exactly the accepted rows that need them.
  */
class BoreholesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("borehole_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("location_id", LongType),
    StructField("purpose_id", LongType),
    StructField("well_purpose_id", LongType),
    StructField("permafrost_present", BooleanType, nullable = false),
    StructField("permafrost_top_m", DoubleType),
    StructField("permafrost_bot_m", DoubleType),
    StructField("bedrock_reached", BooleanType),
    StructField("depth_to_bedrock_m", DoubleType),
    StructField("is_well", BooleanType, nullable = false),
    StructField("casing_diameter_mm", DoubleType),
    StructField("screen_top_depth_m", DoubleType),
    StructField("screen_bottom_depth_m", DoubleType),
    StructField("share_with", ArrayType(StringType)),
    StructField("document_id", LongType)
  ))

  private def row(
      name: String,
      lat: java.lang.Double = 60.0,
      lon: java.lang.Double = -135.0,
      locationId: java.lang.Long = null,
      purposeId: java.lang.Long = null,
      permafrost: Boolean = false,
      pTop: java.lang.Double = null,
      pBot: java.lang.Double = null,
      bedrock: java.lang.Boolean = null,
      bedrockDepth: java.lang.Double = null,
      isWell: Boolean = false,
      share: Seq[String] = Seq("public_reader"),
      docId: java.lang.Long = null
  ): Row = Row(
    name, lat, lon, locationId, purposeId, purposeId, permafrost, pTop, pBot,
    bedrock, bedrockDepth, isWell, null, null, null, share, docId
  )

  private def runValidate(rows: Seq[Row]) = {
    import spark.implicits._
    val incoming = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val locations = Seq(1L, 2L).toDF("location_id")
    val purposes = Seq(0L, 1L).toDF("purpose_id")
    val existing = Seq((7L, "BH-Existing", 60.0, -135.0))
      .toDF("borehole_id", "borehole_name", "latitude", "longitude")
    Boreholes.validate(incoming, locations, purposes, existing)
  }

  test("every gate classifies its row; accepted ids start above existing max") {
    val imp = runValidate(Seq(
      row("Good Hole", locationId = 1L, purposeId = 0L),
      row(null),                                                   // missing_name
      row("Bad Lat", lat = 95.0),                                  // bad_latitude
      row("Bad Lon", lon = -190.0),                                // bad_longitude
      row("No Loc", locationId = 99L),                             // unknown_location
      row("No Purpose", purposeId = 9L),                           // unknown_purpose
      row("PF Missing", permafrost = true),                        // missing_permafrost_depths
      row("PF Bad", permafrost = true, pTop = 5.0, pBot = 4.0),    // bad_permafrost_interval
      row("Bedrock Missing", bedrock = true),                      // missing_depth_to_bedrock
      row("Bedrock Extra", bedrock = false, bedrockDepth = 3.0),   // unexpected_depth_to_bedrock
      row("Bedrock Neg", bedrock = true, bedrockDepth = -1.0),     // negative_depth_to_bedrock
      row("No Share", share = Seq()),                              // missing_share_with
      row("bh-existing")                                           // duplicate (case-insensitive)
    ))
    val reasons = imp.rejects
      .collect()
      .map(r => Option(r.getAs[String]("borehole_name")).getOrElse("<null>") -> r.getAs[String]("reject_reason"))
      .toMap
    assert(reasons == Map(
      "<null>" -> "missing_name",
      "Bad Lat" -> "bad_latitude",
      "Bad Lon" -> "bad_longitude",
      "No Loc" -> "unknown_location",
      "No Purpose" -> "unknown_purpose",
      "PF Missing" -> "missing_permafrost_depths",
      "PF Bad" -> "bad_permafrost_interval",
      "Bedrock Missing" -> "missing_depth_to_bedrock",
      "Bedrock Extra" -> "unexpected_depth_to_bedrock",
      "Bedrock Neg" -> "negative_depth_to_bedrock",
      "No Share" -> "missing_share_with",
      "bh-existing" -> "duplicate_borehole"
    ))
    val acc = imp.accepted.collect()
    assert(acc.map(_.getAs[String]("borehole_name")).toSeq == Seq("Good Hole"))
    assert(acc.head.getAs[Long]("borehole_id") == 8L) // existing max 7 + 1
  }

  test("child frames: permafrost, well and document rows for accepted boreholes only") {
    val imp = runValidate(Seq(
      row("Well A", permafrost = true, pTop = 2.0, pBot = 6.5, isWell = true, docId = 42L),
      row("Hole B", docId = 43L),
      row("Rejected", lat = 99.0, isWell = true, docId = 44L)
    ))
    val accepted = imp.accepted.collect().map(r =>
      r.getAs[String]("borehole_name") -> r.getAs[Long]("borehole_id")).toMap
    assert(accepted.keySet == Set("Well A", "Hole B"))

    val pf = imp.permafrost.collect()
    assert(pf.length == 1)
    assert(pf.head.getAs[Long]("borehole_id") == accepted("Well A"))
    assert(pf.head.getAs[Double]("depth_from_m") == 2.0 && pf.head.getAs[Double]("depth_to_m") == 6.5)

    val wells = imp.wells.collect()
    assert(wells.map(_.getAs[Long]("borehole_id")).toSeq == Seq(accepted("Well A")))

    val docs = imp.docLinks.collect().map(r =>
      r.getAs[Long]("document_id") -> r.getAs[String]("document_type")).toMap
    assert(docs == Map(42L -> "well log", 43L -> "borehole log")) // no 44: its borehole was rejected
  }
}
