package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SynchronizeDiscreteSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sample diff: remote-wins updates, share_with preserved, no_update skips, guarded deletes") {
    import spark.implicits._
    val local = Seq(
      // unchanged
      (10L, 1L, ts("2024-01-01 10:00:00"), "grab", Some(5.0), "lab A", "eqwin", false),
      // depth changed remotely -> update, changed_fields=[depth_m]
      (11L, 1L, ts("2024-01-02 10:00:00"), "grab", Some(2.0), "lab A", "eqwin", false),
      // changed remotely but no_update -> protected
      (12L, 1L, ts("2024-01-03 10:00:00"), "grab", Some(3.0), "lab A", "eqwin", true),
      // absent from remote, same import source -> delete
      (13L, 1L, ts("2024-01-04 10:00:00"), "grab", Some(4.0), "lab A", "eqwin", false),
      // absent from remote, DIFFERENT import source -> keep
      (14L, 1L, ts("2024-01-05 10:00:00"), "grab", Some(4.0), "lab A", "manual", false)
    ).toDF("sample_id", "sample_series_id", "datetime", "collection_method",
      "depth_m", "owner", "import_source", "no_update")
    val remote = Seq(
      (1L, ts("2024-01-01 10:00:00"), "grab", Some(5.0), "lab A", "eqwin"),
      (1L, ts("2024-01-02 10:00:00"), "grab", Some(2.5), "lab A", "eqwin"),
      (1L, ts("2024-01-03 10:00:00"), "grab", Some(9.9), "lab A", "eqwin"),
      // brand new sample -> insert
      (1L, ts("2024-01-06 10:00:00"), "grab", Some(1.0), "lab B", "eqwin")
    ).toDF("sample_series_id", "datetime", "collection_method", "depth_m", "owner", "import_source")

    val d = SynchronizeDiscrete
      .diffSamples(local, remote, Seq("depth_m", "owner", "share_with"),
        deleteMissing = true, importSource = Some("eqwin"))
      .orderBy("datetime")
      .collect()
    val actions = d.map(r => (r.getAs[java.sql.Timestamp]("datetime"), r.getAs[String]("action"))).toList
    assert(actions == List(
      (ts("2024-01-01 10:00:00"), "keep"),
      (ts("2024-01-02 10:00:00"), "update"),
      (ts("2024-01-03 10:00:00"), "protected"),
      (ts("2024-01-04 10:00:00"), "delete"),
      (ts("2024-01-05 10:00:00"), "keep"),
      (ts("2024-01-06 10:00:00"), "insert")
    ))
    assert(d(1).getAs[scala.collection.Seq[String]]("changed_fields").toList == List("depth_m"))
  }

  test("result diff: null-aware key match, ambiguity keeps local, value updates detected") {
    import spark.implicits._
    def res(sid: Long, rt: String, pid: Long, lab: Option[String], v: Option[Double], noUpd: Boolean) =
      (sid, rt, pid, None: Option[Long], None: Option[String], None: Option[Long],
        None: Option[String], lab, None: Option[java.sql.Timestamp], v, noUpd)
    val local = Seq(
      res(10L, "measured", 1L, Some("lab A"), Some(7.0), noUpd = false),  // value changes -> update
      res(10L, "measured", 2L, None, Some(3.0), noUpd = false),           // NULL lab matches NULL lab -> keep
      res(10L, "measured", 3L, Some("lab A"), Some(1.0), noUpd = false),  // duplicate local key ->
      res(10L, "measured", 3L, Some("lab A"), Some(2.0), noUpd = false),  //   remote match ambiguous
      res(10L, "measured", 4L, None, Some(9.0), noUpd = false),           // absent remotely -> delete
      res(10L, "measured", 5L, None, Some(8.0), noUpd = true)             // absent remotely but no_update -> keep
    ).toDF("sample_id", "result_type", "parameter_id", "matrix_state_id",
      "result_value_type", "result_speciation_id", "protocol_method", "laboratory",
      "analysis_datetime", "result", "no_update")
      .withColumn("sample_fraction_id", lit(null).cast("long"))
    val remote = Seq(
      res(10L, "measured", 1L, Some("lab A"), Some(7.5), noUpd = false),
      res(10L, "measured", 2L, None, Some(3.0), noUpd = false),
      res(10L, "measured", 3L, Some("lab A"), Some(5.0), noUpd = false),
      res(10L, "measured", 6L, None, Some(4.0), noUpd = false)            // new -> insert
    ).toDF("sample_id", "result_type", "parameter_id", "matrix_state_id",
      "result_value_type", "result_speciation_id", "protocol_method", "laboratory",
      "analysis_datetime", "result", "no_update")
      .withColumn("sample_fraction_id", lit(null).cast("long"))
      .drop("no_update")

    val d = SynchronizeDiscrete.diffResults(local, remote, deleteMissing = true)
    val byParam = d.collect()
      .groupBy(_.getAs[Long]("parameter_id"))
      .view.mapValues(_.map(_.getAs[String]("action")).sorted.toList).toMap
    assert(byParam(1L) == List("update"))
    assert(byParam(2L) == List("keep"))
    assert(byParam(3L).count(_ == "ambiguous") == 2) // both local dups flagged, kept
    assert(byParam(4L) == List("delete"))
    assert(byParam(5L) == List("keep"))
    assert(byParam(6L) == List("insert"))
  }
}
