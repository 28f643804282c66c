package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** addNewDiscrete gates, batch-first: sample metadata rules, per-result
  * parameter requirements, matrix-state defaulting from the sample's
  * media, and id assignment above the existing max.
  */
class AddDiscreteSpec extends SparkSpec {

  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-05-01 10:00:00")

  private def samples = Seq(
    // (sample_key, location_id, datetime, media_id)
    (1L, Some(10L), Some(ts), Some(1L)),
    (2L, None, Some(ts), Some(1L)),      // missing_location
    (3L, Some(10L), None, Some(1L)),     // missing_datetime
    (4L, Some(10L), Some(ts), None),     // missing_media
    (5L, Some(10L), Some(ts), Some(2L)), // no results -> no_results
    (6L, Some(11L), Some(ts), Some(2L))
  ).toDF("sample_key", "location_id", "datetime", "media_id")

  private def results = Seq(
    // (sample_key, parameter_id, result, rtype, cond, condval, fraction, speciation, matrix)
    (1L, 1L, Some(7.1), 1L, None, None, Some(19L), Some(3L), Some(7L)),
    (1L, 2L, Some(8.0), 1L, None, None, None, Some(3L), Some(7L)),      // needs_fraction -> missing_fraction
    (1L, 3L, Some(9.0), 1L, None, None, Some(19L), None, Some(7L)),     // needs_speciation -> missing_speciation
    (1L, 9L, Some(1.0), 1L, None, None, None, None, None),              // unknown_parameter
    (2L, 1L, Some(5.0), 1L, None, None, None, None, None),              // sample_rejected
    (6L, 1L, None, 1L, None, None, None, None, None),                   // null_result (no condition)
    (6L, 4L, None, 1L, Some(1L), None, None, None, None),               // censored, no value -> missing_condition_value
    (6L, 2L, None, 1L, Some(1L), Some(0.005), Some(19L), None, Some(2L)), // censored OK, explicit matrix
    (6L, 3L, Some(3.0), 1L, None, None, None, Some(3L), None)           // matrix defaults from media 2
  ).toDF(
    "sample_key", "parameter_id", "result", "result_type_id", "result_condition_id",
    "result_condition_value", "sample_fraction_id", "result_speciation_id", "matrix_state_id"
  )

  private val parameters = Seq(
    (1L, false, false),
    (2L, true, false),
    (3L, false, true),
    (4L, false, false)
  ).toDF("parameter_id", "needs_fraction", "needs_speciation")

  private val mediaDefaults = Seq((1L, 10L), (2L, 20L)).toDF("media_id", "default_matrix_state_id")
  private val existing = Seq((1000L, "x")).toDF("sample_id", "junk")

  test("AddDiscrete: every gate fires, accepted set flows, ids above max") {
    val out = AddDiscrete.run(samples, results, parameters, mediaDefaults, existing)

    val srej = out.sampleRejects.as[(Long, String)].collect().toMap
    assert(
      srej == Map(2L -> "missing_location", 3L -> "missing_datetime", 4L -> "missing_media", 5L -> "no_results")
    )

    val ids = out.samples.select("sample_key", "sample_id").as[(Long, Long)].collect().toMap
    assert(ids == Map(1L -> 1001L, 6L -> 1002L), "row_number over sample_key, above max(existing)=1000")

    val rrej = out.resultRejects
      .select("sample_key", "parameter_id", "reject_reason")
      .as[(Long, Long, String)]
      .collect()
      .toSet
    assert(
      rrej == Set(
        (1L, 2L, "missing_fraction"),
        (1L, 3L, "missing_speciation"),
        (1L, 9L, "unknown_parameter"),
        (2L, 1L, "sample_rejected"),
        (6L, 1L, "null_result"),
        (6L, 4L, "missing_condition_value")
      )
    )

    val acc = out.results
      .select("sample_id", "parameter_id", "matrix_state_id")
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    assert(
      acc == Set(
        (1001L, 1L, 7L),  // explicit matrix kept
        (1002L, 2L, 2L),  // explicit matrix kept on censored row
        (1002L, 3L, 20L)  // defaulted from media 2
      )
    )
  }

  test("AddDiscrete: empty existing store starts ids at 1") {
    val out = AddDiscrete.run(
      samples.filter(col("sample_key") === 1L),
      results.filter(col("sample_key") === 1L),
      parameters,
      mediaDefaults,
      existing.filter(lit(false))
    )
    assert(out.samples.select("sample_id").as[Long].collect().toSeq == Seq(1L))
  }
}
