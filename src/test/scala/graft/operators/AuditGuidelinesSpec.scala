package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AuditGuidelinesSpec extends SparkSpec {

  test("AuditAsOf: earliest post-T log entry wins; created filter; deletes") {
    import spark.implicits._
    // row 1: created Jan 1, value 10 until Jan 10 update -> 20, Jan 20 update -> 30 (current)
    // row 2: created Jan 5, value 5, deleted Jan 12 (old value logged)
    // row 3: created AFTER T -> must not exist at T
    val current = Seq(
      (1L, 30.0, "2024-01-01 00:00:00"),
      (3L, 99.0, "2024-01-16 00:00:00")
    ).toDF("row_id", "value", "created_s")
      .withColumn("created", to_timestamp(col("created_s"))).drop("created_s")
    val log = Seq(
      (1L, 10.0, "2024-01-01 00:00:00", "2024-01-10 00:00:00", "U"),
      (1L, 20.0, "2024-01-01 00:00:00", "2024-01-20 00:00:00", "U"),
      (2L, 5.0, "2024-01-05 00:00:00", "2024-01-12 00:00:00", "D")
    ).toDF("row_id", "value", "created_s", "action_ts_s", "action")
      .withColumn("created", to_timestamp(col("created_s")))
      .withColumn("action_ts", to_timestamp(col("action_ts_s")))
      .drop("created_s", "action_ts_s")

    def stateAt(t: String): Map[Long, Double] =
      AuditAsOf.snapshotAt(current, log, "row_id", Seq("value"), t)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(stateAt("2024-01-08 00:00:00") == Map(1L -> 10.0, 2L -> 5.0))
    assert(stateAt("2024-01-11 00:00:00") == Map(1L -> 20.0, 2L -> 5.0))
    assert(stateAt("2024-01-15 00:00:00") == Map(1L -> 20.0)) // 2 deleted, 3 not yet created
    assert(stateAt("2024-01-25 00:00:00") == Map(1L -> 30.0, 3L -> 99.0))
    assert(stateAt("2024-01-03 00:00:00") == Map(1L -> 10.0)) // 2 not yet created
  }

  test("Guidelines: algorithms, caps, digits, missing input") {
    import spark.implicits._
    val results = Seq(
      (1L, "zinc", 120.0), (1L, "hardness", 100.0),
      (2L, "zinc", 50.0) // no hardness in sample 2
    ).toDF("sample_id", "parameter", "value")
    val rules = Seq(
      (1L, "constant", "zinc", None: Option[String], Some(100.0), None: Option[Double], None: Option[Double], None: Option[Double], 1, None: Option[String]),
      (2L, "linear", "zinc", Some("hardness"), Some(10.0), Some(0.5), None, None, 2, None),
      (3L, "log_linear", "zinc", Some("hardness"), Some(0.1), Some(1.0), Some(1.0), Some(80.0), 3, None),
      (4L, "sql_scalar", "zinc", Some("hardness"), None, None, None, None, 0, Some("greatest(30, $1 / 2)"))
    ).toDF("rule_id", "algorithm", "target_param", "input_param", "b0", "b1", "cap_min", "cap_max", "digits", "expression")
    val out = Guidelines
      .evaluate(results, rules, Seq("sample_id"))
      .select("rule_id", "sample_id", "limit", "exceeds")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((if (r.isNullAt(2)) null else r.getDouble(2)), if (r.isNullAt(3)) null else r.getBoolean(3)))
      .toMap
    assert(out((1L, 1L)) == (100.0, true)) // 120 > 100
    assert(out((2L, 1L)) == (60.0, true)) // 10 + 0.5*100
    // exp(0.1 + ln(100)) = 100*e^0.1 = 110.517, capped at 80
    assert(out((3L, 1L)) == (80.0, true))
    assert(out((4L, 1L)) == (50.0, true)) // greatest(30, 50)
    assert(out((2L, 2L)) == (null, null)) // missing input -> null limit
    assert(out((1L, 2L)) == (100.0, false))
  }

  test("Guidelines: unsafe sql_scalar expression rejected") {
    import spark.implicits._
    val results = Seq((1L, "zinc", 1.0)).toDF("sample_id", "parameter", "value")
    val rules = Seq(
      (1L, "sql_scalar", "zinc", None: Option[String], None: Option[Double], None: Option[Double], None: Option[Double], None: Option[Double], 0, Some("(select 1)"))
    ).toDF("rule_id", "algorithm", "target_param", "input_param", "b0", "b1", "cap_min", "cap_max", "digits", "expression")
    val e = intercept[IllegalArgumentException] {
      Guidelines.evaluate(results, rules, Seq("sample_id")).collect()
    }
    assert(e.getMessage.contains("unsafe"))
  }
}
