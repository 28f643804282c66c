package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end time-travel loop: mutate via Upsert -> capture the diff
  * -> AuditAsOf reconstructs the pre-mutation state from the captured
  * log.
  */
class AuditCaptureSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def beforeDf = {
    import spark.implicits._
    Seq(
      (1L, 10.0, "A", ts("2023-01-01 00:00:00")),
      (2L, 20.0, "A", ts("2023-01-01 00:00:00")),
      (3L, 30.0, "B", ts("2023-01-01 00:00:00"))
    ).toDF("row_id", "value", "grade", "created")
  }

  private def afterDf = {
    import spark.implicits._
    // row 2 updated, row 3 deleted, row 4 inserted
    Seq(
      (1L, 10.0, "A", ts("2023-01-01 00:00:00")),
      (2L, 21.5, "C", ts("2023-01-01 00:00:00")),
      (4L, 40.0, "A", ts("2023-02-01 12:00:00"))
    ).toDF("row_id", "value", "grade", "created")
  }

  test("capture emits I/U/D rows with changed_fields and JSON payloads") {
    val log = AuditCapture
      .capture(beforeDf, afterDf, "row_id", Seq("value", "grade"), "2023-02-01 12:00:00", "measurements")
      .orderBy("row_id")
      .collect()
    assert(log.length == 3)
    val upd = log(0) // row 2
    assert(upd.getAs[String]("action") == "U")
    assert(upd.getAs[scala.collection.Seq[String]]("changed_fields").toList == List("value", "grade"))
    assert(upd.getAs[String]("original_data").contains("\"value\":20.0"))
    assert(upd.getAs[String]("new_data").contains("\"value\":21.5"))
    val del = log(1) // row 3
    assert(del.getAs[String]("action") == "D" && del.getLong(1) == 3L)
    assert(del.getAs[String]("new_data") == null)
    val ins = log(2) // row 4
    assert(ins.getAs[String]("action") == "I" && ins.getAs[String]("original_data") == null)
    // unchanged row 1 emits nothing
    assert(!log.exists(r => r.getLong(1) == 1L))
  }

  test("mutate -> capture -> snapshotAt reconstructs the pre-state") {
    import spark.implicits._
    val updates = Seq(
      (2L, 21.5, "C", ts("2023-01-01 00:00:00")),
      (4L, 40.0, "A", ts("2023-02-01 12:00:00"))
    ).toDF("row_id", "value", "grade", "created")
    val upserted = Upsert(beforeDf, updates, Seq("row_id"), Upsert.DoUpdate)
    val after = upserted.filter(col("row_id") =!= 3L) // delete row 3
    val asOfLog = AuditCapture
      .toAsOfLog(beforeDf, after, "row_id", Seq("value", "grade"), "created", "2023-02-01 12:00:00")
    val snapshot = AuditAsOf
      .snapshotAt(after, asOfLog, "row_id", Seq("value", "grade"), "2023-01-15 00:00:00")
      .select("row_id", "value", "grade")
      .orderBy("row_id")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toList
    // exactly the original three rows; row 4 did not exist at T
    assert(snapshot == List((1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 30.0, "B")))
  }

  test("snapshotAt breaks identical-microsecond log ties by payload, not scan order") {
    import spark.implicits._
    val current = Seq((1L, 99.0, "Z", ts("2023-01-01 00:00:00")))
      .toDF("row_id", "value", "grade", "created")
    // two post-asOf log rows for the same id at the SAME action_ts:
    // the payload-ascending row (5.0, "A") must win deterministically
    val log = Seq(
      (1L, 7.0, "B", ts("2023-01-01 00:00:00"), ts("2023-02-01 00:00:00")),
      (1L, 5.0, "A", ts("2023-01-01 00:00:00"), ts("2023-02-01 00:00:00"))
    ).toDF("row_id", "value", "grade", "created", "action_ts")
    val snap = AuditAsOf
      .snapshotAt(current, log, "row_id", Seq("value", "grade"), "2023-01-15 00:00:00")
      .select("row_id", "value", "grade")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toList
    assert(snap == List((1L, 5.0, "A")))
  }
}
