package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegmentAdjustSpec extends SparkSpec {

  private def segDf(rows: (Option[Long], Long, String, String, String, String)*) = {
    import spark.implicits._
    rows.toSeq
      .map { case (id, sid, stream, v, s, e) => (id, sid, stream, v, s, e) }
      .toDF("id", "series_id", "stream", "value", "s", "e")
      .withColumn("start_dt", to_timestamp(col("s")))
      .withColumn("end_dt", to_timestamp(col("e")))
      .drop("s", "e")
  }

  test("adjust integrates new segments per stream; overlapping streams stay independent") {
    val exist = segDf(
      (Some(1L), 9L, "grade", "A", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      // a DIFFERENT stream overlapping the same range (qualifier rank streams)
      (Some(2L), 9L, "qualifier", "ICE", "2024-01-03 00:00:00", "2024-01-08 00:00:00")
    )
    val news = segDf(
      (None, 9L, "grade", "B", "2024-01-04 00:00:00", "2024-01-06 00:00:00")
    )
    val out = SegmentAdjust
      .adjust(exist, news, streamCol = Some("stream"))
      .collect()
      .map(r => (r.getString(1), Option(r.getString(3)), r.getString(6)))
    // qualifier stream untouched (no new segments -> unchanged, not emitted)
    assert(!out.exists(_._1 == "qualifier"))
    val grades = out.filter(_._1 == "grade").map(_._2.get).sorted
    assert(grades.toList == List("A", "A", "B"))
  }

  test("adjust emits delete ops for surplus ids and is idempotent") {
    val exist = segDf(
      (Some(1L), 9L, "g", "A", "2024-01-01 00:00:00", "2024-01-05 00:00:00"),
      (Some(2L), 9L, "g", "B", "2024-01-05 00:00:00", "2024-01-10 00:00:00")
    )
    val news = segDf((None, 9L, "g", "C", "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
    val out = SegmentAdjust.adjust(exist, news, streamCol = Some("stream")).collect()
    val ops = out.map(_.getString(6)).groupBy(identity).view.mapValues(_.length).toMap
    assert(ops == Map("upsert" -> 1, "delete" -> 1))
    // idempotent: re-adjusting with a no-op new segment emits nothing
    val existAfter = segDf((Some(1L), 9L, "g", "C", "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
    val noop = segDf((None, 9L, "g", "C", "2024-01-02 00:00:00", "2024-01-03 00:00:00"))
    assert(SegmentAdjust.adjust(existAfter, noop, streamCol = Some("stream")).count() == 0)
  }
}
