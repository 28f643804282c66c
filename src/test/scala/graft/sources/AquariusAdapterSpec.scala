package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AquariusAdapterSpec extends SparkSpec {

  /** Minimal Aquarius corrected-data JSON response shape
    * (`R/downloadAquarius.R:137-159`): Points with offset timestamps,
    * interval Grades/Approvals/Qualifiers.
    */
  private def writeFixture(points: Seq[(String, Double)], extra: String = ""): String = {
    val dir = java.nio.file.Files.createTempDirectory("aq").toFile
    val f = new java.io.File(dir, "resp.json")
    val pts = points
      .map { case (ts, v) => s"""{"Timestamp":"$ts","Value":{"Numeric":$v}}""" }
      .mkString(",")
    val json =
      s"""{"Points":[$pts],
         |"Grades":[{"GradeCode":"A","StartTime":"2023-01-01T00:00:00.0000000-07:00","EndTime":"2023-01-03T00:00:00.0000000-07:00"}]
         |$extra}""".stripMargin
    java.nio.file.Files.writeString(f.toPath, json)
    f.getAbsolutePath
  }

  private val epoch = java.sql.Timestamp.valueOf("1970-01-01 00:00:00")

  test("points parse with UTC offset, NA drop, grade stamping") {
    val file = writeFixture(
      Seq(
        ("2023-01-01T01:00:00.0000000-07:00", 1.0),
        ("2023-01-01T02:00:00.0000000-07:00", 2.0)
      )
    )
    val cfg = SeriesConfig(1L, "downloadAquarius", Map("file" -> file))
    val out = AquariusAdapter.fetch(spark, cfg, epoch).orderBy("datetime").collect()
    assert(out.length == 2)
    // -07:00 offset parses to UTC: 01:00 local -> 08:00 UTC
    assert(out(0).getTimestamp(0) == java.sql.Timestamp.valueOf("2023-01-01 08:00:00"))
    assert(out.forall(_.getString(2) == "A")) // grade interval covers both
  }

  test("difference mode dedups same-timestamp points deterministically") {
    // two rows at 03:00 with different values: lowest value must win,
    // and the join back must not fan out (exactly one row per ts)
    val ts = (h: Int) => f"2023-01-01T0$h%d:00:00.0000000-07:00"
    val file = writeFixture(
      Seq(ts(1) -> 10.0, ts(2) -> 11.0, ts(3) -> 13.0, ts(3) -> 12.0, ts(4) -> 13.5, ts(5) -> 14.0, ts(6) -> 15.0)
    )
    val cfg = SeriesConfig(
      2L,
      "downloadAquarius",
      Map("file" -> file, "difference" -> "true", "min_pos" -> "0.0")
    )
    val out = AquariusAdapter.fetch(spark, cfg, epoch).orderBy("datetime").collect()
    val times = out.map(_.getTimestamp(0))
    assert(times.distinct.length == times.length, "no same-timestamp fanout")
    // increments of the deduped cumulative series 10,11,12,13.5,14,15
    val incs = out.map(_.getDouble(1))
    assert(incs.sameElements(Array(1.0, 1.0, 1.5, 0.5, 1.0)))
  }

  test("difference mode rejects fewer than 6 points like the reference") {
    val ts = (h: Int) => f"2023-01-01T0$h%d:00:00.0000000-07:00"
    val file = writeFixture(Seq(ts(1) -> 1.0, ts(2) -> 2.0, ts(3) -> 3.0))
    val cfg = SeriesConfig(3L, "downloadAquarius", Map("file" -> file, "difference" -> "true"))
    val e = intercept[IllegalArgumentException] {
      AquariusAdapter.fetch(spark, cfg, epoch).collect()
    }
    assert(e.getMessage.contains(">=6 points"))
  }
}
