package graft.tables

import graft.SparkSpec
import graft.operators.CompoundClosure
import org.apache.spark.sql.functions._

class LayoutClosureSpec extends SparkSpec {

  test("CompoundClosure.affected walks the member DAG to fixpoint in order") {
    // 1 -> 6 (fallback), 2 -> 6 and 10; 10 -> 12 (compound of compound)
    val memberOf = Map(1L -> Seq(6L), 2L -> Seq(6L, 10L), 10L -> Seq(12L))
    assert(CompoundClosure.affected(memberOf, Set(1L)) == Seq(1L, 6L))
    assert(CompoundClosure.affected(memberOf, Set(2L)) == Seq(2L, 6L, 10L, 12L))
    assert(CompoundClosure.affected(memberOf, Set(3L)) == Seq(3L))
    assert(CompoundClosure.affected(memberOf, Set(1L, 2L)) == Seq(1L, 2L, 6L, 10L, 12L))
  }

  test("TableLayout round-trips and prunes the per-series window read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/meas"
    val df = (for {
      ts <- 1L to 5L
      day <- 1 to 60
    } yield (ts, java.sql.Timestamp.valueOf(f"2023-${(day - 1) / 30 + 1}%02d-${(day - 1) % 30 + 1}%02d 06:00:00"), ts * 100.0 + day))
      .toDF("timeseries_id", "datetime", "value")
    TableLayout.writeMeasurements(df, dir, nBuckets = 8)

    val window = TableLayout.readSeriesWindow(
      spark, dir, seriesId = 3L,
      from = "2023-01-01 00:00:00", to = "2023-01-31 23:00:00", nBuckets = 8
    )
    val got = window.select("value").collect().map(_.getDouble(0)).sorted
    val want = df
      .filter($"timeseries_id" === 3L && $"datetime" < lit("2023-01-31 23:00:00").cast("timestamp"))
      .select("value").collect().map(_.getDouble(0)).sorted
    assert(got.toList == want.toList && got.length == 30)
    // partition pruning: the scan carries partition filters on both
    // event_month and series_bucket (inputFiles ignores pruning, so
    // inspect the planned scan)
    val scan = window.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pf = scan.partitionFilters.map(_.toString).mkString(";")
    assert(pf.contains("event_month") && pf.contains("series_bucket"), pf)
    assert(scan.inputRDDs().head.getNumPartitions >= 0) // plan materializes
  }
}
