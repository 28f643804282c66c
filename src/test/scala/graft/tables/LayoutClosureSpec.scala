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

  test("CompoundClosure.affected is topological on diamond DAGs") {
    // 1 feeds compounds 2 and 3, and compound 3 also feeds compound 2:
    // 2 must come AFTER 3 (min-depth BFS would emit [1, 2, 3])
    val memberOf = Map(1L -> Seq(2L, 3L), 3L -> Seq(2L))
    assert(CompoundClosure.affected(memberOf, Set(1L)) == Seq(1L, 3L, 2L))
  }

  test("CompoundClosure.affected rejects cycles instead of hanging") {
    val memberOf = Map(1L -> Seq(2L), 2L -> Seq(3L), 3L -> Seq(1L))
    intercept[IllegalArgumentException] {
      CompoundClosure.affected(memberOf, Set(1L))
    }
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

  test("identically bucketed tables sort-merge-join with no shuffle and no sort") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val facts = (1 to 2000)
      .map(i => (i.toLong % 40, i.toLong, i * 0.5))
      .toDF("timeseries_id", "row_id", "value")
    val daily = (0L until 40L).map(t => (t, t * 100.0)).toDF("timeseries_id", "daily_mean")
    TableLayout.writeBucketedTable(facts, "m_bucketed", "timeseries_id", 8)
    TableLayout.writeBucketedTable(daily, "d_bucketed", "timeseries_id", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark
        .table("m_bucketed")
        .join(spark.table("d_bucketed"), Seq("timeseries_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 2000)
      // the bucket pruning path: an equality filter on the bucket key
      // selects 1 of 8 buckets (the aggregate makes the bucketed
      // distribution useful, so the planner keeps the bucketed scan)
      val pruned = spark
        .table("m_bucketed")
        .filter(col("timeseries_id") === 7L)
        .groupBy(col("timeseries_id"))
        .agg(count(lit(1)))
      val prunedPlan = pruned.queryExecution.executedPlan.toString
      assert(prunedPlan.contains("SelectedBucketsCount: 1 out of 8"), prunedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS m_bucketed")
      spark.sql("DROP TABLE IF EXISTS d_bucketed")
    }
  }
}
