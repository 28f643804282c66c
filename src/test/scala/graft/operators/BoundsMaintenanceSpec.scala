package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Decision-table coverage for the catalog bounds-maintenance
  * contracts (`inst/patches/patch_41.R:618-960` in YukonWRB/AquaCache):
  * the insert-trigger merge and the exact two-fact-table recompute.
  */
class BoundsMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def catalog = Seq(
    // (id, type, start, end, last_new_data)
    (1L, "basic", ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"), ts("2024-01-05 00:00:00")),
    (2L, "basic", null, null, null),
    (3L, "basic", ts("2020-01-01 00:00:00"), ts("2030-01-01 00:00:00"), ts("2024-01-05 00:00:00")),
    (4L, "compound", ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"), null),
    (5L, "basic", ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"), ts("2024-01-05 00:00:00"))
  ).toDF("timeseries_id", "timeseries_type", "start_datetime", "end_datetime", "last_new_data")

  private def batch = Seq(
    (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-02-01 00:00:00")), // widens both ends
    (2L, ts("2024-03-01 00:00:00")), // NULL bounds take batch extrema
    (3L, ts("2024-06-01 00:00:00")), // inside wide bounds: only lnd bumps
    (4L, ts("2023-01-01 00:00:00")) // compound: trigger skips entirely
    // id 5: not in batch -> untouched
  ).toDF("timeseries_id", "datetime")

  test("mergeInsertBounds: null-safe LEAST/GREATEST + last_new_data stamp, basic-only") {
    val asOf = ts("2024-07-01 00:00:00")
    val out = BoundsMaintenance
      .mergeInsertBounds(catalog, batch, lit(asOf))
      .orderBy("timeseries_id")
      .collect()
      .map(r =>
        (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getTimestamp(4))
      )
    assert(out(0) == ((1L, ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"), asOf)))
    assert(out(1) == ((2L, ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00"), asOf)))
    assert(out(2) == ((3L, ts("2020-01-01 00:00:00"), ts("2030-01-01 00:00:00"), asOf)))
    // compound: bounds AND last_new_data untouched even though batched
    assert(out(3) == ((4L, ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"), null)))
    // not in batch: fully untouched
    assert(
      out(4) == ((5L, ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"), ts("2024-01-05 00:00:00")))
    )
  }

  test("refreshBasicBounds: exact min/max over both fact tables, NULL when neither has rows") {
    val daily = Seq(
      (1L, ts("2023-12-01 00:00:00")), // earlier than any realtime row
      (5L, ts("2024-05-01 00:00:00")) // daily-only series
    ).toDF("timeseries_id", "datetime")
    val out = BoundsMaintenance
      .refreshBasicBounds(catalog, batch, daily)
      .orderBy("timeseries_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3)))
    assert(out(0) == ((1L, ts("2023-12-01 00:00:00"), ts("2024-02-01 00:00:00"))))
    assert(out(1) == ((2L, ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00"))))
    assert(out(2) == ((3L, ts("2024-06-01 00:00:00"), ts("2024-06-01 00:00:00"))))
    // compound keeps stored bounds (trigger only refreshes 'basic')
    assert(out(3) == ((4L, ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"))))
    assert(out(4) == ((5L, ts("2024-05-01 00:00:00"), ts("2024-05-01 00:00:00"))))
  }

  test("refreshBasicBounds: accepts the daily table's native date column (UTC midnight cast)") {
    val dailyNative = Seq(
      (1L, java.sql.Date.valueOf("2023-12-01")),
      (5L, java.sql.Date.valueOf("2024-05-01"))
    ).toDF("timeseries_id", "date")
    val out = BoundsMaintenance
      .refreshBasicBounds(catalog, batch, dailyNative)
      .orderBy("timeseries_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3)))
    // identical to the datetime-column variant above
    assert(out(0) == ((1L, ts("2023-12-01 00:00:00"), ts("2024-02-01 00:00:00"))))
    assert(out(4) == ((5L, ts("2024-05-01 00:00:00"), ts("2024-05-01 00:00:00"))))
  }

  test("plan: the batch aggregate broadcasts; the catalog never shuffles") {
    val out = BoundsMaintenance.mergeInsertBounds(catalog, batch, lit(ts("2024-07-01 00:00:00")))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast merge join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"catalog must not shuffle for the merge:\n$plan")
  }
}
