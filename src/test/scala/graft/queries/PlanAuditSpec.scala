package graft.queries

import graft.SparkSpec

/** Plan-quality assertions for the round-3 query surface: the scale
  * properties SURVEY §8.4 claims must be visible in the physical
  * plan, not just argued.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("no CartesianProduct anywhere in the whole registry") {
    for (q <- Registry.all.map(_.name)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
    }
  }

  test("zonal stats broadcasts the zone dim — the cell side never pre-shuffles") {
    val p = plan("q_raster_zonal")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("image-latest catalog/watermark joins are all broadcast, not sort-merge") {
    val p = plan("q_image_latest")
    assert(!p.contains("SortMergeJoin"), s"metadata joins must broadcast:\n$p")
  }

  test("discrete sync is one full-outer join per level (no extra shuffle of the fact side)") {
    val p = plan("q_discrete_sync")
    assert(p.contains("FullOuter"), p)
  }
}
