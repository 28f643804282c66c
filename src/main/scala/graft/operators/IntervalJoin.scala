package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins: measurement at datetime `dt` picks
  * up the QC/correction segment whose half-open `[start_dt, end_dt)`
  * contains it.
  *
  * Reference semantics: corrections are applied per point by range
  * lookup (`inst/patches/patch_22.R:53-68`), grade 'N' exclusion for
  * the daily calc (`inst/patches/patch_41.R:2668-2677`), RLS-style
  * segment metadata throughout (YukonWRB/AquaCache).
  *
  * Scale notes: the segment side is per-series QC metadata — small
  * relative to the fact table (thousands of segments vs billions of
  * points), so it is broadcast: the range predicate then evaluates
  * map-side with NO shuffle of the fact table. If the segment side ever
  * outgrew broadcast, fall back to an equi-join on seriesId (shuffle on
  * the key both sides already share) with the range predicate as a
  * post-filter — never a cartesian.
  */
object IntervalJoin {

  /** Left join points to containing segments (broadcast segment side).
    *
    * @param points   fact side, has `keyCol` and `dtCol`
    * @param segments has `keyCol`, `startCol`, `endCol` (+ payload)
    */
  def pointInInterval(
      points: DataFrame,
      segments: DataFrame,
      keyCol: String = "timeseries_id",
      dtCol: String = "datetime",
      startCol: String = "start_dt",
      endCol: String = "end_dt",
      joinType: String = "left"
  ): DataFrame = {
    val seg = segments
    points.join(
      broadcast(seg),
      points(keyCol) === seg(keyCol) &&
        points(dtCol) >= seg(startCol) && points(dtCol) < seg(endCol),
      joinType
    ).drop(seg(keyCol)).drop(seg(startCol)).drop(seg(endCol))
  }

  /** Anti range-join: drop points falling in any matching segment —
    * the grade-'N' exclusion shape (`inst/patches/patch_41.R:2668-2677`).
    */
  def excludeIntervals(
      points: DataFrame,
      segments: DataFrame,
      keyCol: String = "timeseries_id",
      dtCol: String = "datetime",
      startCol: String = "start_dt",
      endCol: String = "end_dt"
  ): DataFrame = {
    val seg = segments
    points.join(
      broadcast(seg),
      points(keyCol) === seg(keyCol) &&
        points(dtCol) >= seg(startCol) && points(dtCol) < seg(endCol),
      "left_anti"
    )
  }
}
