package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local/remote reconciliation with remote-wins semantics.
  *
  * Reference: `R/synchronize_continuous.R:683-714` (YukonWRB/
  * AquaCache) — full-outer comparison on the series key + datetime,
  * null-safe value diff, deletes propagated for rows absent from the
  * remote, and `no_update`-flagged local rows protected from both
  * update and delete (`:576-579`).
  *
  * Spark-first: one full-outer shuffle join on the composite key; the
  * classification is a null-safe (`<=>`) projection. The action frame
  * feeds a MERGE (Delta) or a rewrite of affected partitions.
  */
object Synchronize {

  /** Classify every key as insert / update / delete / keep /
    * protected. Output: key columns + `action` + local/remote compare
    * columns prefixed `l_` / `r_`.
    */
  def diff(
      local: DataFrame,
      remote: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      noUpdateCol: Option[String] = None
  ): DataFrame = {
    val lPrefixed = (compareCols ++ noUpdateCol.toSeq)
      .foldLeft(local)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withColumn("l_present", lit(true))
    val rPrefixed = compareCols
      .foldLeft(remote)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withColumn("r_present", lit(true))
    val joined = lPrefixed.join(rPrefixed, keyCols, "full_outer")
    val changed = compareCols
      .map(c => !(col(s"l_$c") <=> col(s"r_$c")))
      .reduce(_ || _)
    val protectedFlag = noUpdateCol
      .map(c => coalesce(col(s"l_$c"), lit(false)))
      .getOrElse(lit(false))
    joined
      .withColumn(
        "action",
        when(col("l_present").isNull, lit("insert"))
          .when(col("r_present").isNull, when(protectedFlag, lit("protected")).otherwise(lit("delete")))
          .when(changed, when(protectedFlag, lit("protected")).otherwise(lit("update")))
          .otherwise(lit("keep"))
      )
      .drop("l_present", "r_present")
  }

  /** Remote-wins post-state: remote rows, except that protected local
    * rows keep their local values and locally-protected deletes
    * survive.
    */
  def resolve(
      local: DataFrame,
      remote: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      noUpdateCol: String
  ): DataFrame = {
    val d = diff(local, remote, keyCols, compareCols, Some(noUpdateCol))
    val takeLocal = col("action") === "protected"
    val kept = d.filter(col("action") =!= "delete")
    val resolved = compareCols.foldLeft(kept) { (df, c) =>
      df.withColumn(c, when(takeLocal, col(s"l_$c")).otherwise(col(s"r_$c")))
    }
    resolved.select((keyCols ++ compareCols).map(col) :+ col("action"): _*)
  }
}
