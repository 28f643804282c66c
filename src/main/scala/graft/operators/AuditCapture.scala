package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Audit capture WRITE path — produces the rows that
  * [[AuditAsOf.snapshotAt]] later reads, closing the time-travel loop.
  *
  * Reference: `audit.general_log` stores (table, row id, action I/U/D,
  * original_data / new_data JSONB, changed_fields text[], action
  * timestamp) captured by row triggers (`audit.if_modified_func`,
  * `inst/patches/patch_37.R:2434-2449,2782+` in YukonWRB/AquaCache);
  * high-volume tables get KEYED logs with typed OLD columns
  * (`:2565-2578`) — exactly the shape the as-of reconstruction wants.
  *
  * Spark-first: a lake table has no row triggers; capture is a
  * null-safe full-outer DIFF of the pre- and post-batch states (or of
  * `target` vs `Upsert(target, …)` output), one shuffle on the row
  * key — the same key the table is bucketed by, so co-located.
  */
object AuditCapture {

  private def nsEq(a: Column, b: Column): Column = a <=> b

  /** General-log-shaped diff: one row per inserted ('I'), updated
    * ('U') or deleted ('D') row id; unchanged rows emit nothing.
    */
  def capture(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      payloadCols: Seq[String],
      actionTs: String,
      tableName: String
  ): DataFrame = {
    val b = before.select((idCol +: payloadCols).map(c => col(c).as(s"b_$c")): _*)
    val a = after.select((idCol +: payloadCols).map(c => col(c).as(s"a_$c")): _*)
    val joined = b.join(a, col(s"b_$idCol") === col(s"a_$idCol"), "full_outer")
    val inBefore = col(s"b_$idCol").isNotNull
    val inAfter = col(s"a_$idCol").isNotNull
    val anyDiff = payloadCols.map(c => !nsEq(col(s"b_$c"), col(s"a_$c"))).reduce(_ || _)
    val changed = array_compact(
      array(payloadCols.map(c => when(!nsEq(col(s"b_$c"), col(s"a_$c")), lit(c))): _*)
    )
    val oldJson = to_json(struct(payloadCols.map(c => col(s"b_$c").as(c)): _*))
    val newJson = to_json(struct(payloadCols.map(c => col(s"a_$c").as(c)): _*))
    joined
      .withColumn(
        "action",
        when(!inBefore, lit("I"))
          .when(!inAfter, lit("D"))
          .when(anyDiff, lit("U"))
      )
      .filter(col("action").isNotNull)
      .select(
        lit(tableName).as("table_name"),
        coalesce(col(s"b_$idCol"), col(s"a_$idCol")).as(idCol),
        col("action"),
        when(inBefore, oldJson).as("original_data"),
        when(inAfter, newJson).as("new_data"),
        when(col("action") === "U", changed).as("changed_fields"),
        lit(actionTs).cast("timestamp").as("action_ts")
      )
  }

  /** Keyed typed log rows for [[AuditAsOf.snapshotAt]]: the OLD
    * payload of every UPDATE/DELETE (inserts are reconstructed from
    * the current table + `created`, so 'I' emits nothing — the
    * reference's capture does the same, patch_43.R:684-728).
    */
  def toAsOfLog(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      payloadCols: Seq[String],
      createdCol: String,
      actionTs: String
  ): DataFrame = {
    val b = before.select((idCol +: payloadCols :+ createdCol).map(c => col(c).as(s"b_$c")): _*)
    val a = after.select((idCol +: payloadCols).map(c => col(c).as(s"a_$c")): _*)
    val joined = b.join(a, col(s"b_$idCol") === col(s"a_$idCol"), "left_outer")
    val inAfter = col(s"a_$idCol").isNotNull
    val anyDiff = payloadCols.map(c => !nsEq(col(s"b_$c"), col(s"a_$c"))).reduce(_ || _)
    joined
      .withColumn(
        "action",
        when(!inAfter, lit("D")).when(anyDiff, lit("U"))
      )
      .filter(col("action").isNotNull)
      .select(
        col(s"b_$idCol").as(idCol) +:
          payloadCols.map(c => col(s"b_$c").as(c)) :+
          col(s"b_$createdCol").as(createdCol) :+
          lit(actionTs).cast("timestamp").as("action_ts") :+
          col("action"): _*
      )
  }
}
