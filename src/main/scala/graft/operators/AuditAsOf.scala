package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (`*_as_of`) reconstruction from an UPDATE/DELETE
  * audit log.
  *
  * Reference semantics (`audit.measurements_continuous_as_of`,
  * `inst/patches/patch_43.R:684-807` in YukonWRB/AquaCache): the log
  * captures only UPDATE/DELETE (each entry carries the row's OLD
  * payload); inserts are reconstructed from the current table plus the
  * row's `created` stamp. The state of a row at time T is the old
  * payload of the EARLIEST log entry with `action_ts > T` (`DISTINCT
  * ON … ORDER BY action_timestamp`, `:743-759`), falling back to the
  * current row; rows with `created > T` did not exist yet.
  *
  * Spark-first: one union + one row_number window on the row key —
  * both sides partition on `idCol`. The audit log is append-only; at
  * scale, partition it by action month so the `action_ts > T` filter
  * prunes partitions.
  *
  * @param current columns: idCol ++ payloadCols ++ created
  * @param log     columns: idCol ++ payloadCols (OLD values) ++
  *                created ++ action_ts ++ action ('U'/'D')
  */
object AuditAsOf {

  def snapshotAt(
      current: DataFrame,
      log: DataFrame,
      idCol: String,
      payloadCols: Seq[String],
      asOfTs: String // 'yyyy-MM-dd HH:mm:ss' UTC
  ): DataFrame = {
    val t = lit(asOfTs).cast("timestamp")
    val cur = current
      .select((idCol +: payloadCols :+ "created").map(col): _*)
      .withColumn("ord_us", lit(Long.MaxValue))
    val logged = log
      .filter(col("action_ts") > t)
      .select((idCol +: payloadCols :+ "created").map(col) :+ unix_micros(col("action_ts")).as("ord_us"): _*)
    // payload tiebreak after ord_us: two capture batches stamped with
    // the same microsecond would otherwise leave the rn=1 pick
    // scan-order-dependent (retry-unstable on a real cluster)
    val w = Window
      .partitionBy(col(idCol))
      .orderBy(col("ord_us") +: payloadCols.map(col) :+ col("created"): _*)
    cur
      .unionByName(logged)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("created") <= t)
      .drop("rn", "ord_us")
  }
}
