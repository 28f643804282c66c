package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed dense global rank — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))`.
  *
  * The CRUD gates (AddDiscrete, Boreholes, AdminOps, RasterIngest)
  * assign sequential ids above `max(existing)` in a deterministic
  * order — the reference does this one row at a time against a
  * Postgres sequence (`R/addNewDiscrete.R`, `R/insertACBorehole.R` in
  * YukonWRB/AquaCache). An unpartitioned window computes the same
  * rank but collapses the whole batch into one task; fine for a
  * manual insert, a serialization wall for a bulk backfill.
  *
  * Shape here: range-repartition on the sort keys (equal keys land in
  * one partition, partitions are globally ordered), rank within each
  * partition, then add per-partition row-count offsets. The offsets
  * are a partition-count-sized collect — bounded by the shuffle
  * parallelism, never by the data. `localCheckpoint` pins the
  * partition layout so the count job and the rank job see the same
  * `spark_partition_id`. Global rank identity: every row in an
  * earlier range partition sorts strictly before (or ties within the
  * same partition), so offset + intra-partition row_number == the
  * global row_number over the same ordering.
  */
object SeqIds {

  /** `outCol` = max(existing.idCol) + 1-based rank of `batch` under
    * `sortCols` — THE audited code path for every max-id+1 seeding
    * gate in the library (CatalogOps, ImportProfiles, AddDiscrete,
    * Boreholes, AdminOps, RasterIngest, ImageIngest).
    *
    * SINGLE-WRITER ASSUMPTION: max-id+1 seeding is only correct when
    * one writer at a time appends to the target table — exactly the
    * reference's semantics, where every id is drawn from a Postgres
    * sequence inside one transaction per R session. Two concurrent
    * batch writers would both read the same max and mint colliding
    * ids. At cluster scale, either serialize these CRUD jobs (they are
    * dimension-sized maintenance ops, not data-path operators) or
    * replace this seam with an external id allocator; the data-path
    * operators never call it.
    *
    * Lazy by construction — the max aggregate rides the batch's plan
    * as a broadcast cross join (no driver round trip), so callers that
    * chain several seeded upserts pay zero extra Spark jobs.
    */
  def assignIdsAbove(
      existing: DataFrame,
      idCol: String,
      batch: DataFrame,
      sortCols: Seq[Column],
      outCol: String,
      smallBatch: Boolean = false
  ): DataFrame = {
    val maxId = existing.agg(coalesce(max(col(idCol)), lit(0L)).cast("long").as("__max_id"))
    globalRank(batch, sortCols, "__seq", smallBatch)
      .crossJoin(broadcast(maxId))
      .withColumn(outCol, col("__max_id") + col("__seq"))
      .drop("__max_id", "__seq")
  }

  /** Adds `outCol` = 1-based dense global rank of `df` rows under
    * `sortCols`. Deterministic when the sort key is unique (all CRUD
    * callers rank on a unique natural/batch key).
    *
    * `smallBatch = true` is the documented escape hatch for batches
    * BOUNDED BY CONSTRUCTION (manual CRUD uploads, profile key sets —
    * dimension-sized by definition): one coalesced partition and a
    * plain window, skipping the range-sampling job + checkpoint the
    * distributed path pays. Never set it on a data-sized frame — that
    * is exactly the serialization wall described above.
    */
  def globalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      outCol: String,
      smallBatch: Boolean = false
  ): DataFrame = {
    if (smallBatch) {
      val w = Window.partitionBy(lit(1)).orderBy(sortCols: _*)
      return df.coalesce(1).withColumn(outCol, row_number().over(w).cast("long"))
    }
    val staged = df
      .repartitionByRange(sortCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = staged
      .groupBy(col("__gr_pid"))
      .agg(count(lit(1)).as("__gr_n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty) {
      // empty batch: rank column exists, no rows carry it
      staged.withColumn(outCol, lit(0L)).drop("__gr_pid")
    } else {
      var running = 0L
      val offsets = counts.map { case (pid, n) =>
        val o = running; running += n; (pid, o)
      }.toSeq
      val spark = staged.sparkSession
      import spark.implicits._
      val offDf = broadcast(offsets.toDF("__gr_pid", "__gr_off"))
      val w = Window.partitionBy(col("__gr_pid")).orderBy(sortCols: _*)
      staged
        .join(offDf, Seq("__gr_pid"))
        .withColumn(outCol, col("__gr_off") + row_number().over(w))
        .drop("__gr_pid", "__gr_off")
    }
  }
}
