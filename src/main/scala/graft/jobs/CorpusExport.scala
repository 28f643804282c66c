package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.ml.TextStats

/** Training-shard export — the WRITE end of the corpus pipeline
  * (filter -> pack -> ship): selected documents are sharded by
  * portable id-hash, bin-packed to a token budget per shard
  * (prefix-sum bucketing, the q_seq_packing discipline), and written
  * as parquet partitioned by `shard` with one file per shard so a
  * trainer reads each shard as one sequential stream.
  *
  * Scale shape: one shuffle on the shard key (the partitionBy write
  * needs it anyway), per-shard windows for the running token count,
  * `maxRecordsPerFile`-free single-file-per-shard via repartition on
  * the partition column — no global sort, shards pack and write
  * independently, which is exactly how training shards are produced
  * at 100 TB.
  */
object CorpusExport {

  final case class ExportResult(manifest: DataFrame, outPath: String)

  /** Pack `docs` (idCol, textCol) into `nShards` shards of
    * `binTokens`-token bins and write parquet partitioned by shard.
    * Returns the per-shard manifest (doc/bin/token counts) — the
    * artifact a training job consumes to plan its data order.
    */
  /** The pure pack plan — shard / bin / pos assignment with no write:
    * (shard, bin, pos, idCol, n_bpe, textCol). Exposed so the
    * oracle-checked q_shard_manifest query and [[writeShards]] share
    * one packing discipline (the q_seq_packing prefix-sum).
    */
  def packPlan(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int = 8,
      binTokens: Long = 4096L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0 && binTokens > 0)
    val keyed = docs.select(
      col(idCol),
      col(textCol),
      TextStats.bpeishTokenCount(col(textCol)).as("n_bpe"),
      pmod(PortableHash.md5num56(col(idCol).cast("string")), lit(nShards)).as("shard"),
      PortableHash.md5num56(col(idCol).cast("string")).as("h")
    )
    val order = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    val before = sum(col("n_bpe")).over(order.rowsBetween(Window.unboundedPreceding, -1))
    keyed
      .withColumn("bin", (coalesce(before, lit(0L)) / binTokens).cast("bigint"))
      .withColumn("pos", row_number().over(Window.partitionBy(col("shard"), col("bin")).orderBy(col("h"), col(idCol))))
      .select(col("shard"), col("bin"), col("pos"), col(idCol), col("n_bpe"), col(textCol))
  }

  /** Per-shard manifest (doc/bin/token counts) of a pack plan. */
  def manifest(packed: DataFrame): DataFrame =
    packed
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("bin")).as("n_bins"),
        sum(col("n_bpe")).as("n_tokens")
      )
      .orderBy(col("shard"))

  def writeShards(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outPath: String,
      nShards: Int = 8,
      binTokens: Long = 4096L
  ): ExportResult = {
    packPlan(docs, idCol, textCol, nShards, binTokens)
      .repartition(col("shard")) // one task -> one file per shard dir
      .sortWithinPartitions(col("bin"), col("pos"))
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .parquet(outPath)
    // manifest from the WRITTEN files, not the plan — it doubles as a
    // read-back validation of the export
    ExportResult(manifest(spark.read.parquet(outPath)), outPath)
  }
}
