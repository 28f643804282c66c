package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * At 100 TB these would be partitioned/bucketed Delta tables; here the
  * loaders are a single seam so the storage layout can change without
  * touching operators.
  */
object TestTables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` has shipped in three physical shapes across testdata
    * generations: INT64 epoch-NANOS (readable only with
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in Verify/Bench),
    * parquet TIMESTAMP with isAdjustedToUTC=false (Spark 4 infers
    * TIMESTAMP_NTZ), and a UTC-adjusted TIMESTAMP. Normalize all three
    * to a microsecond TimestampType instant so downstream
    * `unix_micros`/window logic sees one type regardless of which
    * generation of parquet is on disk.
    * ns -> us MUST be exact integer division (`div`, truncating like
    * DuckDB's TIMESTAMP cast): epoch-ns values exceed 2^53, so a
    * double division loses the low microsecond bit.
    * NTZ -> instant via cast is exact under the UTC session timezone
    * (Verify/Bench both set it), matching DuckDB's naive read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  /** `documents` plus the planted multilingual fixture docs — the
    * corpus the Unicode-sensitive text queries run on (mirrors the
    * oracle's `docs_ml` CTE; see [[MultilingualFixtures]]).
    */
  def documentsMl(s: SparkSession, d: String): DataFrame =
    documents(s, d).unionByName(MultilingualFixtures.df(s))
  /** The vector ops (`vec_dot`, IVF/PQ codebooks) are Array[Float]-
    * typed. Like `events.ts`, the physical element type is the
    * driver's choice per regeneration — normalize a double-typed
    * embedding back to float so an upstream shape flip can't break
    * analysis across the whole similarity family.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val raw = t(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(DoubleType, n) =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType, n)))
      case _ => raw
    }
  }
  /** `embeddings` plus the planted degenerate-vector fixtures — the
    * corpus the finite-norm-contract queries run on (mirrors the
    * oracle's `emb_deg` CTE; see [[EmbeddingFixtures]]).
    */
  def embeddingsDeg(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).unionByName(EmbeddingFixtures.df(s))
}
