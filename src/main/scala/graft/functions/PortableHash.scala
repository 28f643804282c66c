package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 56-bit deterministic string hash computed identically by Spark and
  * DuckDB: the first 14 hex digits of md5, read as an integer. Used
  * wherever a hash participates in ORACLE-CHECKED results (MinHash,
  * SimHash, fingerprints). 56 bits always fit a positive BIGINT in
  * both engines.
  *
  * Production swap-in: `xxhash64(seed, col)` (Spark-native, codegen,
  * no hex round-trip) — same operator shapes, different hash family;
  * see graft.ml.Dedup.HashFamily.
  */
object PortableHash {

  /** Spark side: conv(substr(md5(x),1,14), 16, 10)::long */
  def md5num56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** DuckDB-side fragment for oracle SQL (same value). */
  def md5num56Sql(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 14))::BIGINT"
}
