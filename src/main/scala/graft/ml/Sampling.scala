package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deterministic content-hash sampling for corpus subsetting: a row is
  * kept when `hash(key) mod denominator < numerator`. Unlike
  * `df.sample()`, the decision is a pure function of the KEY — stable
  * across runs, partitionings and engines (reproducible train/eval
  * splits; the same document always lands in the same split).
  */
object Sampling {

  def bucketOf(key: Column, denominator: Int): Column =
    pmod(PortableHash.md5num56(key), lit(denominator))

  /** Keep keys whose hash bucket < numerator (rate = num/denom). */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      numerator: Int,
      denominator: Int
  ): DataFrame =
    df.filter(bucketOf(col(keyCol), denominator) < numerator)

  /** Disjoint named splits, e.g. Seq(("train", 8), ("eval", 1),
    * ("test", 1)) — adds a `split` column.
    */
  def splits(df: DataFrame, keyCol: String, parts: Seq[(String, Int)]): DataFrame = {
    val denom = parts.map(_._2).sum
    val bucket = bucketOf(col(keyCol), denom)
    val (_, chain) = parts.foldLeft((0, lit(null).cast("string"))) {
      case ((offset, acc), (name, width)) =>
        val cond = bucket >= offset && bucket < offset + width
        (offset + width, when(cond, lit(name)).otherwise(acc))
    }
    df.withColumn("split", chain)
  }
}
