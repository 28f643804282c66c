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

  /** Weighted mixture sampling by largest-remainder apportionment
    * (Hamilton's method): split an exact `targetN`-document budget
    * across sources proportionally to integer weights, then pick each
    * source's quota deterministically by content-hash rank.
    *
    * Pure integer arithmetic end-to-end — `quota_s = floor(targetN *
    * w_s / W) (+1 for the largest targetN*w_s mod W remainders,
    * source-name tie-break)` — so the same mixture falls out on every
    * engine, run and partitioning; no float rates, no randomness.
    * Sources absent from `weights` (or weighted 0) are excluded. A
    * source with fewer rows than its quota contributes everything it
    * has (the shortfall is NOT redistributed — mixture weights are a
    * contract, not a fill target).
    *
    * Scale: weights/quotas live on a dimension-sized frame (one row
    * per source) — windows over it are trivial; the corpus pass is one
    * broadcast join of the quota table plus a per-source rank window,
    * i.e. a single shuffle on the source key that any mixture job
    * needs anyway.
    */
  def weightedQuota(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      weights: Seq[(String, Int)],
      targetN: Long
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    require(weights.map(_._1).distinct.size == weights.size, "duplicate source in weights")
    val spark = df.sparkSession
    val totalW = weights.map(_._2.toLong).sum
    import org.apache.spark.sql.expressions.Window
    // Hamilton apportionment over the weights Seq — it is driver data
    // already, so the base/remainder/leftover arithmetic runs in plain
    // Scala (no global window; all-integer, deterministic ties by
    // source name)
    val apportioned = weights.map { case (s, wt) =>
      val num = BigInt(targetN) * wt // BigInt: targetN * wt can exceed Long
      (s, (num / totalW).toLong, num % totalW)
    }
    val leftover = targetN - apportioned.map(_._2).sum
    val topUp = apportioned
      .sortBy { case (s, _, rem) => (-rem, s) }
      .take(leftover.toInt)
      .map(_._1)
      .toSet
    val quotaRows = apportioned.map { case (s, base, _) =>
      (s, base + (if (topUp(s)) 1L else 0L))
    }
    val quotas = spark.createDataFrame(quotaRows).toDF(sourceCol, "quota")
    val rk = row_number().over(
      Window
        .partitionBy(col(sourceCol))
        .orderBy(PortableHash.md5num56(col(keyCol).cast("string")), col(keyCol))
    )
    df.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("rk", rk)
      .filter(col("rk") <= col("quota"))
  }

  /** Temperature-balanced mixture (α = 0.5): per-source quotas
    * proportional to sqrt(source size) — the standard multilingual
    * re-balancing that up-weights small sources without letting any
    * head source dominate. Cross-engine exactness: IEEE sqrt is
    * correctly rounded on both engines, so `round(sqrt(n) · 10⁶)`
    * yields identical INTEGER weights, and from there the Hamilton
    * apportionment and the content-hash rank fill are the same
    * all-integer discipline as [[weightedQuota]]. An over-subscribed
    * source contributes everything it has (rk ≤ quota); quotas are
    * not reallocated.
    *
    * Scale: the weight table is one row per source (collected
    * driver-side like every quota table here); the corpus pass is one
    * broadcast quota join + a per-source rank window.
    */
  def temperatureQuota(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      targetN: Long
  ): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    // BigInt apportionment: targetN * wt (wt ~ 1e6 * sqrt(n)) overflows
    // Long for large corpora/targets; an empty input short-circuits
    // rather than dividing by a zero total weight.
    val weighted =
      counts.map { case (s, n) => (s, BigInt(math.round(math.sqrt(n.toDouble) * 1e6))) }
    val totalW = weighted.map(_._2).sum
    val apportioned =
      if (totalW == 0) Array.empty[(String, Long, BigInt)]
      else
        weighted.map { case (s, wt) =>
          val num = BigInt(targetN) * wt
          (s, (num / totalW).toLong, num % totalW)
        }
    val leftover = targetN - apportioned.map(_._2).sum
    val topUp = apportioned
      .sortBy { case (s, _, rem) => (-rem, s) }
      .take(leftover.toInt)
      .map(_._1)
      .toSet
    val quotaRows = apportioned.toSeq.map { case (s, base, _) =>
      (s, base + (if (topUp(s)) 1L else 0L))
    }
    val quotas = spark.createDataFrame(quotaRows).toDF(sourceCol, "quota")
    val rk = row_number().over(
      Window
        .partitionBy(col(sourceCol))
        .orderBy(PortableHash.md5num56(col(keyCol).cast("string")), col(keyCol))
    )
    df.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("rk", rk)
      .filter(col("rk") <= col("quota"))
  }

  /** Deterministic epoch shuffle: the seeded global permutation a
    * training run consumes the corpus in. Each key hashes (with the
    * epoch seed) to a pseudo-random 56-bit rank; shard = hash mod
    * nShards, position = rank within the shard by (hash, key). A
    * different seed yields an independent permutation — re-shuffling
    * between epochs is a constant change, never a data move.
    *
    * Scale: no global sort anywhere. The only shuffle is on the shard
    * key, and the per-shard rank window is bounded by corpus/nShards —
    * pick nShards so a shard is one output file (the same discipline
    * as [[graft.jobs.CorpusExport]]'s packer, whose shards this
    * ordering feeds). A global `ORDER BY hash` would range-partition
    * the whole corpus for an ordering no consumer needs globally:
    * readers consume per-shard files anyway.
    */
  def epochShuffle(
      df: DataFrame,
      keyCol: String,
      seed: String,
      nShards: Int
  ): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = PortableHash.md5num56(concat(lit(s"$seed:"), col(keyCol).cast("string")))
    df.select(col(keyCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn(
        "pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("h"), col(keyCol)))
      )
      .select(col(keyCol), col("shard"), col("pos"))
  }
}
