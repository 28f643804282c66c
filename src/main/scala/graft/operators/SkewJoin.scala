package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * splits oversized partitions at runtime and is the first line of
  * defense; these operators cover the cases AQE cannot: a single hot
  * KEY (AQE can split a partition but the hot key still hashes to one
  * task in a sort-merge join's stream side) and skewed aggregation
  * with expensive per-group state.
  *
  * Salting trades a `numSalts`-way replication of the small side for
  * an even spread of the hot key's rows — the classic trick the
  * reference never needs single-node (PostgreSQL, ~457k rows) but a
  * 100 TB measurement table with one pathological sensor absolutely
  * does.
  */
object SkewJoin {

  /** Deterministic row salt: hash of all columns mod numSalts — rows
    * of the SAME key scatter across salts (that's the point), and the
    * assignment is reproducible run-to-run for testability.
    */
  private def rowSalt(df: DataFrame, numSalts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(numSalts))

  /** Salted inner equi-join: every row of `large` gets a salt in
    * [0, numSalts); `small` is replicated numSalts times. The join key
    * becomes (keys..., salt), so one hot key spreads over numSalts
    * shuffle partitions. Result set identical to the plain join.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      numSalts: Int
  ): DataFrame = {
    val salted = large.withColumn("__salt", rowSalt(large, numSalts))
    val replicated = small.withColumn(
      "__salt",
      explode(array((0 until numSalts).map(lit): _*))
    )
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Hot-key-only salting: detect keys whose row count exceeds
    * `hotThreshold` (one cheap pre-aggregation — at scale, run it on a
    * sample), then salt ONLY those keys; cold keys join unsalted and
    * the small side is replicated only for the hot-key subset. This
    * keeps the replication cost proportional to the skew, not the
    * dimension size.
    */
  def skewAwareJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      hotThreshold: Long
  ): DataFrame = {
    val keyCols = keys.map(col)
    val hot = large
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotThreshold)
      .select(keyCols: _*)
    val largeFlagged = large.join(broadcast(hot.withColumn("__hot", lit(true))), keys, "left")
    val hotLarge = largeFlagged.filter(col("__hot").isNotNull).drop("__hot")
    val coldLarge = largeFlagged.filter(col("__hot").isNull).drop("__hot")
    val smallFlagged = small.join(broadcast(hot.withColumn("__hot", lit(true))), keys, "left")
    val hotSmall = smallFlagged.filter(col("__hot").isNotNull).drop("__hot")
    val coldSmall = smallFlagged.filter(col("__hot").isNull).drop("__hot")
    saltedJoin(hotLarge, hotSmall, keys, numSalts)
      .unionByName(coldLarge.join(coldSmall, keys))
  }

  /** Salted two-phase aggregation for algebraic aggregates: partial
    * aggregate on (keys..., salt), then final aggregate on keys. For
    * sum/count/min/max Spark's own hash aggregate already does
    * map-side partials — this shape matters when the partial itself is
    * expensive or the reduce side would see one giant group (e.g.
    * collect-heavy or distinct-ish states).
    *
    * `partial` aggregates raw rows per (keys, salt); `merge` combines
    * the per-salt partials per key. Caller guarantees
    * merge(partial(s1) ++ partial(s2)) == aggregate(s1 ++ s2).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      partial: Seq[Column],
      merge: Seq[Column]
  ): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", rowSalt(df, numSalts))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(merge.head, merge.tail: _*)
  }
}
