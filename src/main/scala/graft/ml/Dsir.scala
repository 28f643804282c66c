package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Data Selection via Importance Resampling (DSIR): pick the raw-corpus
  * documents whose hashed-n-gram distribution looks most like a small
  * target corpus (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling").
  *
  * Shape at scale (the reason this is three corpus passes, not one):
  *   1. featurize   — unigrams + bigrams hashed into [[Buckets]]
  *                    buckets; a codegen'd projection + explode, no
  *                    joins (at 100 TB you persist this frame once).
  *   2. fit         — two bucket-count aggregations (target and
  *                    source), each map-side combined down to at most
  *                    [[Buckets]] rows; the smoothed log-ratio table
  *                    is dimension-sized BY CONSTRUCTION (<= 4096
  *                    rows), so scoring never shuffles it.
  *   3. score       — broadcast-join the ratio table onto the
  *                    featurized corpus and sum per document: ONE
  *                    corpus shuffle, keyed by doc.
  *
  * Everything is chosen for oracle parity with DuckDB: the portable
  * md5 bucket hash, integer bucket counts, Laplace smoothing with
  * exact integer totals, and a final round-to-4-decimals rank key
  * with doc-id tie-break (the same discipline the ANN queries use).
  */
object Dsir {

  /** Feature space size. Small enough that the fitted log-ratio table
    * always broadcasts; large enough that hash collisions stay rare
    * for n-gram vocabularies (the paper uses 10^4; 2^12 keeps the
    * bucket arithmetic exact in both engines).
    */
  val Buckets = 4096

  private def bucket(gram: Column): Column =
    pmod(PortableHash.md5num28(gram), lit(Buckets))

  /** `(id, bucket)` — one row per hashed unigram/bigram occurrence.
    * Bigrams guard the `size == 1` case explicitly: Spark's
    * `sequence(1, 0)` is a DESCENDING sequence, not empty.
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(
        col("id"),
        explode(
          concat(
            col("toks"),
            expr(
              "IF(size(toks) >= 2, " +
                "transform(sequence(1, size(toks) - 1), " +
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))), " +
                "array())"
            )
          )
        ).as("gram")
      )
      .select(col("id"), bucket(col("gram")).as("bucket"))

  /** Laplace-smoothed per-bucket log importance ratio
    * `ln p_target(b) - ln q_source(b)` over every bucket the SOURCE
    * saw (the scoring join is on source-derived features, so
    * source-side coverage is complete by construction). Output is
    * <= [[Buckets]] rows — always broadcastable.
    */
  def bucketLogRatio(feats: DataFrame, isTarget: Column, alpha: Double = 1.0): DataFrame =
    fit(feats, isTarget, alpha).table

  /** A fitted importance model: the bucket log-ratio table plus the
    * Laplace default for buckets the fit corpus never saw — an
    * incoming batch can contain novel buckets, and a screen must
    * score them as `ln(alpha/(pTot+alpha*B)) - ln(alpha/(qTot+alpha*B))`
    * rather than silently dropping their mass.
    */
  final case class RatioModel(table: DataFrame, defaultR: Double)

  /** Fit on one corpus, keep the model for screening others — the
    * deployment shape: fit once on the curated corpus, screen every
    * incoming crawl batch against the (persistable, <= [[Buckets]]
    * rows) table.
    */
  def fit(feats: DataFrame, isTarget: Column, alpha: Double = 1.0): RatioModel = {
    val tgt = feats.filter(isTarget).groupBy("bucket").agg(count(lit(1)).as("pc"))
    val src = feats.groupBy("bucket").agg(count(lit(1)).as("qc"))
    // both exact integer totals in ONE action — separate tgt/src
    // aggregates would re-run the featurization twice more for
    // un-checkpointed callers
    val totals = feats
      .agg(count(lit(1)).as("q"), count(when(isTarget, lit(1))).as("p"))
      .head()
    val qTot = totals.getLong(0)
    val pTot = totals.getLong(1)
    val table = src
      .join(tgt, Seq("bucket"), "left")
      .select(
        col("bucket"),
        (log((coalesce(col("pc"), lit(0L)) + alpha) / (pTot + alpha * Buckets))
          - log((col("qc") + alpha) / (qTot + alpha * Buckets))).as("r")
      )
    val defaultR =
      math.log(alpha / (pTot + alpha * Buckets)) - math.log(alpha / (qTot + alpha * Buckets))
    RatioModel(table, defaultR)
  }

  /** Score a (possibly disjoint) featurized batch against a fitted
    * model: novel buckets take the model's Laplace default. Same
    * one-broadcast-join-one-shuffle shape as [[score]].
    */
  def screenScore(feats: DataFrame, model: RatioModel): DataFrame =
    feats
      .join(broadcast(model.table), Seq("bucket"), "left")
      .groupBy("id")
      .agg(
        sum(coalesce(col("r"), lit(model.defaultR))).as("log_w"),
        count(lit(1)).as("n_feats")
      )
      .select(col("id"), col("n_feats"), (col("log_w") / col("n_feats")).as("score"))

  /** Per-document importance: length-normalized sum of bucket
    * log-ratios (`log_w / n_feats` — the per-token log-likelihood
    * ratio, so long documents aren't favored by raw mass). One
    * broadcast join + one doc-keyed shuffle.
    */
  def score(feats: DataFrame, ratio: DataFrame): DataFrame =
    feats
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy("id")
      .agg(sum(col("r")).as("log_w"), count(lit(1)).as("n_feats"))
      .select(col("id"), col("n_feats"), (col("log_w") / col("n_feats")).as("score"))

  /** The full selection: fit on `isTarget` docs, score everything,
    * keep the `k` most target-like (quantized rank key, id
    * tie-break — deterministic across engines and partitionings).
    * `isTarget` is a predicate over the featurized frame's `id`
    * column (e.g. `pmod(col("id"), lit(10)) === 0`).
    */
  def select(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      k: Int
  ): DataFrame = {
    val feats = featurize(docs, idCol, textCol).localCheckpoint(false)
    val ratio = bucketLogRatio(feats, isTarget)
    score(feats, ratio)
      .select(col("id").as(idCol), col("n_feats"), round(col("score"), 4).as("score_r"))
      .orderBy(col("score_r").desc, col(idCol))
      .limit(k)
  }
}
