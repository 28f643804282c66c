package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** fastText-style hashed linear classifier INFERENCE (Joulin et al.
  * 2017) — the model-based quality-filter shape modern pipelines run
  * over every document (CCNet's fastText LM filter, FineWeb-Edu's
  * educational-quality classifier): hash unigram+bigram features into
  * a fixed bucket space, sum per-bucket weights, threshold the logit.
  *
  * Shape at scale: explode hashed features into a flat codegen'd
  * projection and sum per doc with map-side combine — one corpus
  * shuffle keyed by doc, the same access pattern as
  * [[Dsir.featurize]]/score (shared 4096-bucket unigram+bigram
  * feature space). See [[score]] for why the shuffle-free array-
  * lambda variant loses despite doing no shuffle.
  *
  * The weight table here is a deterministic affine function of the
  * bucket id — a frozen synthetic model that both engines can compute
  * exactly (integer micro-units, so the per-doc sum is order-free). A
  * production deployment swaps `weightMicro` for a broadcast float
  * array lookup; every other operator stays identical.
  */
object HashedClassifier {

  /** Same bucket count as [[Dsir.Buckets]] — shared feature space. */
  val Buckets = 4096

  /** Affine pseudo-weights in micro-units, range [-1000, 1000]:
    * `(bucket * 1103515245 + 12345) mod 2001 - 1000`. The product is
    * < 2^52, exact in signed 64-bit on both engines; bucket >= 0 keeps
    * the `mod` non-negative under both engines' semantics.
    */
  def weightMicro(bucket: Column): Column =
    (bucket * lit(1103515245L) + lit(12345L)) % lit(2001L) - lit(1000L)

  /** Unigram + space-joined-bigram feature array of a token array.
    * The `size >= 2` guard matters: Spark's `sequence(1, 0)` is
    * DESCENDING, not empty.
    */
  def features(toks: Column): Column =
    concat(
      toks,
      when(
        size(toks) >= 2,
        transform(
          sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))
        )
      ).otherwise(expr("array()").cast("array<string>"))
    )

  /** `(doc_id, n_feat, logit_micro, label)` — per-document logit as an
    * exact integer sum of hashed-feature weights; label is the
    * positive-logit decision.
    *
    * Shape: explode features, hash+weight in a flat (whole-stage
    * codegen'd) projection, sum with map-side combine — ONE corpus
    * shuffle keyed by doc, then a left join back so token-less docs
    * surface with a zero logit. The tempting "zero-shuffle" variant
    * (per-row array lambdas over `features`) measured ~10x slower:
    * Spark evaluates higher-order-function lambdas interpreted,
    * outside codegen, so millions of in-lambda md5 calls dominate.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("doc_id"), explode(features(TextStats.tokens(col(textCol)))).as("g"))
      .select(
        col("doc_id"),
        weightMicro(pmod(PortableHash.md5num28(col("g")), lit(Buckets))).as("w")
      )
    val agg = exploded
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"), sum(col("w")).as("logit_micro"))
    docs
      .select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("logit_micro"), lit(0L)).as("logit_micro"),
        (coalesce(col("logit_micro"), lit(0L)) > 0).as("label")
      )
  }
}
