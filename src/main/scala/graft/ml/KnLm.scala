package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language model, self-trained on a
  * corpus and used to score per-document perplexity — the CCNet-style
  * LM quality filter (perplexity terciles decide head/middle/tail
  * treatment of a crawl). The count tables mirror what q_kn_counts /
  * q_ngram_orders derive; this operator closes the loop from counts to
  * an actual document score.
  *
  * Model (absolute discount D = 0.75, the standard KN default):
  *
  *   P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1·)
  *            + (D · N1+(w1·) / c(w1·)) · N1+(·w2) / N_types
  *
  * where c(w1·) is the context total, N1+(w1·)/N1+(·w2) are the
  * forward/backward continuation type counts, and N_types is the
  * number of distinct bigrams. Because the model is trained on the
  * corpus it scores, every scored bigram has c ≥ 1 — no zero
  * probabilities and no OOV branch, which keeps the oracle SQL an
  * exact mirror.
  *
  * Scale: the corpus shuffles ONCE on the bigram key to build counts;
  * the context and continuation tables are vocabulary-sized aggregates
  * OF the count table (never a corpus rescan) and broadcast back; the
  * scoring join is (w1, w2)-keyed — corpus-sized on one side,
  * bigram-type-sized on the other, the standard distributed LM-scoring
  * shape. The model DataFrame is a pure function of the corpus and can
  * be parquet-persisted and reused across scoring batches exactly like
  * [[Dedup.buildBandIndex]].
  */
object KnLm {

  val Discount = 0.75

  /** (doc_id, w1, w2) — one row per bigram OCCURRENCE, document order
    * preserved only in multiplicity (scoring needs the multiset, not
    * positions).
    */
  def docBigrams(docs: DataFrame, idCol: String, toksCol: Column): DataFrame =
    docs
      .select(col(idCol), toksCol.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        col(idCol),
        explode(
          expr(
            "transform(sequence(1, size(toks) - 1), " +
              "i -> struct(toks[i-1] as w1, toks[i] as w2))"
          )
        ).as("g")
      )
      .select(col(idCol), col("g.w1"), col("g.w2"))

  /** Bigram model table: (w1, w2, logp). One corpus shuffle; the two
    * marginal tables broadcast (vocabulary-sized by construction).
    */
  def bigramLogProbs(bigrams: DataFrame): DataFrame = {
    val counts = bigrams
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds ctx, cont, the type count, and the model join
    val ctx = counts
      .groupBy(col("w1"))
      .agg(sum(col("c")).as("ctx_c"), count(lit(1)).as("fwd_types"))
    val cont = counts
      .groupBy(col("w2"))
      .agg(count(lit(1)).as("back_types"))
    val nTypes = counts.count().toDouble // scalar of the model table, not the corpus
    counts
      .join(broadcast(ctx), Seq("w1"))
      .join(broadcast(cont), Seq("w2"))
      .select(
        col("w1"),
        col("w2"),
        log(
          (greatest(col("c") - lit(Discount), lit(0.0))
            + lit(Discount) * col("fwd_types") * col("back_types") / lit(nTypes))
            / col("ctx_c")
        ).as("logp")
      )
  }

  /** Per-doc perplexity over the model: exp(-mean logp), rounded to 4
    * decimals for cross-engine float parity (the rounding also makes
    * the downstream tercile thresholds engine-exact: both engines
    * compute them over identical rounded inputs).
    */
  def perplexity(bigrams: DataFrame, model: DataFrame, idCol: String): DataFrame =
    bigrams
      .join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("logp"))), 4).as("ppl")
      )
}
