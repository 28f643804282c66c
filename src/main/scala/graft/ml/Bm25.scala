package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus (Robertson-Sparck Jones
  * probabilistic weighting) — the retrieval primitive a training-data
  * pipeline uses for decontamination lookups, dedup candidate probes
  * and retrieval-based data selection.
  *
  * Shape at scale:
  *   - `postings` is the classic ONE corpus shuffle keyed by
  *     (doc, term) with map-side combine; at 100 TB you persist it
  *     bucketed by term and every later query probes it shuffle-free.
  *   - the query-term table is tiny by construction and BROADCAST onto
  *     the postings — scoring touches only postings rows whose term
  *     appears in some query, i.e. the inverted-index access path.
  *   - per-(query, doc) accumulation is one shuffle keyed by the pair;
  *     top-k is a rank-limited window (WindowGroupLimit pushes the
  *     k-filter into the sort).
  *
  * Oracle parity: IDF uses the RATIONAL form `(N - df + .5)/(df + .5)`
  * with no logarithm — libm `ln` differs across engines, while IEEE
  * `+ - * /` in a fixed shape is bit-identical — and per-term scores
  * are floored into integer micro-units (1e-6) so the per-query SUM is
  * an exact integer, immune to float addition order.
  */
object Bm25 {

  /** BM25 constants, chosen EXACTLY representable in binary floating
    * point (1.25 = 5/4, 0.75 = 3/4): DuckDB parses decimal literals as
    * DECIMAL before widening to DOUBLE, so only exactly-representable
    * constants are guaranteed the same double on both engines. k1=1.25
    * sits inside the standard [1.2, 2.0] tuning range.
    */
  val K1 = 1.25
  val B = 0.75

  /** `(doc_id, tok, tf, dl)` — term frequencies with document length.
    * One corpus pass + one (doc, term) aggregation.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextStats.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("tok"))
    toks
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Per-term BM25 score in integer micro-units. All inputs are exact
    * integers widened to double and every constant is binary-exact, so
    * each intermediate has exactly one IEEE rounding; the op tree
    * (association and parenthesization) is mirrored verbatim in the
    * oracle SQL, making the doubles bit-identical across engines.
    */
  def scoreMicro(tf: Column, df: Column, dl: Column, nDocs: Column, avgdl: Column): Column = {
    val idf = ((nDocs.cast("double") - df.cast("double")) + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    val tfPart = (tf.cast("double") * lit(K1 + 1.0)) /
      (tf.cast("double") + lit(K1) * (lit(1.0 - B) + (lit(B) * dl.cast("double")) / avgdl))
    floor(idf * tfPart * lit(1e6)).cast("long")
  }
}
