package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Sub-document (fine-grained) deduplication: line-level boilerplate
  * stripping and exact duplicate-substring span detection.
  *
  * Complements [[Dedup]] (whole-document near-dup): these operators
  * remove REPEATED PARTS of otherwise-unique documents — navigation
  * chrome / cookie banners repeated across a crawl (line-level, the
  * CCNet preprocessing shape) and verbatim passages long enough to
  * memorize (span-level, the "deduplicating training data" shape of
  * Lee et al. 2022, arXiv:2107.06499 — their suffix-array substring
  * dedup re-expressed as a positional n-gram join, which Spark can
  * shuffle-partition by gram key instead of building a global suffix
  * array).
  *
  * Scale shape (100 TB): both operators shuffle the corpus ONCE on a
  * 56-bit content-hash key (line hash / gram hash) to find repeats,
  * then bring only the repeated keys — a tiny fraction of the corpus
  * by construction — back against the full data. `stripFrequentLines`
  * joins that set back with a broadcast anti join; `duplicatedSpans`
  * keeps the per-doc pass windowed on (doc, pos), i.e. partition-local
  * after one doc-keyed shuffle. Neither ever holds full documents in
  * aggregation state: all grouping is on fixed-width hashes, text
  * stays in the scan until the final projection.
  */
object FineDedup {

  /** Lines whose content-hash appears in at least `minDocs` DISTINCT
    * documents. Input is any "line frame" — one row per (doc, line) —
    * so callers control what a line is (split on '\n' for real text;
    * fixed-width token windows for corpora without line structure).
    *
    * Two-phase df count: distinct (line-hash, doc) pairs first (a
    * map-side-combinable dedup), then a plain count per hash — the
    * same shape as document-frequency in [[Dedup.jaccardNearDups]],
    * avoiding a count_distinct sort-agg over the full line multiset.
    */
  def frequentLines(
      lines: DataFrame,
      idCol: String,
      lineCol: String,
      minDocs: Int
  ): DataFrame =
    lines
      .select(PortableHash.md5num56(col(lineCol)).as("line_hash"), col(idCol))
      .distinct()
      .groupBy(col("line_hash"))
      .agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minDocs)

  /** Drop every line whose content repeats across `minDocs`+ docs.
    * Returns the input frame minus boilerplate lines, original columns
    * preserved. The frequent-line set is df-thresholded and therefore
    * far smaller than the corpus — it is broadcast, so the surviving
    * pass is a scan-local anti join (no second corpus shuffle).
    */
  def stripFrequentLines(
      lines: DataFrame,
      idCol: String,
      lineCol: String,
      minDocs: Int
  ): DataFrame = {
    val freq = frequentLines(lines, idCol, lineCol, minDocs).select(col("line_hash"))
    lines
      .withColumn("line_hash", PortableHash.md5num56(col(lineCol)))
      .join(broadcast(freq), Seq("line_hash"), "left_anti")
      .drop("line_hash")
  }

  /** Apply span cuts to documents: drop every token whose position
    * falls inside one of the doc's spans and re-join the survivors —
    * the masking pass that consumes [[duplicatedSpans]] output (the
    * "deduplicating training data" cut step). Docs with no spans pass
    * through unchanged; a fully-covered doc yields an empty string.
    *
    * Pure projection shape: spans collapse to one array per doc (the
    * span list is tiny — it was df-thresholded upstream), the token
    * filter is an `exists`-free array lambda, so the only shuffle is
    * the doc-keyed span collect.
    *
    * @param spans output of [[duplicatedSpans]]: (idCol, span_start,
    *              span_end, ...) — 1-based inclusive token positions
    */
  def maskSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spans: DataFrame
  ): DataFrame = {
    val spanArr = spans
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("span_start").as("s"), col("span_end").as("e"))))
          .as("__spans")
      )
    docs
      .join(spanArr, Seq(idCol), "left")
      .withColumn("__toks", TextStats.tokens(col(textCol)))
      .select(
        col(idCol),
        when(col("__spans").isNull, col("__toks"))
          .otherwise(
            expr(
              "filter(__toks, (t, i) -> " +
                "size(filter(__spans, sp -> i + 1 >= sp.s AND i + 1 <= sp.e)) = 0)"
            )
          )
          .as("__kept")
      )
      .select(
        col(idCol),
        array_join(col("__kept"), " ").as("masked_text"),
        size(col("__kept")).as("n_kept_tokens")
      )
  }

  /** Merged token spans covered by n-grams that occur in at least
    * `minDocs` distinct documents. One output row per maximal span:
    * (id, span_start, span_end, span_len), token positions 1-based
    * inclusive; overlapping or ADJACENT gram hits coalesce into one
    * span (adjacent because a masking pass treats touching spans as
    * one cut).
    *
    * The gram key is a 56-bit hash of the joined tokens — collisions
    * at 2^-56 merely over-flag a span, acceptable for a dedup screen
    * and what keeps the shuffle row fixed-width at scale.
    */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int
  ): DataFrame = {
    require(n >= 2, "span gram size must be >= 2")
    val grams = docs
      .select(col(idCol), TextStats.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(
        col(idCol),
        explode(expr(s"sequence(1, size(toks) - ${n - 1})")).as("pos"),
        col("toks")
      )
      .select(
        col(idCol),
        col("pos"),
        PortableHash
          .md5num56(expr(s"array_join(slice(toks, pos, $n), ' ')"))
          .as("gram_hash")
      )
      // one materialization feeds the df count AND the hit join —
      // without it the tokenize+slice+hash scan runs twice (same
      // pattern as the minhash pipeline's shingle materialization);
      // the frame is fixed-width (id, pos, 8-byte hash), never text
      .localCheckpoint(false)
    val dupGrams = grams
      .select(col("gram_hash"), col(idCol))
      .distinct()
      .groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("gram_df"))
      .filter(col("gram_df") >= minDocs)
      .select(col("gram_hash"))
    // repeated grams are the tiny df-thresholded set -> broadcast the
    // semi join; the corpus side never shuffles by gram a second time
    val hits = grams
      .join(broadcast(dupGrams), Seq("gram_hash"), "left_semi")
      .select(col(idCol), col("pos"), (col("pos") + lit(n - 1)).as("end_pos"))
    mergeIslands(hits, idCol)
  }

  /** Token spans covered by n-grams present in an EXTERNAL reference
    * set (one `gram` string column — an eval-set shingle list, a
    * blocklist of phrases): the decontamination face of
    * [[duplicatedSpans]], where the "bad" grams come from outside the
    * corpus instead of from cross-doc repetition. Same output shape
    * and merge semantics; the reference set is broadcast, so the
    * corpus pass is scan-local.
    */
  def taggedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      refGrams: DataFrame
  ): DataFrame = {
    require(n >= 2, "span gram size must be >= 2")
    val hits = docs
      .select(col(idCol), TextStats.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(
        col(idCol),
        explode(expr(s"sequence(1, size(toks) - ${n - 1})")).as("pos"),
        col("toks")
      )
      .select(
        col(idCol),
        col("pos"),
        expr(s"array_join(slice(toks, pos, $n), ' ')").as("gram")
      )
      .join(broadcast(refGrams.select(col("gram")).distinct()), Seq("gram"), "left_semi")
      .select(col(idCol), col("pos"), (col("pos") + lit(n - 1)).as("end_pos"))
    mergeIslands(hits, idCol)
  }

  /** Gaps-and-islands merge of (id, pos, end_pos) hits: a hit starts a
    * new span iff it begins past every previous hit's end + 1
    * (adjacent merges). Doc-local windows — one doc-keyed shuffle.
    */
  private def mergeIslands(hits: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevMaxEnd = max(col("end_pos"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islanded = hits
      .withColumn(
        "new_span",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd + lit(1), 1).otherwise(0)
      )
      .withColumn(
        "span_id",
        sum(col("new_span")).over(w.rowsBetween(Window.unboundedPreceding, 0))
      )
    islanded
      .groupBy(col(idCol), col("span_id"))
      .agg(
        min(col("pos")).as("span_start"),
        max(col("end_pos")).as("span_end")
      )
      .select(
        col(idCol),
        col("span_start"),
        col("span_end"),
        (col("span_end") - col("span_start") + lit(1)).as("span_len")
      )
  }
}
