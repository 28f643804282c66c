package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * 2016): learn the top-K symbol merges over a corpus, greedily and
  * one at a time, exactly as sequential BPE trainers do.
  *
  * Shape at scale — the classic trick is that BPE never iterates over
  * the corpus, only over the WORD-FREQUENCY DICT:
  *   1. one corpus pass builds `(word, freq)` (map-side combined;
  *      vocab-sized output, orders of magnitude below corpus size);
  *   2. each of the K merge rounds is a pair-count aggregation over
  *      the dict (vocab-sized shuffle) followed by a 1-row argmax
  *      collect — the only driver round-trip, K rows total;
  *   3. the merge is applied to the dict with a codegen'd array fold,
  *      no shuffle at all.
  * At 100 TB the dict is still ~10^6-10^7 rows; K rounds of a
  * dict-sized aggregation is how production BPE trainers distribute
  * (and why they all keep the dict, not the corpus, as the loop
  * state).
  *
  * Everything is integer/string arithmetic — pair counts are exact
  * longs, the argmax tie-break is (count DESC, left, right) on binary
  * string order — so the learned merge table is hash-checkable
  * against a DuckDB oracle with zero float tolerance.
  */
object BpeTrain {

  /** End-of-word marker appended to every symbol sequence so learned
    * merges distinguish word-final from word-internal contexts.
    */
  val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** `(word, freq, syms)` — corpus-wide token occurrence counts with
    * each word exploded into its character sequence plus [[EndOfWord]].
    * `split(word, "")` keeps a trailing empty string in Spark (Java
    * `split` with limit -1); `array_remove` drops it.
    */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextStats.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn(
        "syms",
        concat(array_remove(split(col("word"), ""), ""), array(lit(EndOfWord)))
      )

  /** Adjacent symbol pairs of one dict row, weighted by word freq.
    * The `size >= 2` guard matters: Spark's `sequence(1, 0)` is a
    * DESCENDING sequence, not empty.
    */
  private def pairCounts(dict: DataFrame): DataFrame =
    dict
      .select(
        col("freq"),
        explode(
          when(
            size(col("syms")) >= 2,
            expr(
              "transform(sequence(1, size(syms) - 1), " +
                "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
            )
          ).otherwise(expr("array()").cast("array<struct<a:string,b:string>>"))
        ).as("p")
      )
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right application of one merge `(a, b) -> ab` as
    * an array fold: leftmost pair wins, the merged token never
    * re-merges with the next element in the same pass ("aaa" with
    * merge (a,a) gives [aa, a], not [aa, aa]). Mirrors DuckDB
    * `list_reduce` in the oracle, whose seed is the first singleton —
    * equivalent to this empty-seed fold.
    */
  def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(
      syms,
      expr("array()").cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right)))
        ).otherwise(concat(acc, array(x)))
    )

  /** Learn `numMerges` merges. Returns the merge table in learned
    * order plus the dict with all merges applied (for downstream
    * vocab extraction / encoding).
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int
  ): (Seq[Merge], DataFrame) = {
    var dict = wordDict(docs, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(dict)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, a, b, c)
        // checkpoint per round: the fold chain stays one level deep and
        // the next round's pair count never re-runs earlier folds
        dict = dict
          .withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(true)
        rank += 1
      }
    }
    (merges.result(), dict)
  }

  /** Merge table as a DataFrame: `(merge_rank, left, right, pair_count)`. */
  def merges(s: SparkSession, docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    import s.implicits._
    val (ms, _) = learnMerges(docs, textCol, numMerges)
    ms.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Encode: apply an already-learned merge list to a token column,
    * in learned order (how a trained BPE tokenizer segments text).
    * Purely array folds — a codegen'd projection, no shuffle.
    */
  def encodeTokens(toks: Column, learned: Seq[Merge]): Column = {
    val chars = transform(
      toks,
      w => concat(array_remove(split(w, ""), ""), array(lit(EndOfWord)))
    )
    learned.foldLeft(chars) { (acc, m) =>
      transform(acc, syms => applyMerge(syms, m.left, m.right))
    }
  }
}
