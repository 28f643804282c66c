package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sub-document dedup operators on hand-built inputs: line-level
  * boilerplate stripping and duplicate-substring span merging (the
  * query-level values are oracle-checked by the driver; these pin the
  * operator contracts — thresholds, span coalescing, edge cases).
  */
class FineDedupSpec extends SparkSpec {

  import spark.implicits._

  // ---- stripFrequentLines ------------------------------------------

  private val lineRows = Seq(
    // "accept cookies" appears in docs 1, 2, 3 -> boilerplate at minDocs<=3
    (1L, 0, "accept cookies"),
    (1L, 1, "unique one"),
    (2L, 0, "accept cookies"),
    (2L, 1, "unique two"),
    (3L, 0, "accept cookies"),
    // repeated WITHIN doc 4 only: df counts distinct docs, so df=1
    (4L, 0, "self repeat"),
    (4L, 1, "self repeat")
  ).toDF("doc_id", "line_no", "line")

  test("stripFrequentLines drops cross-doc repeats, keeps unique lines") {
    val kept = FineDedup
      .stripFrequentLines(lineRows, "doc_id", "line", minDocs = 2)
      .select("doc_id", "line")
      .as[(Long, String)]
      .collect()
      .toSet
    assert(
      kept == Set(
        (1L, "unique one"),
        (2L, "unique two"),
        (4L, "self repeat"),
        (4L, "self repeat")
      ) || kept == Set((1L, "unique one"), (2L, "unique two"), (4L, "self repeat"))
    )
    // both copies of doc 4's line survive (within-doc repeat is NOT df>=2)
    val keptRows = FineDedup
      .stripFrequentLines(lineRows, "doc_id", "line", minDocs = 2)
      .filter(col("doc_id") === 4L)
      .count()
    assert(keptRows == 2, "within-doc repetition must not count toward document frequency")
  }

  test("stripFrequentLines threshold: minDocs above the df keeps everything") {
    val kept = FineDedup.stripFrequentLines(lineRows, "doc_id", "line", minDocs = 4)
    assert(kept.count() == lineRows.count())
  }

  test("stripFrequentLines preserves the caller's columns") {
    val kept = FineDedup.stripFrequentLines(lineRows, "doc_id", "line", minDocs = 2)
    assert(kept.columns.toSeq == Seq("doc_id", "line_no", "line"))
  }

  // ---- duplicatedSpans ---------------------------------------------

  private def spansOf(docs: Seq[(Long, String)], n: Int): Seq[(Long, Int, Int, Int)] =
    FineDedup
      .duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n, minDocs = 2)
      .orderBy(col("doc_id"), col("span_start"))
      .as[(Long, Int, Int, Int)]
      .collect()
      .toSeq

  test("duplicatedSpans finds the shared passage in both docs") {
    // shared 4-token run "a b c d" embedded at different positions
    val docs = Seq(
      (1L, "x1 x2 a b c d y1 y2"),
      (2L, "a b c d z1 z2 z3 z4")
    )
    val spans = spansOf(docs, n = 4)
    assert(spans == Seq((1L, 3, 6, 4), (2L, 1, 4, 4)))
  }

  test("duplicatedSpans merges overlapping gram hits into one maximal span") {
    // shared 6-token run -> three overlapping 4-gram hits -> ONE span of 6
    val docs = Seq(
      (1L, "p q a b c d e f r s"),
      (2L, "a b c d e f t u v w")
    )
    val spans = spansOf(docs, n = 4)
    assert(spans == Seq((1L, 3, 8, 6), (2L, 1, 6, 6)))
  }

  test("duplicatedSpans merges ADJACENT spans (touching cuts coalesce)") {
    // "a b" and "c d" both shared, adjacent in doc 1 but separated in
    // docs 2/3 -> doc 1 reports one contiguous cut [1,4]
    val docs = Seq(
      (1L, "a b c d x y"),
      (2L, "a b m n o p"),
      (3L, "q r s t c d")
    )
    val spans = spansOf(docs, n = 2)
    assert(spans.filter(_._1 == 1L) == Seq((1L, 1, 4, 4)))
  }

  test("duplicatedSpans: no cross-doc repeats -> empty") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j"))
    assert(spansOf(docs, n = 2).isEmpty)
  }

  test("duplicatedSpans ignores docs shorter than the gram") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a"))
    assert(spansOf(docs, n = 2) == Seq((1L, 1, 2, 2), (2L, 1, 2, 2)))
  }
}
