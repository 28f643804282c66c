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

  // ---- maskSpans ---------------------------------------------------

  test("maskSpans cuts spanned tokens, passes span-free docs, empties fully-covered docs") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "g h i"),
      (3L, "x y")
    ).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 2, 4, 3), // cut b c d
      (3L, 1, 2, 2)  // cut everything
    ).toDF("doc_id", "span_start", "span_end", "span_len")
    val out = FineDedup
      .maskSpans(docs, "doc_id", "text", spans)
      .orderBy(col("doc_id"))
      .as[(Long, String, Int)]
      .collect()
      .toSeq
    assert(out == Seq((1L, "a e f", 3), (2L, "g h i", 3), (3L, "", 0)))
  }

  test("maskSpans handles multiple disjoint spans per doc") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val spans = Seq((1L, 1, 2, 2), (1L, 5, 6, 2)).toDF("doc_id", "span_start", "span_end", "span_len")
    val out = FineDedup
      .maskSpans(docs, "doc_id", "text", spans)
      .as[(Long, String, Int)]
      .collect()
      .toSeq
    assert(out == Seq((1L, "c d g h", 4)))
  }

  test("taggedSpans marks spans covered by an external reference gram set") {
    val docs = Seq(
      (1L, "x a b c y z"), // "a b" hits at pos 2 -> span [2,3]
      (2L, "a b c d e f") // "a b" at 1, "c d" at 3: adjacent -> one span [1,4]
    ).toDF("doc_id", "text")
    val ref = Seq("a b", "c d").toDF("gram")
    val spans = FineDedup
      .taggedSpans(docs, "doc_id", "text", n = 2, ref)
      .orderBy(col("doc_id"), col("span_start"))
      .as[(Long, Int, Int, Int)]
      .collect()
      .toSeq
    assert(spans == Seq((1L, 2, 3, 2), (2L, 1, 4, 4)))
  }

  test("detect -> mask removes EVERY occurrence of every duplicated gram (fixture corpus)") {
    // all occurrences of a cross-doc-duplicated n-gram lie inside
    // spans by construction, so none can survive the cut — the
    // guarantee that makes one detect+mask round sufficient for the
    // original duplicate set (only glue artifacts can create new ones)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = 8
    def gramSet(d: org.apache.spark.sql.DataFrame, textCol: String): Set[String] = {
      d.select(col("doc_id"), TextStats.tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) >= n)
        .select(col("doc_id"), explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))")).as("g"))
        .distinct()
        .groupBy("g")
        .count()
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toMap
        .collect { case (g, c) if c >= 2 => g }
        .toSet
    }
    val dupGrams = gramSet(docs, "text")
    assert(dupGrams.nonEmpty, "fixture must contain cross-doc duplicated grams")
    val spans = FineDedup.duplicatedSpans(docs, "doc_id", "text", n, minDocs = 2)
    val masked = FineDedup.maskSpans(docs, "doc_id", "text", spans)
    val survivors = masked
      .select(col("doc_id"), TextStats.tokens(col("masked_text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))")).as("g"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    val leaked = survivors.intersect(dupGrams)
    assert(leaked.isEmpty, s"duplicated grams survived masking: ${leaked.take(3)}")
  }

  // ---- randomized cross-check vs an in-memory reference ------------

  /** Plain-Scala reference: positional n-grams, df over distinct docs,
    * interval merge with adjacency coalescing — the operator's contract
    * restated independently of Spark.
    */
  private def referenceSpans(
      docs: Seq[(Long, String)],
      n: Int,
      minDocs: Int
  ): Seq[(Long, Int, Int, Int)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase
        .replaceAll(s"([${TextStats.CjkCharClass}])", " $1 ")
        .split(TextStats.TokenSplitClass)
        .filter(_.nonEmpty)
        .toSeq
    }
    val grams = for {
      (id, ts) <- toks
      if ts.length >= n
      pos <- 1 to (ts.length - n + 1)
    } yield (id, pos, ts.slice(pos - 1, pos - 1 + n).mkString(" "))
    val df = grams.map { case (id, _, g) => (g, id) }.distinct
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val dup = df.filter(_._2 >= minDocs).keySet
    grams
      .filter { case (_, _, g) => dup(g) }
      .groupBy(_._1)
      .toSeq
      .flatMap { case (id, hs) =>
        val ivs = hs.map { case (_, p, _) => (p, p + n - 1) }.sortBy(_._1)
        val merged = ivs.foldLeft(List.empty[(Int, Int)]) {
          case (acc, (s0, e0)) =>
            acc match {
              case (ps, pe) :: rest if s0 <= pe + 1 => (ps, math.max(pe, e0)) :: rest
              case _                                => (s0, e0) :: acc
            }
        }
        merged.reverse.map { case (s0, e0) => (id, s0, e0, e0 - s0 + 1) }
      }
      .sortBy(t => (t._1, t._2))
  }

  test("duplicatedSpans matches the in-memory reference on random corpora") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Array("a", "b", "c", "d", "e")
    for (trial <- 1 to 12) {
      val nDocs = 3 + rnd.nextInt(4)
      val docs = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(13)
        id -> Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val n = 2 + rnd.nextInt(2)
      val expected = referenceSpans(docs, n, minDocs = 2)
      val actual = FineDedup
        .duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n, minDocs = 2)
        .orderBy(col("doc_id"), col("span_start"))
        .as[(Long, Int, Int, Int)]
        .collect()
        .toSeq
      assert(actual == expected, s"trial $trial, n=$n, docs=$docs")
    }
  }

  test("stripFrequentLines matches the in-memory reference on random line frames") {
    val rnd = new scala.util.Random(97L)
    val pool = Array("alpha", "beta", "gamma", "delta")
    for (trial <- 1 to 8) {
      val rows = for {
        id <- 1L to (2 + rnd.nextInt(4)).toLong
        ln <- 0 until rnd.nextInt(5)
      } yield (id, ln, pool(rnd.nextInt(pool.length)))
      val df = rows.map { case (id, _, t) => (t, id) }.distinct
        .groupBy(_._1).map { case (t, xs) => t -> xs.size }
      val boiler = df.filter(_._2 >= 2).keySet
      val expected = rows.filterNot { case (_, _, t) => boiler(t) }.sorted
      val actual = FineDedup
        .stripFrequentLines(rows.toDF("doc_id", "line_no", "line"), "doc_id", "line", minDocs = 2)
        .as[(Long, Int, String)]
        .collect()
        .toSeq
        .sorted
      assert(actual == expected, s"trial $trial, rows=$rows")
    }
  }
}
