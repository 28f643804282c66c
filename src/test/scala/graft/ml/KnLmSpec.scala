package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "the dog sat on the mat"),
    (4L, "quantum chromodynamics perturbation amplitudes diverge"),
    (5L, "the the the the the")
  ).toDF("doc_id", "text")

  private def bigrams = KnLm.docBigrams(docs, "doc_id", TextStats.tokens(col("text")))

  test("interpolated KN distributions normalize: sum over the vocabulary of P(w2|w1) == 1") {
    val rows = KnLm.bigramLogProbs(bigrams).select("w1", "w2", "logp").collect()
      .map(r => (r.getString(0), r.getString(1), math.exp(r.getDouble(2))))

    val counts = bigrams.groupBy("w1", "w2").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val ctxTotal = counts.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val fwdTypes = counts.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size }
    val backTypes = counts.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size }
    val nTypes = counts.size.toDouble
    val vocab = backTypes.keySet

    val observed = rows.groupBy(_._1).map { case (w1, rs) => w1 -> rs.map(_._3).sum }
    observed.keys.foreach { w1 =>
      val lambda = KnLm.Discount * fwdTypes(w1) / ctxTotal(w1)
      val unseenMass = vocab.toSeq // Set.map would dedupe equal terms
        .filterNot(w2 => counts.contains((w1, w2)))
        .map(w2 => lambda * backTypes(w2) / nTypes)
        .sum
      val total = observed(w1) + unseenMass
      assert(math.abs(total - 1.0) < 1e-9, s"context '$w1' mass $total")
    }
  }

  test("perplexity matches the hand-computed KN values and orders docs by typicality") {
    val model = KnLm.bigramLogProbs(bigrams)
    val ppl = KnLm.perplexity(bigrams, model, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // independently hand-computed (D=0.75, 13 bigram types) — pins the
    // whole formula, not just its ordering
    val expected = Map(1L -> 2.522, 2L -> 3.1113, 3L -> 3.5256, 4L -> 3.25, 5L -> 2.6131)
    expected.foreach { case (id, e) =>
      assert(math.abs(ppl(id) - e) < 5e-4, s"doc $id: ${ppl(id)} vs $e")
    }
    // the corpus' dominant pattern (doc 1, two near-copies) scores
    // lowest; the doc diverging most from it (doc 3's every-bigram-
    // discounted variant) scores highest
    assert(ppl(1L) < ppl(4L) && ppl(4L) < ppl(3L))
  }

  test("screening against a parquet-persisted LM index equals the in-memory index path") {
    val corpus = docs.filter($"doc_id" =!= 4L)
    val batch = Seq(
      (10L, "the cat sat on the mat"),        // all bigrams seen
      (11L, "the cat slept on the mat"),      // backoff: known words, unseen bigrams
      (12L, "zyzzyva the cat")                // unknown-word floor fires
    ).toDF("doc_id", "text")
    val cb = KnLm.docBigrams(corpus, "doc_id", TextStats.tokens(col("text")))
    val bb = KnLm.docBigrams(batch, "doc_id", TextStats.tokens(col("text")))
    val idx = KnLm.buildLmIndex(cb)

    val dir = java.nio.file.Files.createTempDirectory("knidx").toString
    idx.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)

    val direct = KnLm.screenPerplexity(bb, idx, "doc_id").orderBy("doc_id").collect().toSeq
    val persisted = KnLm.screenPerplexity(bb, reloaded, "doc_id").orderBy("doc_id").collect().toSeq
    assert(direct == persisted)

    val byId = direct.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byId(10L)._2 == 0, "fully-seen doc must have no unseen bigrams")
    assert(byId(11L)._2 > 0 && byId(12L)._2 > 0)
    assert(byId(10L)._3 < byId(11L)._3, "seen text must score below backoff text")
    assert(byId(11L)._3 < byId(12L)._3, "backoff text must score below unknown-word text")
  }

  test("docs with fewer than 2 tokens produce no score row") {
    val tiny = Seq((1L, "word"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val b = KnLm.docBigrams(tiny, "doc_id", TextStats.tokens(col("text")))
    val scored = KnLm.perplexity(b, KnLm.bigramLogProbs(b), "doc_id")
    assert(scored.select("doc_id").as[Long].collect().toSet == Set(3L))
  }
}
