package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  /** Two sharply different vocabularies: even ids speak "feline",
    * odd ids speak "finance". Target = even ids, so feline docs must
    * outscore finance docs.
    */
  private def corpus = {
    import spark.implicits._
    (1 to 60).map { i =>
      val text =
        if (i % 2 == 0) s"cat kitten purr whiskers cat toy number$i"
        else s"stock bond yield market ticker price number$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("featurize emits unigrams + bigrams; single-token docs emit exactly one feature") {
    import spark.implicits._
    val one = Seq((1L, "hello"), (2L, "two tokens")).toDF("doc_id", "text")
    val f = Dsir.featurize(one, "doc_id", "text")
    val counts = f.groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "hello" -> 1 unigram, 0 bigrams; "two tokens" -> 2 unigrams + 1 bigram
    assert(counts == Map(1L -> 1L, 2L -> 3L))
    val buckets = f.select("bucket").collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < Dsir.Buckets))
  }

  test("select ranks target-like docs first and is repartition-stable") {
    val sel = Dsir.select(corpus, "doc_id", "text", pmod(col("id"), lit(2)) === 0, 20)
    val ids = sel.select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == 20)
    assert(ids.forall(_ % 2 == 0), s"feline (even) docs must win the top 20, got ${ids.toSeq}")
    val again = Dsir
      .select(corpus.repartition(7), "doc_id", "text", pmod(col("id"), lit(2)) === 0, 20)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
    assert(ids.toSeq == again.toSeq, "deterministic under repartitioning")
  }

  test("screenScore: novel buckets take the Laplace default; persisted ratio table screens identically") {
    import spark.implicits._
    val feats = Dsir.featurize(corpus, "doc_id", "text")
    val model = Dsir.fit(feats, pmod(col("id"), lit(2)) === 0)
    // a wholly out-of-vocabulary batch: every feature unseen -> every
    // occurrence contributes exactly defaultR, so score == defaultR
    val novel = Dsir.featurize(
      Seq((999L, "zzqx qvv wvxk")).toDF("doc_id", "text"),
      "doc_id",
      "text"
    )
    val Array(row) = Dsir.screenScore(novel, model).collect()
    assert(math.abs(row.getDouble(2) - model.defaultR) < 1e-12)
    // fit-once / screen-later: the table survives a parquet round trip
    val dir = java.nio.file.Files.createTempDirectory("dsir-ratio").toString
    model.table.write.mode("overwrite").parquet(dir)
    val reloaded = Dsir.RatioModel(spark.read.parquet(dir), model.defaultR)
    val a = Dsir.screenScore(feats, model).collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val b = Dsir.screenScore(feats, reloaded).collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(a == b, "persisted-table screen must equal the in-memory screen")
  }

  test("ratio table is bounded by the bucket space and covers every scored feature") {
    val feats = Dsir.featurize(corpus, "doc_id", "text")
    val ratio = Dsir.bucketLogRatio(feats, pmod(col("id"), lit(2)) === 0)
    assert(ratio.count() <= Dsir.Buckets)
    // source-derived coverage: scoring joins lose no rows
    val scored = Dsir.score(feats, ratio)
    assert(scored.agg(sum("n_feats")).head().getLong(0) == feats.count())
  }
}
