package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (1 to 500).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .withColumn("k", col("doc_id").cast("string"))
  }

  test("deterministicSample is stable and keeps ~rate of rows") {
    val a = Sampling.deterministicSample(docs, "k", 1, 10).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "k", 1, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same keys selected regardless of partitioning")
    assert(a.nonEmpty && a.size < 150, s"~10% expected, got ${a.size}/500")
    // monotone: a larger rate strictly contains the smaller one
    val wider = Sampling.deterministicSample(docs, "k", 3, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
  }

  test("splits are disjoint, exhaustive, and sized by weight") {
    val out = Sampling.splits(docs, "k", Seq(("train", 8), ("eval", 1), ("test", 1)))
    val byS = out.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "eval", "test"))
    assert(byS.values.sum == 500L, "every row assigned exactly one split")
    assert(byS("train") > byS("eval") * 3, "train dominates at 8/10 weight")
  }
}
