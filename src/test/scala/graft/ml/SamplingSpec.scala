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

  test("weightedQuota: Hamilton apportionment sums exactly to targetN when sources have depth") {
    import spark.implicits._
    // 3 sources x 100 docs each; weights 3/3/1 over targetN=10:
    // num = 30,30,10 of W=7 -> base 4,4,1 (sum 9), remainders 2,2,3 ->
    // leftover seat goes to the largest remainder (c)
    val df = (1 to 300).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    val picked = Sampling
      .weightedQuota(df, "doc_id", "source", Seq(("s0", 3), ("s1", 3), ("s2", 1)), 10L)
      .groupBy("source")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(picked == Map("s0" -> 4L, "s1" -> 4L, "s2" -> 2L))
    assert(picked.values.sum == 10L, "quotas apportion the budget exactly")
  }

  test("weightedQuota: remainder ties break by source name; shallow sources cap, unlisted excluded") {
    import spark.implicits._
    // equal weights, targetN=3 over 2 listed sources: num=3 each of
    // W=2 -> base 1,1, remainders 1,1 -> ONE leftover seat -> 'a' wins
    // the name tie-break; 'zz' has rows but no weight -> excluded;
    // 'b' has only 1 row < its quota -> contributes what it has
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"),
      (5L, "zz"), (6L, "zz")
    ).toDF("doc_id", "source")
    val picked = Sampling
      .weightedQuota(df, "doc_id", "source", Seq(("a", 1), ("b", 1)), 3L)
      .select("source", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(picked.count(_._1 == "a") == 2, "a gets base 1 + the tie-broken leftover seat")
    assert(picked.count(_._1 == "b") == 1, "b's quota of 1 is fully served")
    assert(!picked.exists(_._1 == "zz"), "unlisted sources never selected")
  }

  test("epochShuffle is a permutation: every key once, contiguous positions, seed re-permutes") {
    val out = Sampling.epochShuffle(docs, "doc_id", "seedA", nShards = 4).collect()
    assert(out.map(_.getLong(0)).toSet == (1L to 500L).toSet, "every doc exactly once")
    out.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getInt(2)).sorted.toSeq
      assert(ps == (1 to rows.length), s"shard $shard positions not contiguous")
    }
    // a different seed yields a genuinely different ordering
    val a = Sampling.epochShuffle(docs, "doc_id", "seedA", 4).orderBy("shard", "pos")
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.epochShuffle(docs, "doc_id", "seedB", 4).orderBy("shard", "pos")
      .collect().map(_.getLong(0)).toSeq
    assert(a != b && a.sorted == b.sorted)
    // and the same seed is bit-stable under repartitioning
    val c = Sampling.epochShuffle(docs.repartition(13), "doc_id", "seedA", 4)
      .orderBy("shard", "pos").collect().map(_.getLong(0)).toSeq
    assert(a == c)
  }

  test("temperatureQuota: sqrt balancing up-weights small sources, quotas sum to target") {
    import spark.implicits._
    // sizes 400/100/25 -> sqrt weights 20/10/5 -> quotas 57/29/14 of 100
    val d = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 500).map(i => (i.toLong, "mid")) ++
      (501 to 525).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureQuota(d, "doc_id", "source", 100L)
    val quotas = out.select("source", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quotas == Map("big" -> 57L, "mid" -> 29L, "small" -> 14L), s"got $quotas")
    assert(out.count() == 100)
    // linear sampling would give small 4.8% of the budget; sqrt gives 14%
    // — the up-weighting that is the point of temperature balancing
    val sel = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sel2 = Sampling.temperatureQuota(d.repartition(17), "doc_id", "source", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sel == sel2, "selection must be layout-invariant")
  }

  test("temperatureQuota: empty input yields empty selection, huge targets don't overflow") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(Sampling.temperatureQuota(empty, "doc_id", "source", 100L).count() == 0)
    // 10^12 target x ~10^7 weight would overflow Long multiplication;
    // BigInt apportionment must keep quotas exact (sum == min(target, corpus))
    val d = ((1 to 300).map(i => (i.toLong, "a")) ++ (301 to 400).map(i => (i.toLong, "b")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureQuota(d, "doc_id", "source", 1000000000000L)
    val quotas = out.select("source", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Seq(math.round(math.sqrt(300.0) * 1e6), math.round(math.sqrt(100.0) * 1e6))
    val expectA = (BigInt(1000000000000L) * w(0) / (w(0) + w(1))).toLong
    assert(quotas("a") == expectA || quotas("a") == expectA + 1, s"got $quotas")
    assert(quotas.values.sum == 1000000000000L)
    assert(out.count() == 400) // over-subscribed: everything qualifies
  }

  test("weightedQuota selection is stable under repartitioning") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"s${i % 2}")).toDF("doc_id", "source")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling
        .weightedQuota(d, "doc_id", "source", Seq(("s0", 2), ("s1", 1)), 30L)
        .select("doc_id")
        .collect()
        .map(_.getLong(0))
        .toSet
    assert(ids(df) == ids(df.repartition(13)), "content-hash rank is partition-independent")
  }
}
