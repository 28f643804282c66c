package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  // 10_000 rows, 90% on one hot key
  private def skewed = {
    import spark.implicits._
    (1 to 10000).map { i =>
      val k = if (i % 10 == 0) s"cold_${i % 97}" else "hot"
      (k, i.toLong, i * 0.5)
    }.toDF("k", "id", "v")
  }

  private def dim = {
    import spark.implicits._
    ((Seq("hot") ++ (0 until 97).map(i => s"cold_$i")).map(k => (k, k.length))).toDF("k", "w")
  }

  private def summarize(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("id").as("s"), sum("w").as("sw"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("saltedJoin returns exactly the plain join's rows") {
    val plain = summarize(skewed.join(dim, Seq("k")))
    val salted = summarize(SkewJoin.saltedJoin(skewed, dim, Seq("k"), numSalts = 8))
    assert(salted == plain)
  }

  test("skewAwareJoin salts only hot keys and matches the plain join") {
    val plain = summarize(skewed.join(dim, Seq("k")))
    val aware = summarize(SkewJoin.skewAwareJoin(skewed, dim, Seq("k"), numSalts = 8, hotThreshold = 500L))
    assert(aware == plain)
  }

  test("row salts spread a hot key across all buckets") {
    val salted = skewed
      .filter(col("k") === "hot")
      .withColumn("salt", pmod(hash(col("k"), col("id"), col("v")), lit(8)))
      .groupBy("salt")
      .count()
      .collect()
      .map(r => r.getLong(1))
    assert(salted.length == 8, "hot key present in every salt bucket")
    val (mn, mx) = (salted.min, salted.max)
    assert(mx < mn * 2, s"roughly even spread, got min=$mn max=$mx")
  }

  test("saltedAgg equals direct aggregation for algebraic aggregates") {
    val direct = skewed
      .groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"), max("id").as("mx"))
      .collect()
      .map(r => r.getString(0) -> ((math.round(r.getDouble(1) * 100), r.getLong(2), r.getLong(3))))
      .toMap
    val salted = SkewJoin
      .saltedAgg(
        skewed,
        Seq("k"),
        numSalts = 8,
        partial = Seq(sum("v").as("pv"), count(lit(1)).as("pn"), max("id").as("pmx")),
        merge = Seq(sum("pv").as("sv"), sum("pn").as("n"), max("pmx").as("mx"))
      )
      .collect()
      .map(r => r.getString(0) -> ((math.round(r.getDouble(1) * 100), r.getLong(2), r.getLong(3))))
      .toMap
    assert(salted == direct)
  }
}
