package graft.ml

import graft.SparkSpec
import graft.tables.TestTables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted-index incremental dedup: the corpus half of both
  * screening families ([[Dedup.buildBandIndex]] for SimHash,
  * [[Dedup.buildClusterIndex]] for SemDeDup) is built once, written
  * to parquet, and probed by successive batches — the crawl-loop
  * shape a 100 TB pipeline runs. Each index path must be
  * output-identical to the inline incremental path (which re-derives
  * the corpus side per batch), including after a parquet round trip,
  * and one stored index must serve multiple batches.
  */
class IncrementalIndexSpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def roundTrip(df: DataFrame, name: String, partitionCol: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    spark.read.parquet(path)
  }

  test("simHashScreen over a parquet-persisted band index == simHashIncremental, batch by batch") {
    val docs = TestTables.documents(spark, sf001)
    val idx = roundTrip(
      Dedup.buildBandIndex(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text"),
      "bandidx",
      "band"
    )
    // two successive crawl batches probe the SAME stored index
    for (batchPred <- Seq(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0,
                          col("doc_id") % 3 === 0 && col("doc_id") % 2 === 1)) {
      val screened = Dedup.simHashScreen(docs.filter(batchPred), "doc_id", "text", idx)
      val inline = Dedup
        .simHashIncremental(
          docs.filter(batchPred || col("doc_id") % 3 =!= 0),
          "doc_id",
          "text",
          incomingPred = col("doc_id") % 3 === 0
        )
      assert(sorted(screened) == sorted(inline), "index path must equal inline incremental path")
    }
  }

  test("semDedupScreen over a parquet-persisted cluster index == semDedupIncremental, batch by batch") {
    val emb = TestTables.embeddings(spark, sf001)
    val idx = roundTrip(
      Dedup.buildClusterIndex(emb.filter(col("vec_id") % 10 < 8), "vec_id", "embedding"),
      "clusteridx",
      "cluster"
    )
    for (batchPred <- Seq(col("vec_id") % 10 === 8, col("vec_id") % 10 === 9)) {
      val screened =
        Dedup.semDedupScreen(emb.filter(batchPred), "vec_id", "embedding", idx, threshold = 0.42)
      val inline = Dedup
        .semDedupIncremental(
          emb.filter(batchPred || col("vec_id") % 10 < 8),
          "vec_id",
          "embedding",
          incomingPred = col("vec_id") % 10 >= 8,
          threshold = 0.42
        )
      assert(sorted(screened) == sorted(inline), "index path must equal inline incremental path")
    }
  }

  test("band index schema is the probe contract (band, bv, ex_id, ex_h); cluster index (cluster, ex_id, ex_nv)") {
    val docs = TestTables.documents(spark, sf001).limit(50)
    val emb = TestTables.embeddings(spark, sf001).limit(50)
    assert(
      Dedup.buildBandIndex(docs, "doc_id", "text").columns.sorted.toSeq ==
        Seq("band", "bv", "ex_h", "ex_id")
    )
    assert(
      Dedup.buildClusterIndex(emb, "vec_id", "embedding").columns.sorted.toSeq ==
        Seq("cluster", "ex_id", "ex_nv")
    )
  }
}
