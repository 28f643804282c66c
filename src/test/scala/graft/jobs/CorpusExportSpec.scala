package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The training-shard writer: layout on disk, packing discipline,
  * determinism, manifest fidelity.
  */
class CorpusExportSpec extends SparkSpec {

  import spark.implicits._

  private def docs =
    (1L to 200L).map(i => (i, ("tok " * ((i % 30).toInt + 1)).trim)).toDF("doc_id", "text")

  test("writeShards produces one parquet file per shard dir and a faithful manifest") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val res = CorpusExport.writeShards(spark, docs, "doc_id", "text", out, nShards = 4, binTokens = 64L)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length == 4 && dirs.forall(_.startsWith("shard=")), dirs.mkString(","))
    for (d <- dirs) {
      val files = new java.io.File(s"$out/$d").listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d must hold exactly one data file, got ${files.length}")
    }
    val m = res.manifest.collect()
    assert(m.map(_.getLong(1)).sum == 200L, "manifest docs sum to the input")
    val total = spark.read.parquet(out).count()
    assert(total == 200L, "no docs lost or duplicated in the write")
  }

  test("packing respects the bin budget: every bin but a shard's last starts under budget") {
    val out = java.nio.file.Files.createTempDirectory("shards2").toString
    CorpusExport.writeShards(spark, docs, "doc_id", "text", out, nShards = 2, binTokens = 64L)
    // a doc starts a new bin exactly when the running count BEFORE it
    // crossed the budget — so per (shard, bin) the tokens-before-last
    // doc stay under budget
    val rows = spark.read
      .parquet(out)
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_bpe")).as("bin_tokens"), expr("max_by(n_bpe, pos)").as("last_doc"))
      .collect()
    for (r <- rows) {
      val binTokens = r.getLong(2); val lastDoc = r.getInt(3).toLong
      assert(binTokens - lastDoc < 64L, s"bin ${r.get(0)}/${r.get(1)} grew past budget before its last doc")
    }
  }

  test("export is deterministic across partitionings") {
    val out1 = java.nio.file.Files.createTempDirectory("shards3").toString
    val out2 = java.nio.file.Files.createTempDirectory("shards4").toString
    CorpusExport.writeShards(spark, docs, "doc_id", "text", out1, nShards = 4, binTokens = 64L)
    CorpusExport.writeShards(spark, docs.repartition(13), "doc_id", "text", out2, nShards = 4, binTokens = 64L)
    def snap(p: String) = spark.read
      .parquet(p)
      .select("shard", "bin", "pos", "doc_id")
      .collect()
      .map(_.toString)
      .sorted
      .toSeq
    assert(snap(out1) == snap(out2), "shard/bin/pos assignment is a pure function of content")
  }
}
