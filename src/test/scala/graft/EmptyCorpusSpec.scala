package graft

import graft.queries.Registry

/** Empty-corpus robustness net: every registered query must run
  * WITHOUT THROWING against a data dir whose ten tables are empty but
  * carry the exact sf0.001 schemas. Empty input is a real production
  * class — a fresh deployment, an all-filtered ingest batch, a corpus
  * generation with nothing new — and the failure mode it catches is
  * driver-side `head()`/`first()` on an empty aggregate or an index
  * build that assumes at least one row. Row counts are NOT asserted
  * (0 or a fixture-driven constant are both legitimate); only
  * no-exception plus a collectable result.
  */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sf0").toString
    val names = Seq(
      "region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings"
    )
    names.foreach { n =>
      val schema = spark.read.parquet(s"$sf001/$n.parquet").schema
      spark
        .createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write
        .mode("overwrite")
        .parquet(s"$dir/$n.parquet")
    }
    dir
  }

  Registry.all.foreach { q =>
    test(s"${q.name} survives an empty corpus") {
      val n = q.run(spark, emptyDir).count()
      assert(n >= 0L)
    }
  }
}
