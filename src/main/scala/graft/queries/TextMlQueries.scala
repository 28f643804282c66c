package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.TestTables

/** Training-data-pipeline operators over `documents` / `embeddings`. */
object TextMlQueries {

  /** Exact dedup: hash-groupBy on full text (one shuffle on the
    * 128-bit digest — at 100 TB this is the canonical exact-dedup
    * pattern; the digest is tiny vs the payload so shuffle bytes stay
    * bounded if text is dropped before the shuffle, which Catalyst
    * does here via column pruning).
    */
  private def dedupExact(s: SparkSession, d: String): DataFrame =
    TestTables.documents(s, d)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  private val dedupExactSql =
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY canonical_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_exact", dedupExact, Some(dedupExactSql))
  )
}
