package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-store ingest — `R/insertACDocument.R:26-160` /
  * `R/updateACDocument.R` (YukonWRB/AquaCache): documents are binary
  * payloads deduplicated on their CONTENT hash (`ON CONFLICT
  * (file_hash) DO NOTHING`, `:150`), typed against a known
  * document-type list, shared via RLS groups, and optionally
  * associated with vector geometries (many-to-many doc↔geom).
  *
  * Spark shape: the hash is computed scan-side, dedupe is one anti
  * join on it (plus in-batch first-wins), the type check a broadcast
  * semi join — a million documents ingest as one plan.
  */
object DocumentIngest {

  final case class DocImport(accepted: DataFrame, rejects: DataFrame, geomLinks: DataFrame)

  /** @param incoming   name, doc_type, payload BINARY, share_with
    *                   array, optional geom_ids array
    * @param knownTypes doc_type dimension (thesis/report/map/...)
    * @param existing   current store: file_hash
    * @param knownGeoms geom_id dimension (vector store ids)
    */
  def ingest(
      incoming: DataFrame,
      knownTypes: DataFrame,
      existing: DataFrame,
      knownGeoms: DataFrame
  ): DocImport = {
    val hashed = incoming.withColumn(
      "file_hash",
      graft.functions.PortableHash.md5num56(col("payload"))
    )
    val types = knownTypes
      .select(col("doc_type"))
      .distinct()
      .withColumn("__type_ok", lit(true))
    // in-batch duplicate content: keep one deterministic winner
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("file_hash"))
      .orderBy(col("name"))
    val flagged = hashed
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(types), Seq("doc_type"), "left")
      .join(
        // distinct: the store dedups on file_hash by invariant, but a
        // duplicated hash here must mark existence once, not fan the
        // incoming row out per store copy (surfaced at sf0.1, where
        // the fixture's existing set carries repeated dup_* hashes —
        // every fanned copy landed as an extra reject row)
        existing.select(col("file_hash")).distinct().withColumn("__exists", lit(true)),
        Seq("file_hash"),
        "left"
      )
      .withColumn(
        "reject_reason",
        when(col("name").isNull || trim(col("name")) === "", "missing_name")
          .when(col("__type_ok").isNull, "unknown_type")
          .when(size(coalesce(col("share_with"), array())) === 0, "missing_share_with")
          .when(col("__exists").isNotNull, "duplicate_content")
          .when(col("__rn") > 1, "duplicate_in_batch")
      )
      .drop("__type_ok", "__exists", "__rn")
    val accepted = flagged.filter(col("reject_reason").isNull).drop("reject_reason")
    // doc↔geom association rows, only for geoms that exist
    val geomLinks = accepted
      .select(col("file_hash"), explode(coalesce(col("geom_ids"), array())).as("geom_id"))
      .join(knownGeoms.select(col("geom_id")).distinct(), Seq("geom_id"), "left_semi")
      .select(col("file_hash"), col("geom_id"))
    DocImport(
      accepted = accepted,
      rejects = flagged
        .filter(col("reject_reason").isNotNull)
        .select(col("name"), col("reject_reason")),
      geomLinks = geomLinks
    )
  }
}
