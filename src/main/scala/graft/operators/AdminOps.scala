package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small administrative CRUD gates — `R/addACOrg.R:1-85` and
  * `R/updateACDocument.R:1-269` (YukonWRB/AquaCache): organization
  * inserts with a case-insensitive duplicate probe, and document
  * updates where every `new_*` field is optional, validated against
  * its dimension, and coalesced over the stored row; geom
  * associations are replace-not-merge (the reference deletes the
  * document's links before inserting the new set).
  *
  * Batch-first like the other gates: the reference stops on the first
  * bad argument of one row, this classifies every row and returns
  * accepted/reject frames. Dimension probes broadcast; the duplicate
  * probes are joins, not driver lookups.
  */
object AdminOps {

  final case class OrgImport(accepted: DataFrame, rejects: DataFrame)

  /** Validate new organizations (`addACOrg`): name required,
    * case-insensitive uniqueness against the store AND within the
    * batch (first by name order wins), ids above the existing max.
    *
    * @param incoming name, name_fr, contact_name, phone, email, note
    * @param existing organization_id, name
    */
  def validateNewOrgs(incoming: DataFrame, existing: DataFrame): OrgImport = {
    import org.apache.spark.sql.expressions.Window
    val taken = existing
      .select(lower(col("name")).as("__key"))
      .distinct()
      .withColumn("__taken", lit(true))
    val ranked = incoming
      .withColumn("__key", lower(col("name")))
      .withColumn(
        "__batch_rank",
        row_number().over(Window.partitionBy(col("__key")).orderBy(col("name")))
      )
      .join(broadcast(taken), Seq("__key"), "left")
    val flagged = ranked.withColumn(
      "reject_reason",
      when(col("name").isNull || trim(col("name")) === "", "missing_name")
        .when(col("__taken").isNotNull, "duplicate_org")
        .when(col("__batch_rank") > 1, "duplicate_in_batch")
    )
    val accepted = SeqIds
      .assignIdsAbove(
        existing,
        "organization_id",
        flagged.filter(col("reject_reason").isNull),
        Seq(col("__key")),
        "organization_id"
      )
      .drop("__key", "__batch_rank", "__taken", "reject_reason")
    OrgImport(
      accepted,
      flagged
        .filter(col("reject_reason").isNotNull)
        .select(col("name"), col("reject_reason"))
    )
  }

  final case class DocumentUpdate(
      updated: DataFrame,
      geomLinks: DataFrame,
      rejects: DataFrame
  )

  /** Apply a batch of document updates (`updateACDocument`).
    *
    * @param updates   document_id + nullable new_name, new_type
    *                  (english label), new_description, new_url,
    *                  new_geoms (array<long>)
    * @param documents store: document_id, name, type_id, description,
    *                  url
    * @param documentTypes document_type_id, document_type_en
    * @param vectors   geom store: geom_id
    * @param existingLinks document_id, geom_id
    * @return updated store rows for the touched documents, the new
    *         link table (replace semantics for docs with new_geoms),
    *         rejects with reasons
    */
  def updateDocuments(
      updates: DataFrame,
      documents: DataFrame,
      documentTypes: DataFrame,
      vectors: DataFrame,
      existingLinks: DataFrame
  ): DocumentUpdate = {
    val types = documentTypes
      .select(lower(col("document_type_en")).as("__type_key"), col("document_type_id").as("__new_type_id"))
      .distinct()
    val stored = documents.select(
      col("document_id"),
      col("name").as("__old_name"),
      col("type_id").as("__old_type_id"),
      col("description").as("__old_description"),
      col("url").as("__old_url")
    )
    // a rename collides when ANOTHER stored document holds the name
    val namesTaken = documents
      .select(col("name").as("new_name"), col("document_id").as("__name_holder"))
    val geomSet = vectors.select(col("geom_id")).distinct()
    val validGeoms = updates
      .filter(col("new_geoms").isNotNull)
      .select(col("document_id"), explode(col("new_geoms")).as("geom_id"))
      .join(broadcast(geomSet), Seq("geom_id"), "left_semi")
      .groupBy(col("document_id"))
      .agg(collect_list(col("geom_id")).as("__valid_geoms"))
    val joined = updates
      .join(stored, Seq("document_id"), "left")
      .join(broadcast(namesTaken), Seq("new_name"), "left")
      .withColumn("__type_key", lower(col("new_type")))
      .join(broadcast(types), Seq("__type_key"), "left")
      .join(validGeoms, Seq("document_id"), "left")
    val flagged = joined.withColumn(
      "reject_reason",
      when(col("__old_name").isNull, "unknown_document")
        .when(col("new_description").isNotNull && length(col("new_description")) < 5, "short_description")
        .when(col("new_type").isNotNull && col("__new_type_id").isNull, "unknown_type")
        .when(
          col("__name_holder").isNotNull && col("__name_holder") =!= col("document_id"),
          "duplicate_name"
        )
        .when(
          col("new_geoms").isNotNull && size(coalesce(col("__valid_geoms"), array())) === 0,
          "no_valid_geoms"
        )
    )
    val accepted = flagged.filter(col("reject_reason").isNull)
    val updated = accepted.select(
      col("document_id"),
      coalesce(col("new_name"), col("__old_name")).as("name"),
      coalesce(col("__new_type_id"), col("__old_type_id")).as("type_id"),
      coalesce(col("new_description"), col("__old_description")).as("description"),
      coalesce(col("new_url"), col("__old_url")).as("url")
    )
    // replace semantics: docs with accepted new_geoms drop their old
    // links; everyone else keeps theirs
    val replacing = accepted
      .filter(col("new_geoms").isNotNull)
      .select(col("document_id"))
    val newLinks = accepted
      .filter(col("new_geoms").isNotNull)
      .select(col("document_id"), explode(col("__valid_geoms")).as("geom_id"))
    val geomLinks = existingLinks
      .join(replacing, Seq("document_id"), "left_anti")
      .unionByName(newLinks)
    DocumentUpdate(
      updated,
      geomLinks,
      flagged
        .filter(col("reject_reason").isNotNull)
        .select(col("document_id"), col("reject_reason"))
    )
  }
}
