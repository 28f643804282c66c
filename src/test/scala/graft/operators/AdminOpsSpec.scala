package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Org insert gates (`R/addACOrg.R`) and document update gates
  * (`R/updateACDocument.R`) on hand-built inputs, plus the db_dump
  * manifest/data round trip.
  */
class AdminOpsSpec extends SparkSpec {

  import spark.implicits._

  test("validateNewOrgs: case-insensitive dup probes, batch dedupe, id assignment") {
    val existing = Seq((3L, "Yukon Water Board")).toDF("organization_id", "name")
    val incoming = Seq(
      ("Environment Canada", "EC", "c", "p", "e", "n"),
      ("YUKON WATER BOARD", null, null, null, null, null), // taken, case-insensitive
      (null, null, null, null, null, null),                // missing name
      ("New Org", null, null, null, null, null),
      ("new org", null, null, null, null, null)            // dup within batch
    ).toDF("name", "name_fr", "contact_name", "phone", "email", "note")
    val imp = AdminOps.validateNewOrgs(incoming, existing)
    val ids = imp.accepted
      .select("name", "organization_id")
      .as[(String, Long)]
      .collect()
      .toMap
    assert(ids.keySet == Set("Environment Canada", "New Org"))
    assert(ids.values.toSet == Set(4L, 5L)) // above existing max 3
    val reasons = imp.rejects
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getString(1))
      .toMap
    assert(reasons == Map(
      "YUKON WATER BOARD" -> "duplicate_org",
      "<null>" -> "missing_name",
      "new org" -> "duplicate_in_batch"
    ))
  }

  test("updateDocuments: field coalescing, type resolution, geom replace semantics") {
    val documents = Seq(
      (1L, "doc_a", 0L, "first doc", null: String),
      (2L, "doc_b", 1L, "second doc", "http://old")
    ).toDF("document_id", "name", "type_id", "description", "url")
    val types = Seq((0L, "report"), (3L, "well log")).toDF("document_type_id", "document_type_en")
    val vectors = Seq(10L, 11L).toDF("geom_id")
    val links = Seq((1L, 10L), (2L, 10L)).toDF("document_id", "geom_id")
    val updates = Seq(
      // rename + retype + regeom doc 1; geom 99 silently dropped
      (1L, "doc_a2", "Well Log", null: String, null: String, Seq(11L, 99L)),
      (99L, "x", null: String, null: String, null: String, null: Seq[Long]), // unknown doc
      (2L, "doc_a", null: String, null: String, null: String, null: Seq[Long]) // name taken by doc 1
    ).toDF("document_id", "new_name", "new_type", "new_description", "new_url", "new_geoms")
    val r = AdminOps.updateDocuments(updates, documents, types, vectors, links)
    val updated = r.updated.collect().map(x => x.getLong(0) -> x).toMap
    assert(updated.keySet == Set(1L))
    assert(updated(1L).getString(1) == "doc_a2")
    assert(updated(1L).getLong(2) == 3L) // 'well log' resolved, case-insensitive
    assert(updated(1L).getString(3) == "first doc") // untouched field kept
    val reasons = r.rejects.as[(Long, String)].collect().toMap
    assert(reasons == Map(99L -> "unknown_document", 2L -> "duplicate_name"))
    // doc 1's links replaced (10 -> 11), doc 2's untouched
    val linkSet = r.geomLinks.as[(Long, Long)].collect().toSet
    assert(linkSet == Set((1L, 11L), (2L, 10L)))
  }

  test("updateDocuments: short description and all-unknown geoms reject") {
    val documents = Seq((1L, "doc_a", 0L, "d", null: String))
      .toDF("document_id", "name", "type_id", "description", "url")
    val types = Seq((0L, "report")).toDF("document_type_id", "document_type_en")
    val vectors = Seq(10L).toDF("geom_id")
    val links = Seq.empty[(Long, Long)].toDF("document_id", "geom_id")
    val r = AdminOps.updateDocuments(
      Seq(
        (1L, null: String, null: String, "tiny", null: String, null: Seq[Long])
      ).toDF("document_id", "new_name", "new_type", "new_description", "new_url", "new_geoms"),
      documents, types, vectors, links
    )
    assert(r.rejects.as[(Long, String)].collect().toMap == Map(1L -> "short_description"))
    val r2 = AdminOps.updateDocuments(
      Seq(
        (1L, null: String, null: String, null: String, null: String, Seq(98L, 99L))
      ).toDF("document_id", "new_name", "new_type", "new_description", "new_url", "new_geoms"),
      documents, types, vectors, links
    )
    assert(r2.rejects.as[(Long, String)].collect().toMap == Map(1L -> "no_valid_geoms"))
  }

  test("DbDump: schema manifest always, parquet data only with withData") {
    val dir = java.nio.file.Files.createTempDirectory("dbdump").toString
    val t1 = Seq((1L, "a", Seq("public_reader"))).toDF("id", "name", "share_with")
    val t2 = Seq((2L, 0.5)).toDF("k", "v")
    val schemaOnly = graft.jobs.DbDump.dump(Map("orgs" -> t1, "vals" -> t2), s"$dir/s")
    assert(schemaOnly.tableFiles.isEmpty)
    val manifest = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(schemaOnly.manifestFile)), "UTF-8")
    assert(manifest.contains("\"table\": \"orgs\"") && manifest.contains("\"public_reader\""))
    assert(manifest.contains("\"type\": \"double\""))

    val withData = graft.jobs.DbDump.dump(Map("vals" -> t2), s"$dir/d", withData = true)
    val back = spark.read.parquet(withData.tableFiles("vals"))
    assert(back.as[(Long, Double)].collect().toSeq == Seq((2L, 0.5)))
  }

  test("DbDump.restore: clean round trip, schema deviations reported not thrown") {
    val dir = java.nio.file.Files.createTempDirectory("dbrestore").toString
    val t1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val t2 = Seq((2L, 0.5)).toDF("k", "v")
    graft.jobs.DbDump.dump(Map("orgs" -> t1, "vals" -> t2), s"$dir/full", withData = true)
    val clean = graft.jobs.DbDump.restore(spark, s"$dir/full")
    assert(clean.mismatches.isEmpty, clean.mismatches.mkString("; "))
    assert(clean.tables.keySet == Set("orgs", "vals"))
    assert(clean.tables("orgs").count() == 2 && clean.tables("vals").count() == 1)

    // schema-only dump: data legs missing -> reported, no tables attached
    graft.jobs.DbDump.dump(Map("orgs" -> t1), s"$dir/schemaonly")
    val partial = graft.jobs.DbDump.restore(spark, s"$dir/schemaonly")
    assert(partial.tables.isEmpty)
    assert(partial.mismatches == Seq("orgs: no data leg in dump (schema-only)"))

    // drifted data: overwrite a table dir with a different schema
    Seq((1L, "a", true)).toDF("id", "renamed", "extra")
      .write.mode("overwrite").parquet(s"$dir/full/orgs")
    val drifted = graft.jobs.DbDump.restore(spark, s"$dir/full")
    assert(drifted.tables.keySet == Set("orgs", "vals"))
    assert(drifted.mismatches.exists(_.contains("orgs.name: in manifest, missing")))
    assert(drifted.mismatches.exists(_.contains("orgs.extra: in parquet, not in manifest")))
    assert(drifted.mismatches.exists(_.contains("orgs.renamed: in parquet, not in manifest")))
  }
}
