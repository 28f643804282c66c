package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Import-mapping profile CRUD + load/resolve semantics
  * (`R/import_mappings.R` in YukonWRB/AquaCache). */
class ImportProfilesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyMappings: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("import_mapping_id", LongType),
        StructField("import_source_id", LongType),
        StructField("source_match", StringType),
        StructField("parameter_id", LongType),
        StructField("result_type", LongType),
        StructField("sample_fraction_id", LongType),
        StructField("result_value_type", LongType),
        StructField("result_speciation_id", LongType),
        StructField("matrix_state_id", LongType),
        StructField("conversion", DoubleType),
        StructField("result_offset", DoubleType),
        StructField("priority", IntegerType),
        StructField("active", BooleanType),
        StructField("note", StringType)
      ))
    )

  private def sources0: DataFrame =
    Seq(
      (1L, "eccc_legacy", "ECCC legacy", null.asInstanceOf[String], true),
      (2L, "labx_2024.csv", "stale key", null.asInstanceOf[String], false)
    ).toDF("import_source_id", "source_code", "source_name", "source_description", "active")

  private def lookups: ImportProfiles.ImportLookups = {
    import ImportProfiles.Lookup
    ImportProfiles.ImportLookups(
      parameters = Lookup(
        Seq((201L, "zinc"), (202L, "copper"), (203L, "lead"), (204L, "iron"))
          .toDF("parameter_id", "param_name"),
        "parameter_id", Seq("param_name")),
      resultTypes = Lookup(
        Seq((1L, "numeric"), (2L, "text")).toDF("result_type_id", "result_type"),
        "result_type_id", Seq("result_type")),
      sampleFractions = Lookup(
        Seq((11L, "dissolved"), (12L, "total")).toDF("sample_fraction_id", "sample_fraction"),
        "sample_fraction_id", Seq("sample_fraction")),
      resultValueTypes = Lookup(
        Seq((1L, "actual")).toDF("result_value_type_id", "result_value_type"),
        "result_value_type_id", Seq("result_value_type")),
      resultSpeciations = Lookup(
        Seq((31L, "as N")).toDF("result_speciation_id", "result_speciation"),
        "result_speciation_id", Seq("result_speciation")),
      matrixStates = Lookup(
        Seq((41L, "liquid"), (42L, "solid")).toDF("matrix_state_id", "matrix_state"),
        "matrix_state_id", Seq("matrix_state"))
    )
  }

  test("upsertSources: conflict updates name and reactivates; new codes get fresh ids") {
    val out = ImportProfiles.upsertSources(
      sources0,
      Seq(
        ("labx_2024.csv", "fresh name", "d"),
        ("labx_2024", "LabX 2024", null.asInstanceOf[String])
      ).toDF("source_code", "source_name", "source_description")
    )
    val rows = out.collect()
    assert(rows.length == 3)
    val byCode = rows.map(r => r.getAs[String]("source_code") -> r).toMap
    assert(byCode("labx_2024.csv").getAs[Long]("import_source_id") == 2L) // id kept on conflict
    assert(byCode("labx_2024.csv").getAs[String]("source_name") == "fresh name")
    assert(byCode("labx_2024.csv").getAs[Boolean]("active")) // reactivated
    assert(byCode("labx_2024").getAs[Long]("import_source_id") == 3L) // max + 1
    assert(byCode("eccc_legacy").getAs[String]("source_name") == "ECCC legacy") // untouched
  }

  test("upsertSources: duplicate batch codes resolve by payload order, not scan order") {
    val out = ImportProfiles.upsertSources(
      sources0,
      Seq(
        ("newcode", "zzz later name", "dz"),
        ("newcode", "aaa first name", "da")
      ).toDF("source_code", "source_name", "source_description")
    ).filter(col("source_code") === "newcode").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("source_name") == "zzz later name")
    assert(out(0).getAs[String]("source_description") == "dz")
  }

  test("resolveTargets: candidate pick, numeric passthrough, 0->NA, label lookup, errors") {
    val batch = Seq(
      ("Zinc", "numeric", "dissolved", "", "", ""),
      ("203", "1", "0", "actual", "as n", "LIQUID"), // ints + case-insensitive labels
      ("", "text", "", "", "", "") // missing parameter allowed
    ).toDF("parameter", "result_type", "sample_fraction",
      "result_value_type", "result_speciation", "matrix_state")
    val out = ImportProfiles.resolveTargets(batch, lookups)
      .select("parameter_id", "result_type", "sample_fraction_id",
        "result_value_type", "result_speciation_id", "matrix_state_id",
        "conversion", "result_offset", "priority", "active")
      .collect()
    assert(out(0).getLong(0) == 201L && out(0).getLong(1) == 1L && out(0).getLong(2) == 11L)
    assert(out(0).isNullAt(3) && out(0).isNullAt(4) && out(0).isNullAt(5))
    assert(out(0).getDouble(6) == 1.0 && out(0).getDouble(7) == 0.0)
    assert(out(0).getInt(8) == 100 && out(0).getBoolean(9))
    assert(out(1).getLong(0) == 203L) // numeric id passthrough
    assert(out(1).isNullAt(2)) // sample_fraction "0" -> NA (allowNa)
    assert(out(1).getLong(3) == 1L && out(1).getLong(4) == 31L && out(1).getLong(5) == 41L)
    assert(out(2).isNullAt(0)) // missing parameter allowed
    // unknown label -> error
    val bad = Seq(("unobtanium", "numeric")).toDF("parameter", "result_type")
    val e = intercept[IllegalArgumentException](ImportProfiles.resolveTargets(bad, lookups))
    assert(e.getMessage.contains("unknown parameter"))
    // missing required result_type -> error
    val bad2 = Seq(("zinc", "")).toDF("parameter", "result_type")
    val e2 = intercept[IllegalArgumentException](ImportProfiles.resolveTargets(bad2, lookups))
    assert(e2.getMessage.contains("missing required result_type"))
    // ambiguous label (two ids share a lowercased name) -> error
    val ambLookups = lookups.copy(parameters = ImportProfiles.Lookup(
      Seq((201L, "zinc"), (299L, "ZINC")).toDF("parameter_id", "param_name"),
      "parameter_id", Seq("param_name")))
    val e3 = intercept[IllegalArgumentException](
      ImportProfiles.resolveTargets(Seq(("zinc", "numeric")).toDF("parameter", "result_type"), ambLookups))
    assert(e3.getMessage.contains("ambiguous parameter"))
  }

  test("upsertParameterMappings: JSON round-trip, ignore drop, conflict update") {
    val batch = Seq(
      ("CLICK", "MG/L", "zinc", "numeric", "1.0", ""),
      ("CLICK", "UG/L", "zinc", "numeric", "0.001", ""),
      ("PURCHASE", "MG/L", "lead", "numeric", "1.0", "yes") // ignored
    ).toDF("variable", "unit", "parameter", "result_type", "conversion", "ignore")
    val (s1, m1) = ImportProfiles.upsertParameterMappings(
      sources0, emptyMappings, "labx_2024", batch, Seq("variable", "unit"), lookups)
    assert(s1.filter(col("source_code") === "labx_2024").count() == 1)
    val rows = m1.orderBy("import_mapping_id").collect()
    assert(rows.length == 2) // ignore row dropped
    val jsons = rows.map(_.getAs[String]("source_match")).toSet
    assert(jsons == Set(
      """{"variable":"CLICK","unit":"MG/L"}""",
      """{"variable":"CLICK","unit":"UG/L"}"""))
    // re-upsert same match with a new conversion: id kept, payload updated
    val batch2 = Seq(("CLICK", "MG/L", "copper", "numeric", "2.5"))
      .toDF("variable", "unit", "parameter", "result_type", "conversion")
    val (_, m2) = ImportProfiles.upsertParameterMappings(
      s1, m1, "labx_2024", batch2, Seq("variable", "unit"), lookups)
    assert(m2.count() == 2)
    val updated = m2.filter(col("source_match") === """{"variable":"CLICK","unit":"MG/L"}""").head()
    assert(updated.getAs[Long]("parameter_id") == 202L)
    assert(updated.getAs[Double]("conversion") == 2.5)
    val kept = m1.filter(col("source_match") === """{"variable":"CLICK","unit":"MG/L"}""").head()
    assert(updated.getAs[Long]("import_mapping_id") == kept.getAs[Long]("import_mapping_id"))
  }

  test("qualifier mappings: defaults, condition label resolution, unknown rejected") {
    val conditions = Seq((1L, "below detection"), (2L, "above detection"))
      .toDF("result_condition_id", "result_condition")
    val existing = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("import_qualifier_mapping_id", LongType),
        StructField("import_source_id", LongType),
        StructField("import_profile_id", LongType),
        StructField("qualifier_column", StringType),
        StructField("qualifier_value", StringType),
        StructField("result_condition", LongType),
        StructField("result_condition_value_source", StringType),
        StructField("result_condition_value_literal", DoubleType),
        StructField("result_action", StringType),
        StructField("note_template", StringType),
        StructField("priority", IntegerType),
        StructField("active", BooleanType),
        StructField("note", StringType)
      )))
    val batch = Seq(("<", "Below Detection"), (">", "2")).toDF("qualifier_value", "result_condition")
    val out = ImportProfiles.upsertQualifierMappings(existing, 3L, None, batch, conditions)
    val rows = out.orderBy("qualifier_value").collect()
    assert(rows.length == 2)
    val lt = rows.find(_.getAs[String]("qualifier_value") == "<").get
    assert(lt.getAs[Long]("result_condition") == 1L) // label resolved case-insensitively
    assert(lt.getAs[String]("result_action") == "keep_result") // default
    assert(lt.getAs[Int]("priority") == 100 && lt.getAs[Boolean]("active"))
    val gt = rows.find(_.getAs[String]("qualifier_value") == ">").get
    assert(gt.getAs[Long]("result_condition") == 2L) // numeric passthrough
    // re-upsert same key updates in place
    val out2 = ImportProfiles.upsertQualifierMappings(
      out, 3L, None,
      Seq(("<", "above detection")).toDF("qualifier_value", "result_condition"), conditions)
    assert(out2.count() == 2)
    assert(out2.filter(col("qualifier_value") === "<").head().getAs[Long]("result_condition") == 2L)
    val e = intercept[IllegalArgumentException](
      ImportProfiles.upsertQualifierMappings(
        existing, 3L, None, Seq(("<", "nonesuch")).toDF("qualifier_value", "result_condition"),
        conditions))
    assert(e.getMessage.contains("Unknown result_condition"))
  }

  test("upload sessions: create assigns next id; appendRows upserts on the staged key") {
    val sessions = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("import_upload_session_id", LongType),
        StructField("import_profile_id", LongType),
        StructField("source_file_name", StringType),
        StructField("source_file_hash", StringType),
        StructField("source_file_size", LongType),
        StructField("summary", StringType),
        StructField("validation_summary", StringType),
        StructField("note", StringType)
      )))
    val (s1, id1) = ImportProfiles.createUploadSession(
      sessions, 7L, fileName = Some("lab.xlsx"), fileSize = Some(1234L))
    assert(id1 == 1L && s1.count() == 1)
    val (s2, id2) = ImportProfiles.createUploadSession(s1, 7L)
    assert(id2 == 2L && s2.count() == 2)

    val rows0 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("import_upload_session_id", LongType),
        StructField("sheet_name", StringType),
        StructField("source_row_number", IntegerType),
        StructField("result_index", IntegerType),
        StructField("source_record", StringType),
        StructField("normalized_sample", StringType),
        StructField("normalized_result", StringType),
        StructField("validation_status", StringType),
        StructField("validation_messages", StringType),
        StructField("sample_id", LongType),
        StructField("result_id", LongType)
      )))
    val staged = ImportProfiles.appendUploadRows(
      rows0, id1,
      Seq((Some("Sheet1"), 2), (None, 3)).toDF("sheet_name", "source_row_number"))
    assert(staged.count() == 2)
    assert(staged.filter(col("validation_status") === "pending").count() == 2)
    // re-validate row 2: same key -> updated, not duplicated
    val revalidated = ImportProfiles.appendUploadRows(
      staged, id1,
      Seq((Some("Sheet1"), 2, "valid")).toDF("sheet_name", "source_row_number", "validation_status"))
    assert(revalidated.count() == 2)
    assert(
      revalidated
        .filter(col("sheet_name") === "Sheet1" && col("source_row_number") === 2)
        .head().getAs[String]("validation_status") == "valid")
  }

  test("appendRows: null row numbers neither collapse the batch nor duplicate on re-upload") {
    val rows0 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("import_upload_session_id", LongType),
        StructField("sheet_name", StringType),
        StructField("source_row_number", IntegerType),
        StructField("result_index", IntegerType),
        StructField("source_record", StringType),
        StructField("normalized_sample", StringType),
        StructField("normalized_result", StringType),
        StructField("validation_status", StringType),
        StructField("validation_messages", StringType),
        StructField("sample_id", LongType),
        StructField("result_id", LongType)
      )))
    // no source_row_number column at all: rows distinguished by result_index
    val batch = Seq(("Sheet1", 1, "{\"a\":1}"), ("Sheet1", 2, "{\"a\":2}"))
      .toDF("sheet_name", "result_index", "source_record")
    val staged = ImportProfiles.appendUploadRows(rows0, 1L, batch)
    assert(staged.count() == 2, "null row numbers must not collapse distinct result_index rows")
    // re-upload the same keys: replaced in place, not duplicated
    val again = ImportProfiles.appendUploadRows(
      staged, 1L,
      Seq(("Sheet1", 1, "valid")).toDF("sheet_name", "result_index", "validation_status"))
    assert(again.count() == 2, "null-keyed re-upload must update in place")
    assert(
      again.filter(col("result_index") === 1).head().getAs[String]("validation_status") == "valid")
  }

  test("upsertParameterMappings preserves an existing source's name/description when omitted") {
    val srcs = Seq((1L, "labx_2024", "LabX 2024 export", "quarterly results", true))
      .toDF("import_source_id", "source_code", "source_name", "source_description", "active")
    val batch = Seq(("CLICK", "zinc", "numeric", "1.0", "100"))
      .toDF("variable", "parameter", "result_type", "conversion", "priority")
    val (s1, _) = ImportProfiles.upsertParameterMappings(
      srcs, emptyMappings, "labx_2024", batch, Seq("variable"), lookups)
    val row = s1.filter(col("source_code") === "labx_2024").head()
    assert(row.getAs[String]("source_name") == "LabX 2024 export")
    assert(row.getAs[String]("source_description") == "quarterly results")
  }

  test("candidateKeys: key, sans-ext, basename, basename-sans-ext in order") {
    assert(ImportProfiles.candidateKeys("uploads/labx_2024.csv") ==
      Seq("uploads/labx_2024.csv", "uploads/labx_2024", "labx_2024.csv", "labx_2024"))
    assert(ImportProfiles.candidateKeys("plain") == Seq("plain"))
    assert(ImportProfiles.candidateKeys("a.b") == Seq("a.b", "a"))
  }

  test("loadMappings: inactive source and mapping-less source fall through to later candidates") {
    val batch = Seq(("CLICK", "MG/L", "zinc", "numeric"))
      .toDF("variable", "unit", "parameter", "result_type")
    val (s1, m1) = ImportProfiles.upsertParameterMappings(
      sources0, emptyMappings, "labx_2024", batch, Seq("variable", "unit"), lookups)
    // candidate 3 "labx_2024.csv" names an INACTIVE source; candidate 4 wins
    val Some((code, loaded)) = ImportProfiles.loadMappings(s1, m1, "uploads/labx_2024.csv")
    assert(code == "labx_2024")
    assert(loaded.count() == 1)
    assert(loaded.head().getAs[Int]("source_match_size") == 2)
    // a source with zero ACTIVE mappings also falls through
    val inactiveM = m1.withColumn("active", lit(false))
    assert(ImportProfiles.loadMappings(s1, inactiveM, "uploads/labx_2024.csv").isEmpty)
    assert(ImportProfiles.loadMappings(s1, m1, "nonesuch.csv").isEmpty)
  }

  test("resolveMatches: specificity beats key-count ties, priority beats specificity, ties raise") {
    val sources = sources0
    val b1 = Seq(
      ("ERROR", "MG/L", "iron", "numeric", "100"),
      ("VIEW", "MG/L", "zinc", "numeric", "100")
    ).toDF("variable", "unit", "parameter", "result_type", "priority")
    val (s1, m1) = ImportProfiles.upsertParameterMappings(
      sources, emptyMappings, "labx_2024", b1, Seq("variable", "unit"), lookups)
    val b2 = Seq(
      ("ERROR", "lead", "numeric", "100"), // less specific, same priority
      ("VIEW", "copper", "numeric", "10") // less specific, BETTER priority
    ).toDF("variable", "parameter", "result_type", "priority")
    val (_, m2) = ImportProfiles.upsertParameterMappings(
      s1, m1, "labx_2024", b2, Seq("variable"), lookups)
    val Some((_, loaded)) = ImportProfiles.loadMappings(s1, m2, "labx_2024")
    val records = Seq(
      (1L, "ERROR", "MG/L"), (2L, "ERROR", "UG/L"), (3L, "VIEW", "MG/L"), (4L, "SIGNUP", "MG/L")
    ).toDF("rec_id", "variable", "unit")
    val out = ImportProfiles
      .resolveMatches(records, Seq("variable", "unit"), loaded)
      .select("rec_id", "parameter_id").orderBy("rec_id").collect()
    assert(out(0).getLong(1) == 204L) // iron: 2 criteria beat 1 at equal priority
    assert(out(1).getLong(1) == 203L) // lead: only the 1-criterion mapping matches
    assert(out(2).getLong(1) == 202L) // copper: priority 10 beats specificity
    assert(out(3).isNullAt(1)) // unmapped
    // a true (priority, specificity) tie raises, as in the reference:
    // {variable:ERROR} (prio 100, 1 criterion) vs a new {unit:UG/L}
    // (prio 100, 1 criterion) both match ERROR/UG/L and nothing more
    // specific does
    val (_, mA) = ImportProfiles.upsertParameterMappings(
      s1, m2, "labx_2024",
      Seq(("UG/L", "zinc", "numeric", "100")).toDF("unit", "parameter", "result_type", "priority"),
      Seq("unit"), lookups)
    val Some((_, loadedTie)) = ImportProfiles.loadMappings(s1, mA, "labx_2024")
    val e = intercept[IllegalStateException](
      ImportProfiles
        .resolveMatches(Seq((1L, "ERROR", "UG/L")).toDF("rec_id", "variable", "unit"),
          Seq("variable", "unit"), loadedTie)
        .collect())
    assert(e.getMessage.contains("equal priority and specificity"))
  }
}
