package graft.sources

import graft.operators.{SeqIds, Upsert}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Import-mapping profile management — the discrete-import key/profile
  * CRUD of YukonWRB/AquaCache (`R/import_mappings.R`): reusable upload
  * profiles, parameter-mapping keys matched by a caller-chosen column
  * set serialized as a `source_match` JSON object, qualifier mappings,
  * staged upload sessions, and the load/resolve path `downloadECCCwq`/
  * `downloadEQWin` consume (`R/import_mappings.R:25`
  * upsertImportParameterMappings, `:234` upsertImportProfile, `:501`
  * upsertImportQualifierMappings, `:650-708` upload sessions, `:922`
  * import_mapping_resolve_targets, `:1181` import_mapping_load_db,
  * `:1259` import_mapping_resolve_match).
  *
  * Spark-first: every table here is a catalog-sized dimension, so the
  * maintenance ops are keyed [[graft.operators.Upsert]] merges and the
  * interesting distributed work is [[resolveMatches]] — matching an
  * arbitrarily large record stream against the mapping dimension. The
  * reference resolves one record at a time in R; here the mapping
  * criteria are a broadcast map column and the subset-match + best-of
  * (priority asc, specificity desc, id asc) selection is one join and
  * one per-record window, so a 100 TB import stream maps in a single
  * pass with no driver round trips.
  */
object ImportProfiles {

  // ---------------------------------------------------------------
  // value normalization (import_mapping_is_missing / _as_logical)
  // ---------------------------------------------------------------

  /** NULL, empty/whitespace, or the literals NA/NULL (any case) —
    * `R/import_mappings.R:1142`. */
  def isMissingStr(c: Column): Column =
    c.isNull || trim(c) === "" || upper(trim(c)).isin("NA", "NULL")

  /** true/t/1/yes/y and false/f/0/no/n (any case) -> boolean, else
    * NULL — `R/import_mappings.R:1164`. */
  def asLogical(c: Column): Column = {
    val v = trim(lower(c.cast("string")))
    when(v.isin("true", "t", "1", "yes", "y"), lit(true))
      .when(v.isin("false", "f", "0", "no", "n"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Blank or literal-NA string columns -> NULL, excluding `exclude`
    * (match columns keep "" distinct from NULL so an empty source cell
    * is still a matchable criterion) — `R/import_mappings.R:71`. */
  def blankToNa(df: DataFrame, exclude: Set[String]): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (acc, f)
          if f.dataType == org.apache.spark.sql.types.StringType
            && !exclude.contains(f.name) =>
        acc.withColumn(f.name, when(isMissingStr(col(f.name)), lit(null)).otherwise(col(f.name)))
      case (acc, _) => acc
    }

  // ---------------------------------------------------------------
  // sources (discrete.import_sources)
  // ---------------------------------------------------------------

  /** ON CONFLICT (source_code) DO UPDATE name/description/active=TRUE;
    * new codes get ids above max(existing) in source_code order —
    * `R/import_mappings.R:108-119`. */
  def upsertSources(existing: DataFrame, batch: DataFrame): DataFrame = {
    // total per-code rule (max over the payload struct — same rule as
    // Upsert) rather than dropDuplicates("source_code"): a key-subset
    // dropDuplicates keeps a scan-order-dependent row, so a retried
    // task could emit a different (name, description) than the lost
    // attempt
    val incoming = batch
      .select(col("source_code"), col("source_name"), col("source_description"))
      .groupBy(col("source_code"))
      .agg(max(struct(col("source_name"), col("source_description"))).as("__p"))
      .select(
        col("source_code"),
        col("__p.source_name").as("source_name"),
        col("__p.source_description").as("source_description")
      )
    val known = incoming
      .join(existing.select(col("import_source_id"), col("source_code")), Seq("source_code"))
    val fresh = SeqIds.assignIdsAbove(
      existing,
      "import_source_id",
      incoming.join(existing.select("source_code"), Seq("source_code"), "left_anti"),
      Seq(col("source_code")),
      "import_source_id",
      smallBatch = true // profile/key uploads are dimension-sized by definition
    )
    val staged = known
      .unionByName(fresh)
      .withColumn("active", lit(true))
      .select("import_source_id", "source_code", "source_name", "source_description", "active")
    Upsert(existing, staged, Seq("source_code"), Upsert.DoUpdate)
  }

  // ---------------------------------------------------------------
  // profiles (discrete.import_profiles)
  // ---------------------------------------------------------------

  /** Profile config columns in table order; JSON-valued fields are
    * stored as compact JSON text (column_map, wide_config, defaults,
    * sample_identity, result_identity, validation_rules). */
  val ProfileCols: Seq[String] = Seq(
    "import_profile_id", "import_source_id", "profile_code", "profile_name",
    "profile_description", "file_type", "parser_type", "sheet_strategy",
    "sheet_name", "sheet_index", "header_row", "units_row", "parameter_row",
    "data_start_row", "datetime_origin", "timezone", "column_map",
    "wide_config", "defaults", "sample_identity", "result_identity",
    "validation_rules", "active", "note"
  )

  /** ON CONFLICT (import_source_id, profile_code) DO UPDATE everything
    * else — `R/import_mappings.R:339-367`. `batch` carries source_code;
    * unknown codes are an error (callers upsert the source first, as
    * the reference's import_mapping_upsert_source does). */
  def upsertProfiles(existing: DataFrame, sources: DataFrame, batch: DataFrame): DataFrame = {
    val withId = batch.join(
      broadcast(sources.select(col("import_source_id"), col("source_code"))),
      Seq("source_code"),
      "left"
    )
    require(
      withId.filter(col("import_source_id").isNull).isEmpty,
      "upsertProfiles: batch references source_code(s) absent from import_sources"
    )
    val keyed = withId.drop("source_code")
    val known = keyed.join(
      existing.select(
        col("import_source_id"), col("profile_code"), col("import_profile_id")),
      Seq("import_source_id", "profile_code")
    )
    val fresh = SeqIds.assignIdsAbove(
      existing,
      "import_profile_id",
      keyed.join(
        existing.select("import_source_id", "profile_code"),
        Seq("import_source_id", "profile_code"),
        "left_anti"
      ),
      Seq(col("import_source_id"), col("profile_code")),
      "import_profile_id",
      smallBatch = true // profile/key uploads are dimension-sized by definition
    )
    val staged = known.unionByName(fresh).select(ProfileCols.map(col): _*)
    Upsert(existing, staged, Seq("import_source_id", "profile_code"), Upsert.DoUpdate)
  }

  // ---------------------------------------------------------------
  // target resolution (import_mapping_resolve_targets)
  // ---------------------------------------------------------------

  /** One lookup dimension: id column + the label columns a name may
    * match (case-insensitively) — `R/import_mappings.R:938-996`.
    *
    * The label table is a catalog dimension (parameters, result
    * types, ...), so it collects ONCE into a literal map — the same
    * dimension-collect discipline as Corrections/Guidelines — and
    * resolution becomes a pure projection instead of six
    * shuffle-backed joins per batch. */
  final case class Lookup(df: DataFrame, idCol: String, labelCols: Seq[String]) {
    /** (lower(trim(label)), id) pairs as a tagged frame — unioned
      * across all six dimensions so [[ImportLookups]] collects them in
      * ONE job instead of six. */
    private[ImportProfiles] def tagged(tag: String): DataFrame =
      labelCols
        .map(lc =>
          df.select(
            lit(tag).as("t"),
            trim(lower(col(lc))).cast("string").as("l"),
            col(idCol).cast("long").as("id")
          )
        )
        .reduce(_ unionByName _)
  }

  /** One resolved label dimension: lower(trim(label)) -> id, plus the
    * set of DB-side-ambiguous labels (several ids share one lowercased
    * name). */
  final case class ResolvedLookup(labelMap: Map[String, Long], ambiguous: Set[String])

  /** The six AquaCache target dimensions. */
  final case class ImportLookups(
      parameters: Lookup,
      resultTypes: Lookup,
      sampleFractions: Lookup,
      resultValueTypes: Lookup,
      resultSpeciations: Lookup,
      matrixStates: Lookup
  ) {
    /** All six label maps, collected in ONE Spark job (lookups are
      * catalog dimensions; this is the Corrections/Guidelines
      * dimension-collect discipline, fused). */
    lazy val resolved: Map[String, ResolvedLookup] = {
      val all = Seq(
        "parameter" -> parameters,
        "result_type" -> resultTypes,
        "sample_fraction" -> sampleFractions,
        "result_value_type" -> resultValueTypes,
        "result_speciation" -> resultSpeciations,
        "matrix_state" -> matrixStates
      )
      val rows = all
        .map { case (tag, lk) => lk.tagged(tag) }
        .reduce(_ unionByName _)
        .collect()
        .collect {
          case r if !r.isNullAt(1) && r.getString(1).nonEmpty =>
            (r.getString(0), r.getString(1), r.getLong(2))
        }
        .distinct
      val byTag = rows.groupBy(_._1)
      all.map { case (tag, _) =>
        val grouped = byTag.getOrElse(tag, Array.empty).groupBy(_._2)
        tag -> ResolvedLookup(
          grouped.map { case (l, hits) => l -> hits.map(_._3).min },
          grouped.collect { case (l, hits) if hits.length > 1 => l }.toSet
        )
      }.toMap
    }
  }

  /** Default candidate input columns per target field —
    * `R/import_mappings.R:903-912`. */
  val DefaultTargetColumns: Map[String, Seq[String]] = Map(
    "parameter" -> Seq("parameter_id", "parameter", "param_name"),
    "result_type" -> Seq("result_type", "result_type_id"),
    "sample_fraction" -> Seq("sample_fraction_id", "sample_fraction"),
    "result_value_type" -> Seq("result_value_type", "result_value_type_id"),
    "result_speciation" -> Seq("result_speciation_id", "result_speciation"),
    "matrix_state" -> Seq("matrix_state_id", "matrix_state")
  )

  /** Resolves one target field: the first candidate column present in
    * `df` supplies values; integers pass through (0 -> NULL when
    * allowNa), labels join the lookup case-insensitively; unknown and
    * ambiguous labels, and missing-but-required values, append to the
    * `__errs` array instead of throwing row-by-row — the caller
    * validates once. */
  private def resolveField(
      df: DataFrame,
      candidates: Seq[String],
      lookup: ResolvedLookup,
      outCol: String,
      valueName: String,
      allowNa: Boolean
  ): DataFrame = {
    val inColOpt = candidates.find(df.columns.contains)
    inColOpt match {
      case None =>
        val base =
          if (allowNa) df
          else
            df.withColumn(
              "__errs",
              array_union(col("__errs"), array(lit(s"missing required $valueName")))
            )
        base.withColumn(outCol, lit(null).cast("long"))
      case Some(inCol) =>
        val v = col(inCol).cast("string")
        val isInt = v.rlike("^\\s*[0-9]+\\s*$")
        val isBool = asLogical(col(inCol)).isNotNull &&
          col(inCol).cast("string").rlike("(?i)^\\s*(true|t|false|f|yes|y|no|n)\\s*$")
        val key = lower(trim(v))
        // dimension-collected literal map: resolution is a projection,
        // not a join — no shuffle, no broadcast job per field
        val hit =
          if (lookup.labelMap.isEmpty) lit(null).cast("long")
          else element_at(typedLit(lookup.labelMap), key)
        val isAmbiguous =
          if (lookup.ambiguous.isEmpty) lit(false) else key.isin(lookup.ambiguous.toSeq: _*)
        val intVal = trim(v).cast("long")
        val boolVal = asLogical(col(inCol)).cast("long")
        val resolved = when(isMissingStr(v), lit(null).cast("long"))
          .when(isBool, if (allowNa) nullif(boolVal, lit(0L)) else boolVal)
          .when(isInt, if (allowNa) nullif(intVal, lit(0L)) else intVal)
          .otherwise(hit)
        val err = when(isMissingStr(v) && !allowNa, concat(lit(s"missing required $valueName")))
          .when(
            !isMissingStr(v) && !isInt && !isBool && isAmbiguous,
            concat(lit(s"ambiguous $valueName: "), v)
          )
          .when(
            !isMissingStr(v) && !isInt && !isBool && hit.isNull,
            concat(lit(s"unknown $valueName: "), v)
          )
        df.withColumn(outCol, resolved)
          .withColumn(
            "__errs",
            when(err.isNotNull, array_union(col("__errs"), array(err))).otherwise(col("__errs"))
          )
    }
  }

  /** `import_mapping_resolve_targets` (`R/import_mappings.R:922`): adds
    * parameter_id / result_type / sample_fraction_id /
    * result_value_type / result_speciation_id / matrix_state_id from
    * whichever candidate columns the input carries, plus the
    * conversion/result_offset/priority/active/note defaults. Throws on
    * the first batch containing unknown/ambiguous/missing-required
    * values (one validation action, not one per field). */
  def resolveTargets(
      mappings: DataFrame,
      lookups: ImportLookups,
      targetColumns: Map[String, Seq[String]] = DefaultTargetColumns
  ): DataFrame = {
    val out = resolveTargetsKeepErrs(mappings, lookups, targetColumns)
    val bad = out.filter(size(col("__errs")) > 0).select(col("__errs")).limit(1).collect()
    if (bad.nonEmpty) {
      throw new IllegalArgumentException(
        "import mapping batch failed target resolution: " + bad.head.getSeq[String](0).mkString("; ")
      )
    }
    out.drop("__errs")
  }

  /** [[resolveTargets]] minus the validation action: returns the frame
    * WITH its `__errs` array so a caller can fuse the error probe into
    * another driver job (upsertParameterMappings folds it into its
    * single id/validation probe). */
  private def resolveTargetsKeepErrs(
      mappings: DataFrame,
      lookups: ImportLookups,
      targetColumns: Map[String, Seq[String]]
  ): DataFrame = {
    val tc = DefaultTargetColumns ++ targetColumns
    var out = mappings.withColumn("__errs", array().cast("array<string>"))
    val lk = lookups.resolved // ONE collect for all six dimensions
    out = resolveField(out, tc("parameter"), lk("parameter"), "parameter_id", "parameter", allowNa = true)
    out = resolveField(out, tc("result_type"), lk("result_type"), "result_type", "result_type", allowNa = false)
    out = resolveField(out, tc("sample_fraction"), lk("sample_fraction"), "sample_fraction_id", "sample_fraction", allowNa = true)
    out = resolveField(out, tc("result_value_type"), lk("result_value_type"), "result_value_type", "result_value_type", allowNa = true)
    out = resolveField(out, tc("result_speciation"), lk("result_speciation"), "result_speciation_id", "result_speciation", allowNa = true)
    out = resolveField(out, tc("matrix_state"), lk("matrix_state"), "matrix_state_id", "matrix_state", allowNa = true)
    def ensure(name: String, dflt: Column, fill: Column => Column): DataFrame => DataFrame =
      df =>
        if (df.columns.contains(name)) df.withColumn(name, fill(col(name))) else df.withColumn(name, dflt)
    out = ensure("conversion", lit(1.0), c => coalesce(c.cast("double"), lit(1.0)))(out)
    out = ensure("result_offset", lit(0.0), c => coalesce(c.cast("double"), lit(0.0)))(out)
    out = ensure("priority", lit(100), c => coalesce(c.cast("int"), lit(100)))(out)
    out = ensure("active", lit(true), c => coalesce(asLogical(c), lit(true)))(out)
    out = ensure("note", lit(null).cast("string"), c => c.cast("string"))(out)
    out
  }

  // ---------------------------------------------------------------
  // parameter mappings (discrete.import_parameter_mappings)
  // ---------------------------------------------------------------

  /** Compact `{"col":"value",...}` in matchColumns order; missing
    * values serialize as "" — `import_mapping_source_match_json`
    * (`R/import_mappings.R:36`). */
  def sourceMatchJson(matchColumns: Seq[String]): Column =
    to_json(struct(matchColumns.map(c =>
      coalesce(col(c).cast("string"), lit("")).as(c)): _*))

  val MappingCols: Seq[String] = Seq(
    "import_mapping_id", "import_source_id", "source_match", "parameter_id",
    "result_type", "sample_fraction_id", "result_value_type",
    "result_speciation_id", "matrix_state_id", "conversion", "result_offset",
    "priority", "active", "note"
  )

  /** `upsertImportParameterMappings` (`R/import_mappings.R:25`): blank
    * scrub (match columns excluded), ignore-row drop, target
    * resolution, source_match JSON, then ON CONFLICT
    * (import_source_id, source_match) DO UPDATE. Returns
    * (sources', mappings'). */
  def upsertParameterMappings(
      sources: DataFrame,
      mappings: DataFrame,
      sourceCode: String,
      batch: DataFrame,
      matchColumns: Seq[String],
      lookups: ImportLookups,
      sourceName: Option[String] = None,
      sourceDescription: Option[String] = None,
      targetColumns: Map[String, Seq[String]] = DefaultTargetColumns
  ): (DataFrame, DataFrame) = {
    require(sourceCode.nonEmpty, "'source_code' must be a single non-empty value")
    require(matchColumns.nonEmpty, "'match_columns' must name at least one column")
    val missing = matchColumns.filterNot(batch.columns.contains)
    require(missing.isEmpty, s"mapping input is missing match_columns: ${missing.mkString(", ")}")
    val spark = sources.sparkSession
    import spark.implicits._

    var staged = blankToNa(batch, exclude = matchColumns.toSet)
    if (staged.columns.contains("ignore")) {
      staged = staged
        .filter(asLogical(col("ignore")).isNull || !asLogical(col("ignore")))
        .drop("ignore")
    }
    val resolved = resolveTargetsKeepErrs(staged, lookups, targetColumns)

    // ONE driver probe for the whole gate set: source max-id + this
    // code's existing row, the mapping max-id, AND the target-
    // resolution error scan — the reference runs these as separate
    // per-call DB queries; here each would be a separate Spark job
    // whose launch latency dominates on dimension-sized tables
    val idRow = sources
      .agg(
        coalesce(max(col("import_source_id")), lit(0L)).as("max_id"),
        max(when(col("source_code") === sourceCode, col("import_source_id"))).as("existing_id"),
        max(when(col("source_code") === sourceCode, col("source_name"))).as("existing_name"),
        max(when(col("source_code") === sourceCode, col("source_description"))).as("existing_desc")
      )
      .crossJoin(
        mappings.agg(coalesce(max(col("import_mapping_id")), lit(0L)).as("max_mapping_id"))
      )
      .join(
        resolved.filter(size(col("__errs")) > 0).select(col("__errs")).limit(1),
        lit(true),
        "left"
      )
      .head()
    if (!idRow.isNullAt(5)) {
      throw new IllegalArgumentException(
        "import mapping batch failed target resolution: " + idRow.getSeq[String](5).mkString("; ")
      )
    }
    val sourceId = if (idRow.isNullAt(1)) idRow.getLong(0) + 1L else idRow.getLong(1)
    // an omitted name/description PRESERVES the stored value on an
    // existing source (update only what the caller provided) instead
    // of reverting the name to the code and nulling the description
    val srcName =
      sourceName.orElse(Option(idRow.getString(2))).getOrElse(sourceCode)
    val srcDesc = sourceDescription.orElse(Option(idRow.getString(3))).orNull
    val srcRow = Seq(
      (sourceId, sourceCode, srcName, srcDesc, true)
    ).toDF("import_source_id", "source_code", "source_name", "source_description", "active")
    val newSources = Upsert(sources, srcRow, Seq("source_code"), Upsert.DoUpdate)

    staged = resolved
      .drop("__errs")
      .withColumn("import_source_id", lit(sourceId))
      .withColumn("source_match", sourceMatchJson(matchColumns))
    val maxId = idRow.getLong(4)
    val known = staged.join(
      mappings.select(col("import_source_id"), col("source_match"), col("import_mapping_id")),
      Seq("import_source_id", "source_match")
    )
    val fresh = SeqIds.globalRank(
      staged.join(
        mappings.select("import_source_id", "source_match"),
        Seq("import_source_id", "source_match"),
        "left_anti"
      ),
      Seq(col("source_match")),
      "__rk",
      smallBatch = true // profile/key uploads are dimension-sized by definition
    ).withColumn("import_mapping_id", lit(maxId) + col("__rk")).drop("__rk")
    val upserted = Upsert(
      mappings,
      known.unionByName(fresh).select(MappingCols.map(col): _*),
      Seq("import_source_id", "source_match"),
      Upsert.DoUpdate
    // lazy lineage cut: the upserted table is dimension-sized and every
    // downstream consumer (a follow-up upsert, loadMappings, the
    // resolve join) would otherwise replay this call's whole join DAG
    ).localCheckpoint(false)
    (newSources, upserted)
  }

  // ---------------------------------------------------------------
  // qualifier mappings (discrete.import_qualifier_mappings)
  // ---------------------------------------------------------------

  val QualifierCols: Seq[String] = Seq(
    "import_qualifier_mapping_id", "import_source_id", "import_profile_id",
    "qualifier_column", "qualifier_value", "result_condition",
    "result_condition_value_source", "result_condition_value_literal",
    "result_action", "note_template", "priority", "active", "note"
  )

  /** `upsertImportQualifierMappings` (`R/import_mappings.R:501`):
    * optional-column defaults, result_condition resolution (integer
    * passthrough or case-insensitive label in `conditions`), keyed
    * upsert on (source, profile, qualifier_column, qualifier_value) —
    * NULL profile/column are part of the key, so the merge key is
    * null-safe. */
  def upsertQualifierMappings(
      existing: DataFrame,
      sourceId: Long,
      profileId: Option[Long],
      batch: DataFrame,
      conditions: DataFrame
  ): DataFrame = {
    require(batch.columns.contains("qualifier_value"), "missing qualifier mapping column(s): qualifier_value")
    def ensure(df: DataFrame, name: String, dflt: Column): DataFrame =
      if (df.columns.contains(name)) df else df.withColumn(name, dflt)
    var staged = batch
    staged = ensure(staged, "qualifier_column", lit(null).cast("string"))
    staged = ensure(staged, "result_condition", lit(null).cast("string"))
    staged = ensure(staged, "result_condition_value_source", lit("none"))
    staged = ensure(staged, "result_condition_value_literal", lit(null).cast("double"))
    staged = ensure(staged, "result_action", lit("keep_result"))
    staged = ensure(staged, "note_template", lit(null).cast("string"))
    staged = ensure(staged, "priority", lit(100))
    staged = ensure(staged, "active", lit(true))
    staged = ensure(staged, "note", lit(null).cast("string"))
    val lk = conditions.select(
      lower(trim(col("result_condition"))).as("__label"),
      col("result_condition_id").cast("long").as("__cid")
    )
    val v = col("result_condition").cast("string")
    val isInt = v.rlike("^\\s*[0-9]+\\s*$")
    staged = staged
      .withColumn("__lookup_key", when(!isMissingStr(v) && !isInt, lower(trim(v))))
      .join(broadcast(lk), col("__lookup_key") === col("__label"), "left")
      .withColumn(
        "__resolved",
        when(isMissingStr(v), lit(null).cast("long"))
          .when(isInt, trim(v).cast("long"))
          .otherwise(col("__cid"))
      )
    // unknown-value scan + max-id seed in ONE driver job (the fused-
    // probe discipline of upsertParameterMappings)
    val probeRow = existing
      .agg(coalesce(max(col("import_qualifier_mapping_id")), lit(0L)).as("max_id"))
      .join(
        staged
          .filter(!isMissingStr(v) && col("__resolved").isNull)
          .select(v.as("__bad"))
          .limit(1),
        lit(true),
        "left"
      )
      .head()
    if (!probeRow.isNullAt(1)) {
      throw new IllegalArgumentException(
        s"Unknown result_condition qualifier mapping value: ${probeRow.getString(1)}"
      )
    }
    val maxId = probeRow.getLong(0)
    staged = staged
      .withColumn("result_condition", col("__resolved"))
      .drop("__lookup_key", "__label", "__cid", "__resolved")
      .withColumn("import_source_id", lit(sourceId))
      .withColumn("import_profile_id", profileId.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .withColumn("priority", col("priority").cast("int"))
      .withColumn("active", coalesce(asLogical(col("active").cast("string")), lit(true)))
    // NULL-safe merge key: sentinel-fill the nullable key parts for the
    // join only (Postgres treats the whole tuple as the conflict key)
    val keyed = staged
      .withColumn("__kp", coalesce(col("import_profile_id"), lit(-1L)))
      .withColumn("__kc", coalesce(col("qualifier_column"), lit("\u0000")))
      .withColumn("__kv", coalesce(col("qualifier_value"), lit("\u0000")))
    val target = existing
      .withColumn("__kp", coalesce(col("import_profile_id"), lit(-1L)))
      .withColumn("__kc", coalesce(col("qualifier_column"), lit("\u0000")))
      .withColumn("__kv", coalesce(col("qualifier_value"), lit("\u0000")))
    val keyCols = Seq("import_source_id", "__kp", "__kc", "__kv")
    val known = keyed.join(
      target.select((keyCols :+ "import_qualifier_mapping_id").map(col): _*),
      keyCols
    )
    val fresh = SeqIds.globalRank(
      keyed.join(target.select(keyCols.map(col): _*), keyCols, "left_anti"),
      Seq(col("qualifier_value"), col("__kc")),
      "__rk",
      smallBatch = true // profile/key uploads are dimension-sized by definition
    ).withColumn("import_qualifier_mapping_id", lit(maxId) + col("__rk")).drop("__rk")
    Upsert(
      target,
      known.unionByName(fresh.select(known.columns.map(col): _*)),
      keyCols,
      Upsert.DoUpdate
    ).drop("__kp", "__kc", "__kv").select(QualifierCols.map(col): _*)
  }

  // ---------------------------------------------------------------
  // upload sessions (discrete.import_upload_sessions/_rows)
  // ---------------------------------------------------------------

  /** `createImportUploadSession` (`R/import_mappings.R:650`): append a
    * session row with the next id; JSON summaries stored as text. The
    * returned Long forces one driver action here; the max-id+1 seed
    * carries the single-writer assumption documented on
    * [[graft.operators.SeqIds.assignIdsAbove]]. */
  def createUploadSession(
      sessions: DataFrame,
      profileId: Long,
      fileName: Option[String] = None,
      fileHash: Option[String] = None,
      fileSize: Option[Long] = None,
      summaryJson: String = "{}",
      validationJson: String = "{}",
      note: Option[String] = None
  ): (DataFrame, Long) = {
    val spark = sessions.sparkSession
    import spark.implicits._
    val nextId =
      sessions.agg(coalesce(max(col("import_upload_session_id")), lit(0L))).head().getLong(0) + 1L
    val row = Seq(
      (nextId, profileId, fileName.orNull, fileHash.orNull,
        fileSize.map(java.lang.Long.valueOf).orNull, summaryJson, validationJson, note.orNull)
    ).toDF(
      "import_upload_session_id", "import_profile_id", "source_file_name",
      "source_file_hash", "source_file_size", "summary", "validation_summary", "note"
    ).withColumn("source_file_size", col("source_file_size").cast("long"))
    (sessions.unionByName(row), nextId)
  }

  val UploadRowCols: Seq[String] = Seq(
    "import_upload_session_id", "sheet_name", "source_row_number",
    "result_index", "source_record", "normalized_sample", "normalized_result",
    "validation_status", "validation_messages", "sample_id", "result_id"
  )

  /** `appendImportUploadRows` (`R/import_mappings.R:710`): defaults
    * fill then ON CONFLICT (session, sheet, row, result_index)
    * DO UPDATE — re-validating a previewed upload replaces the staged
    * row in place. JSON payloads are text columns. */
  def appendUploadRows(existing: DataFrame, sessionId: Long, batch: DataFrame): DataFrame = {
    def ensure(df: DataFrame, name: String, dflt: Column): DataFrame =
      if (df.columns.contains(name)) df else df.withColumn(name, dflt)
    var staged = batch
    staged = ensure(staged, "sheet_name", lit(null).cast("string"))
    staged = ensure(staged, "source_row_number", lit(null).cast("int"))
    staged = ensure(staged, "result_index", lit(1))
    staged = ensure(staged, "source_record", lit("{}"))
    staged = ensure(staged, "normalized_sample", lit("{}"))
    staged = ensure(staged, "normalized_result", lit("{}"))
    staged = ensure(staged, "validation_status", lit("pending"))
    staged = ensure(staged, "validation_messages", lit("[]"))
    staged = ensure(staged, "sample_id", lit(null).cast("long"))
    staged = ensure(staged, "result_id", lit(null).cast("long"))
    staged = staged
      .withColumn("import_upload_session_id", lit(sessionId))
      .withColumn("result_index", coalesce(col("result_index").cast("int"), lit(1)))
      .select(UploadRowCols.map(col): _*)
    // EVERY nullable key part gets a sentinel: Upsert's dropDuplicates
    // is null-equal but its conflict join is null-unequal, so a bare
    // null in the key both collapses distinct staged rows and fails
    // to match its own prior upload on re-validate.
    val keyed = staged
      .withColumn("__ks", coalesce(col("sheet_name"), lit("\u0000")))
      .withColumn("__kr", coalesce(col("source_row_number"), lit(-1)))
    val target = existing
      .withColumn("__ks", coalesce(col("sheet_name"), lit("\u0000")))
      .withColumn("__kr", coalesce(col("source_row_number"), lit(-1)))
    Upsert(
      target,
      keyed,
      Seq("import_upload_session_id", "__ks", "__kr", "result_index"),
      Upsert.DoUpdate
    ).drop("__ks", "__kr")
  }

  // ---------------------------------------------------------------
  // load + resolve (import_mapping_load_db / _resolve_match)
  // ---------------------------------------------------------------

  /** Key-transform fallbacks, in match order: the key itself, the key
    * without extension, the basename, the basename without extension —
    * `import_mapping_source_candidates` (`R/import_mappings.R:1189`). */
  def candidateKeys(key: String): Seq[String] = {
    def basename(s: String): String = s.split('/').last
    def sansExt(s: String): String = {
      val b = basename(s)
      val dot = b.lastIndexOf('.')
      if (dot <= 0) s
      else s.substring(0, s.length - (b.length - dot))
    }
    Seq(key, sansExt(key), basename(key), sansExt(basename(key))).distinct
  }

  /** `import_mapping_load_db` (`R/import_mappings.R:1181`): the first
    * candidate key naming an ACTIVE source with at least one ACTIVE
    * mapping wins; its mappings return ordered (priority,
    * import_mapping_id) with the parsed criteria map and its size. At
    * most 4 dimension-table probes — the reference's per-candidate DB
    * queries, kept driver-side because the loop is bounded, not
    * data-sized. */
  def loadMappings(
      sources: DataFrame,
      mappings: DataFrame,
      key: String
  ): Option[(String, DataFrame)] = {
    val cands = candidateKeys(key)
    // ONE probe job for all candidates AND their active-mapping counts
    // (the reference loops a DB query per candidate; ≤4 candidates and
    // a dimension-sized mapping table make one joined probe strictly
    // better than two sequential jobs)
    val hitSources = sources
      .filter(col("active") && col("source_code").isin(cands: _*))
      .select(col("import_source_id"), col("source_code"))
      .join(
        mappings
          .filter(col("active"))
          .groupBy(col("import_source_id"))
          .agg(count(lit(1)).as("__n")),
        Seq("import_source_id"),
        "left"
      )
      .collect()
      .map(r => r.getString(1) -> (r.getLong(0), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toMap
    if (hitSources.isEmpty) return None
    cands
      .collectFirst {
        case cand if hitSources.get(cand).exists(_._2 > 0) =>
          val sid = hitSources(cand)._1
          cand -> mappings
            .filter(col("import_source_id") === sid && col("active"))
            .withColumn(
              "source_match_values",
              from_json(col("source_match"), org.apache.spark.sql.types.MapType(
                org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
            )
            .withColumn("source_match_size", size(map_keys(col("source_match_values"))))
      }
  }

  /** `import_mapping_resolve_match` (`R/import_mappings.R:1259`),
    * distributed: the mapping dimension collapses to ONE array-of-
    * struct row (ordered by priority asc, specificity desc, id asc —
    * the reference's setorder), broadcast onto the record stream, and
    * per record a codegen'd `filter` keeps the mappings whose criteria
    * all equal the record's values (missing/NULL reads as ""); element
    * 1 of the already-ordered survivors is the winner. Zero shuffle of
    * the record stream — no join blowup, no per-record window — so a
    * 100 TB import maps in its scan stage. A priority+specificity tie
    * between survivors is an error in the reference; the per-record
    * `tied` flag carries it and `strictTies` raises once driver-side.
    * Unmatched records survive with NULL mapping columns (callers
    * decide whether unmapped rows drop). */
  def resolveMatches(
      records: DataFrame,
      recordCols: Seq[String],
      mappings: DataFrame,
      strictTies: Boolean = true
  ): DataFrame = {
    def rankKey(m: Column): Column =
      struct(m.getField("prio"), -m.getField("msize"), m.getField("mid"))
    val dim = mappings
      .select(
        collect_list(
          struct(
            col("priority").cast("int").as("prio"),
            col("source_match_size").cast("int").as("msize"),
            col("import_mapping_id").cast("long").as("mid"),
            col("source_match_values").as("crit"),
            col("parameter_id").cast("long").as("parameter_id"),
            col("result_type").cast("long").as("result_type"),
            col("sample_fraction_id").cast("long").as("sample_fraction_id"),
            col("result_value_type").cast("long").as("result_value_type"),
            col("result_speciation_id").cast("long").as("result_speciation_id"),
            col("matrix_state_id").cast("long").as("matrix_state_id"),
            col("conversion").cast("double").as("conversion"),
            col("result_offset").cast("double").as("result_offset")
          )
        ).as("__maps0")
      )
      // collect_list order is partition-dependent — sort the array
      // (priority asc, specificity desc, id asc) ONCE here in the
      // one-row dimension; sorting per record would run the comparator
      // lambda rows x |mappings| x log|mappings| times for a constant
      .select(
        array_sort(
          col("__maps0"),
          (l, r) =>
            when(rankKey(l) < rankKey(r), -1).when(rankKey(l) > rankKey(r), 1).otherwise(lit(0))
        ).as("__maps")
      )
    val recVals = map(
      recordCols.flatMap(c =>
        Seq(lit(c), coalesce(col(c).cast("string"), lit("")))): _*
    )
    // the dimension array arrives best-first: filtering preserves
    // order, so element 0 of the survivors is the winner
    val sortedHits = filter(
      col("__maps"),
      m =>
        forall(
          map_keys(m.getField("crit")),
          k =>
            element_at(col("__rec_vals"), k).isNotNull &&
              element_at(col("__rec_vals"), k) === element_at(m.getField("crit"), k)
        )
    )
    // get() (not getItem/element_at): NULL-tolerant under ANSI when a
    // record has zero or one surviving mapping
    val best = get(col("__hits"), lit(0))
    val second = get(col("__hits"), lit(1))
    val out = records
      .withColumn("__rec_vals", recVals)
      .crossJoin(broadcast(dim)) // one-row dimension: no blowup
      .withColumn("__hits", sortedHits)
      .withColumn(
        "tied",
        size(col("__hits")) >= 2 &&
          best.getField("prio") === second.getField("prio") &&
          best.getField("msize") === second.getField("msize")
      )
      .withColumn("import_mapping_id", best.getField("mid"))
      .withColumn("parameter_id", best.getField("parameter_id"))
      .withColumn("result_type", best.getField("result_type"))
      .withColumn("sample_fraction_id", best.getField("sample_fraction_id"))
      .withColumn("result_value_type", best.getField("result_value_type"))
      .withColumn("result_speciation_id", best.getField("result_speciation_id"))
      .withColumn("matrix_state_id", best.getField("matrix_state_id"))
      .withColumn("conversion", best.getField("conversion"))
      .withColumn("result_offset", best.getField("result_offset"))
      .drop("__rec_vals", "__maps", "__hits")
    if (strictTies) {
      val anyTie = out.filter(col("tied")).limit(1).collect()
      if (anyTie.nonEmpty) {
        throw new IllegalStateException(
          "Multiple import mappings matched the same source record with equal priority and specificity."
        )
      }
    }
    out
  }
}
