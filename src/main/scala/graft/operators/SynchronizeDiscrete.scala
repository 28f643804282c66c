package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level discrete (sample/result) reconciliation —
  * `R/synchronize_discrete.R` in YukonWRB/AquaCache: samples are the
  * parents (matched on series + datetime + collection method), results
  * the children (matched per sample on a NULL-aware compound key).
  *
  * Reference semantics carried over:
  *   - samples: remote wins field-by-field, but `share_with` (local
  *     visibility) is NEVER overwritten (`:456-460`); `no_update`
  *     samples are skipped entirely (`:449-452`); deletes only touch
  *     rows whose `import_source` matches the remote's and which are
  *     not `no_update` (`:8`, `:837-848`);
  *   - results: the unique key is (result_type, parameter_id,
  *     matrix_state_id, result_value_type, result_speciation_id,
  *     protocol_method, laboratory, analysis_datetime,
  *     sample_fraction_id) with NULL matching NULL (`:520-590`) — a
  *     null-safe `<=>` join; remote rows matching MORE than one local
  *     result are ambiguous and skipped, with the local rows kept
  *     (`:828-833`); unmatched local results are deleted only under
  *     the same import_source/no_update guards.
  *
  * Spark-first: each level is ONE full-outer shuffle join on its key;
  * per-field change detection is a null-safe projection; ambiguity
  * detection is a count window over the local key — no per-sample
  * loop, so a billion results reconcile the same way ten do.
  */
object SynchronizeDiscrete {

  val SampleKey: Seq[String] = Seq("sample_series_id", "datetime", "collection_method")

  val ResultKey: Seq[String] = Seq(
    "result_type", "parameter_id", "matrix_state_id", "result_value_type",
    "result_speciation_id", "protocol_method", "laboratory",
    "analysis_datetime", "sample_fraction_id"
  )

  private def nullSafe(cols: Seq[String]): Column =
    cols.map(c => col(s"l.$c") <=> col(s"r.$c")).reduce(_ && _)

  /** Sample-level actions: insert / update (with changed_fields) /
    * delete / protected / keep. `compareCols` are the metadata fields
    * under remote-wins; `share_with` is excluded from comparison even
    * if passed.
    */
  def diffSamples(
      local: DataFrame,
      remote: DataFrame,
      compareCols: Seq[String],
      deleteMissing: Boolean = false,
      /** the remote batch's import_source label: local rows are only
        * deletable when theirs matches (`synchronize_discrete.R:8`)
        */
      importSource: Option[String] = None
  ): DataFrame = {
    val cmp = compareCols.filterNot(_ == "share_with")
    val l = local.as("l").withColumn("l_present", lit(true))
    val r = remote.as("r").withColumn("r_present", lit(true))
    val joined = l.join(r, SampleKey.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _), "full_outer")
    val changedFields = array_compact(
      array(cmp.map(c => when(!(col(s"l.$c") <=> col(s"r.$c")), lit(c))): _*)
    )
    val noUpd = coalesce(col("l.no_update"), lit(false))
    val deletable =
      lit(deleteMissing) && !noUpd &&
        importSource.map(s => col("l.import_source") <=> lit(s)).getOrElse(lit(true))
    joined
      .withColumn("changed_fields", changedFields)
      .withColumn(
        "action",
        when(col("l_present").isNull, lit("insert"))
          .when(col("r_present").isNull, when(deletable, lit("delete")).otherwise(lit("keep")))
          .when(noUpd, lit("protected"))
          .when(size(col("changed_fields")) > 0, lit("update"))
          .otherwise(lit("keep"))
      )
      .select(
        SampleKey.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) ++
          Seq(col("l.sample_id").as("sample_id"), col("action"), col("changed_fields")): _*
      )
  }

  /** Result-level actions for samples that matched. `localResults` /
    * `remoteResults` both carry `sample_id` (the remote side acquires
    * it from the sample match) plus the key columns and `result`.
    *
    * Output actions: insert / update / delete / protected / keep /
    * ambiguous (remote row matching >1 local rows — local kept).
    */
  def diffResults(
      localResults: DataFrame,
      remoteResults: DataFrame,
      deleteMissing: Boolean = false
  ): DataFrame = {
    // how many local rows share one (sample, key): >1 means any remote
    // match is ambiguous (reference warns and skips, keeping local)
    val dupW = Window.partitionBy(("sample_id" +: ResultKey).map(col): _*)
    val l = localResults
      .withColumn("l_dup", count(lit(1)).over(dupW))
      .as("l")
      .withColumn("l_present", lit(true))
    val r = remoteResults.as("r").withColumn("r_present", lit(true))
    val key = (col("l.sample_id") <=> col("r.sample_id")) && nullSafe(ResultKey)
    val joined = l.join(r, key, "full_outer")
    val noUpd = coalesce(col("l.no_update"), lit(false))
    joined
      .withColumn(
        "action",
        when(col("l_present").isNull, lit("insert"))
          .when(col("r_present").isNull,
            when(noUpd || !lit(deleteMissing), lit("keep")).otherwise(lit("delete")))
          .when(col("l_dup") > 1, lit("ambiguous"))
          .when(noUpd, lit("protected"))
          .when(!(col("l.result") <=> col("r.result")), lit("update"))
          .otherwise(lit("keep"))
      )
      .select(
        coalesce(col("l.sample_id"), col("r.sample_id")).as("sample_id") +:
          ResultKey.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) :+
          col("l.result").as("l_result") :+ col("r.result").as("r_result") :+
          col("action"): _*
      )
  }
}
