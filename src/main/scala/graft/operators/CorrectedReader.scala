package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The read/query path: corrected values for one series over a time
  * window, resolving compound (derived) series and optionally
  * resampling — `measurements_continuous_corrected`
  * (`inst/patches/patch_44.R:1904` in YukonWRB/AquaCache, lifecycle
  * SURVEY §3.2).
  *
  *   - basic series: windowed scan + correction fold, with the
  *     fast-path dispatch that skips the fold entirely when the
  *     series has no corrections (`patch_53.R:1684`);
  *   - compound series: the member DAG is METADATA — resolved
  *     recursively at driver time with cycle detection (the
  *     reference's `p_path` array, `patch_41.R:1534-1536`), yielding
  *     ONE composed Catalyst plan: ranked union for fallback
  *     compounds, alias-join + sandboxed expression for expression
  *     compounds, mutual-nearest alignment for tolerance members
  *     (`patch_53.R:1126-1239`);
  *   - optional resample stage with explicit empty bins
  *     (`patch_44.R:1992-2073`).
  */
object CorrectedReader {

  final case class Member(
      alias: String,
      memberId: Long,
      priority: Int,
      toleranceSeconds: Option[Long] = None,
      /** reference `reuse_member_values`: false => mutual nearest */
      reuseMemberValues: Boolean = true
  )

  /** expression = None -> fallback (priority-coalesce) compound. */
  final case class CompoundDef(expression: Option[String], members: Seq[Member])

  final case class Catalog(
      measurements: DataFrame, // timeseries_id, datetime, value
      corrections: DataFrame, // Corrections schema, may be empty
      compounds: Map[Long, CompoundDef],
      correctedSeriesIds: Set[Long] // series having >= 1 correction
  )

  def read(
      cat: Catalog,
      tsid: Long,
      from: String,
      to: String,
      resampleSeconds: Option[Long] = None,
      resampleStatistic: String = "mean"
  ): DataFrame = {
    val resolved = resolve(cat, tsid, path = List(tsid))
      .filter(
        col("datetime") >= lit(from).cast("timestamp") &&
          col("datetime") < lit(to).cast("timestamp")
      )
    resampleSeconds match {
      case None => resolved
      case Some(step) =>
        Resample(
          resolved.withColumn("timeseries_id", lit(tsid)),
          keyCols = Seq("timeseries_id"),
          dtCol = "datetime",
          valueCol = "value",
          stepSeconds = step,
          fromTs = from,
          toTs = to,
          statistic = resampleStatistic
        ).select(col("bin_ts").as("datetime"), col("value"), col("n"), col("period_seconds"))
    }
  }

  /** Corrected-as-of (`apply_corrections_at`,
    * `inst/patches/patch_38.R:1287-1420`): the same correction fold
    * over audit-reconstructed snapshots of BOTH the measurements and
    * the corrections as of `asOfTs` — a correction added or edited
    * after T plays no part; a measurement updated/deleted after T
    * contributes its state at T.
    *
    * Expected columns: `measurements*` carry `measurement_row_id` +
    * (timeseries_id, datetime, value) + created (+ action_ts on the
    * log); `corrections*` carry `correction_id` + the
    * [[Corrections]] schema + created (+ action_ts on the log).
    */
  def correctedSnapshotAt(
      measurementsCurrent: DataFrame,
      measurementsLog: DataFrame,
      correctionsCurrent: DataFrame,
      correctionsLog: DataFrame,
      asOfTs: String
  ): DataFrame = {
    val m = AuditAsOf
      .snapshotAt(
        measurementsCurrent,
        measurementsLog,
        "measurement_row_id",
        Seq("timeseries_id", "datetime", "value"),
        asOfTs
      )
      .select("timeseries_id", "datetime", "value")
    val c = AuditAsOf.snapshotAt(
      correctionsCurrent,
      correctionsLog,
      "correction_id",
      Seq("timeseries_id", "start_dt", "end_dt", "ctype", "value1", "value2", "window_seconds", "equation", "priority"),
      asOfTs
    )
    Corrections(m, c)
  }

  /** One series' (datetime, value) frame with corrections applied;
    * compounds resolved recursively.
    */
  private def resolve(cat: Catalog, tsid: Long, path: List[Long]): DataFrame = {
    val base = cat.compounds.get(tsid) match {
      case None =>
        // basic series; fast path when correction-free
        val scan = cat.measurements
          .filter(col("timeseries_id") === tsid)
          .select(col("timeseries_id"), col("datetime"), col("value"))
        if (!cat.correctedSeriesIds.contains(tsid)) scan.drop("timeseries_id")
        else
          Corrections(scan, cat.corrections)
            .select(col("datetime"), col("corrected").as("value"))

      case Some(CompoundDef(None, members)) =>
        // fallback compound: ranked union of members
        val frames = members.sortBy(_.priority).map { m =>
          (resolveMember(cat, m, path), m.priority, m.alias)
        }
        Compound
          .priorityCoalesce(frames, keyCols = Nil, dtCol = "datetime")
          .select(col("datetime"), col("value"))

      case Some(CompoundDef(Some(expression), members)) =>
        // expression compound: align members (tolerance or exact) and
        // evaluate the sandboxed expression over the aliases
        val anchor = members.minBy(_.priority)
        val anchorDf = resolveMember(cat, anchor, path)
        val aligned = members.map { m =>
          if (m.memberId == anchor.memberId) m.alias -> anchorDf
          else
            m.toleranceSeconds match {
              case None => m.alias -> resolveMember(cat, m, path)
              case Some(tol) =>
                val mdf = resolveMember(cat, m, path).withColumn("row", monotonically_increasing_id())
                val adf = anchorDf.withColumn("row", monotonically_increasing_id())
                val matched = Compound
                  .toleranceAsOf(
                    adf, mdf, tol,
                    keyCols = Nil.toSeq, dtCol = "datetime", idCol = "row",
                    mutual = !m.reuseMemberValues
                  )
                // member value re-stamped at the ANCHOR's timestamp
                m.alias -> matched.select(col("a_datetime").as("datetime"), col("m_value").as("value"))
            }
        }
        Compound
          .expressionCompound(aligned, expression, keyCols = Nil.toSeq, dtCol = "datetime")
          .select(col("datetime"), col("value"))
    }
    // the compound's OWN corrections apply afterwards
    // (patch_41.R:1487-1502)
    if (cat.compounds.contains(tsid) && cat.correctedSeriesIds.contains(tsid))
      Corrections(
        base.withColumn("timeseries_id", lit(tsid)),
        cat.corrections
      ).select(col("datetime"), col("corrected").as("value"))
    else base
  }

  private def resolveMember(cat: Catalog, m: Member, path: List[Long]): DataFrame = {
    if (path.contains(m.memberId))
      throw new IllegalArgumentException(
        s"compound cycle detected: ${(m.memberId :: path).reverse.mkString(" -> ")}"
      )
    resolve(cat, m.memberId, m.memberId :: path)
  }
}
