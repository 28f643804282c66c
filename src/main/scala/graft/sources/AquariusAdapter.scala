package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aquarius corrected-data ingest — the reference's largest single
  * source (`R/downloadAquarius.R:30`, 574 LoC in YukonWRB/AquaCache).
  * The HTTP client is out of scope (zero egress); this adapter owns
  * everything after the response arrives, which is where all the
  * logic lives:
  *
  *   - `Points[].Timestamp` carry a `±HH:MM` UTC offset suffix parsed
  *     to UTC (`:141-156`); `Points[].Value.Numeric` NA rows dropped
  *     (`:137`); duplicate points dropped, sorted (`:158-159`);
  *   - `Grades[] / Approvals[] / Qualifiers[]` are INTERVAL metadata
  *     (`[StartTime, EndTime)`) stamped onto points by range join
  *     (`:195-345`) — the point-in-interval join of SURVEY §2.3;
  *   - `difference = true` runs the cumulative->increment kernel over
  *     the points (`:163-183`, `compute_increments`).
  */
class AquariusAdapter(transport: Transport) extends SourceAdapter {
  override val name = "downloadAquarius"

  /** `2023-01-02T00:30:00.0000000-07:00` -> UTC timestamp. */
  private def parseAqTs(c: org.apache.spark.sql.Column) =
    to_timestamp(regexp_replace(c, "\\.\\d+", ""), "yyyy-MM-dd'T'HH:mm:ssXXX")

  /** args: file (JSON response), optional difference/reset_drop/
    * min_pos/max_gap.
    */
  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DataFrame = {
    val raw = transport.rows(spark, cfg.args("file"), "json", Map("multiLine" -> "true"))
    // a present-but-EMPTY array infers as a non-struct element type
    // (schema inference has no element to look at), so field access on
    // it is an analysis error; an empty poll window is a legitimate
    // response shape, not a malformed one — treat same as absent
    val hasStructArray = (n: String) =>
      raw.schema.fields.exists(f =>
        f.name == n && (f.dataType match {
          case org.apache.spark.sql.types.ArrayType(_: org.apache.spark.sql.types.StructType, _) => true
          case _ => false
        })
      )

    val points =
      if (!hasStructArray("Points"))
        spark
          .range(0)
          .select(col("id").cast("timestamp").as("datetime"), col("id").cast("double").as("value"))
      else
        raw
          .select(explode(col("Points")).as("p"))
          .select(
            parseAqTs(col("p.Timestamp")).as("datetime"),
            col("p.Value.Numeric").cast("double").as("value")
          )
          .filter(col("value").isNotNull)
          .dropDuplicates("datetime", "value")

    def segs(arrayCol: String, codeField: String, outCol: String): Option[DataFrame] =
      if (!hasStructArray(arrayCol)) None
      else
        Some(
          raw
            .select(explode(col(arrayCol)).as("s"))
            .select(
              col(s"s.$codeField").cast("string").as(outCol),
              parseAqTs(col("s.StartTime")).as("start_dt"),
              parseAqTs(col("s.EndTime")).as("end_dt")
            )
        )

    def stamp(df: DataFrame, seg: Option[DataFrame], outCol: String): DataFrame = seg match {
      case None => df.withColumn(outCol, lit(null).cast("string"))
      case Some(s) =>
        df.join(
          broadcast(s),
          df("datetime") >= s("start_dt") && df("datetime") < s("end_dt"),
          "left"
        ).drop("start_dt", "end_dt")
    }

    val stamped = stamp(
      stamp(
        stamp(points, segs("Grades", "GradeCode", "grade"), "grade"),
        segs("Approvals", "ApprovalLevel", "approval"),
        "approval"
      ),
      segs("Qualifiers", "Identifier", "qualifier"),
      "qualifier"
    )

    val result =
      if (cfg.args.get("difference").contains("true")) {
        // One row per datetime (lowest value wins, deterministically):
        // the kernel orders by timestamp alone and the increments join
        // back on datetime, so same-timestamp duplicates would both
        // fan out (2x2) and make the scan order nondeterministic.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("datetime"))
          .orderBy(col("value"))
        val uniq = stamped
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
        // `R/downloadAquarius.R:163` stops with an error below 6 points
        // for difference series; mirror that instead of silently
        // emitting a degenerate increment stream.
        if (uniq.limit(6).count() < 6)
          throw new IllegalArgumentException(
            s"downloadAquarius: difference=true needs >=6 points, series ${cfg.timeseriesId}"
          )
        val incs = SeriesKernelsBridge.increments(
          uniq.withColumn("k", lit(cfg.timeseriesId)),
          cfg.args.getOrElse("reset_drop", "20.0").toDouble,
          cfg.args.getOrElse("min_pos", "0.0").toDouble,
          cfg.args.getOrElse("max_gap", "0").toInt
        )
        uniq
          .join(incs, Seq("datetime"), "inner")
          .drop("value")
          .withColumnRenamed("increment", "value")
          .filter(col("value").isNotNull)
      } else stamped

    SourceAdapter.normalize(result.filter(col("datetime") >= lit(startTs)))
  }
}

/** Default instance on the fixture transport. */
object AquariusAdapter extends AquariusAdapter(FileTransport)

/** Thin indirection so the adapter reuses the increment kernel without
  * a package cycle.
  */
private[sources] object SeriesKernelsBridge {
  def increments(df: DataFrame, resetDrop: Double, minPos: Double, maxGap: Int): DataFrame =
    graft.operators.SeriesKernels
      .increments(df, "k", "datetime", "value", resetDrop, minPos, maxGap)
      .select(col("datetime"), col("increment"))
}
