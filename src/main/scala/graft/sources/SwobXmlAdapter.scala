package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SWOB-ML minute-observation adapter: ECCC point-observation XML
  * parsed into (datetime, parameter, value) rows and filtered to one
  * parameter per series — the shape of `R/downloadECCCwxMinute.R:35`
  * (YukonWRB/AquaCache), whose test fixtures
  * (`tests/testthat/fixtures/swob-minute-*.xml`) this parser reads.
  *
  * No external XML library: each file is one observation document, so
  * `wholetext` read + regexp extraction of the `gml:timePosition` and
  * `<element name=… value=…>` pairs is a plain codegen'd projection.
  * `args`: "path" (glob of XML files), "element" (e.g. "air_temp").
  */
class SwobXmlAdapter(transport: Transport) extends SourceAdapter {
  override val name = "downloadSwobMinute"

  override def fetch(spark: SparkSession, cfg: SeriesConfig, startTs: java.sql.Timestamp): DataFrame = {
    val path = cfg.args.getOrElse("path", throw new IllegalArgumentException("path required"))
    val element = cfg.args.getOrElse("element", "air_temp")
    val raw = transport.rows(spark, path, "text", Map("wholetext" -> "true"))
    val ts = to_timestamp(
      regexp_extract(col("value"), "<gml:timePosition>([^<]+)</gml:timePosition>", 1),
      "yyyy-MM-dd'T'HH:mm:ss.SSSX"
    )
    val elements = expr(
      """regexp_extract_all(value, '<element name="([^"]+)" uom="[^"]*" value="([^"]*)"', 0)"""
    )
    val parsed = raw
      .select(ts.as("datetime"), explode(elements).as("el"))
      .select(
        col("datetime"),
        regexp_extract(col("el"), "name=\"([^\"]+)\"", 1).as("parameter"),
        regexp_extract(col("el"), "value=\"([^\"]*)\"", 1).cast("double").as("value")
      )
      .filter(col("parameter") === element)
      // fixture repeats elements: resolve per (datetime, parameter) by
      // max(value) — a TOTAL rule (same pick rule as Upsert), so a
      // retried task can never emit a different survivor than the lost
      // attempt (dropDuplicates on a key subset keeps a
      // scan-order-dependent row)
      .groupBy(col("datetime"), col("parameter"))
      .agg(max(col("value")).as("value"))
      .filter(col("datetime") >= lit(startTs))
      .select(col("datetime"), col("value"))
    SourceAdapter.normalize(parsed)
  }
}

/** Default instance on the fixture transport. */
object SwobXmlAdapter extends SwobXmlAdapter(FileTransport)
