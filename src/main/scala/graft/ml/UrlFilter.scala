package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain filtering — the provenance gate of a crawl pipeline:
  * extract the first URL host from each document, reduce it to the
  * registered domain (last two labels), and flag docs whose domain is
  * on a blocklist.
  *
  * Scale: host extraction and domain reduction are codegen'd
  * projections (zero shuffle); the blocklist is a dimension-sized
  * frame JOINED BROADCAST — the corpus never shuffles by domain, so
  * a skewed domain distribution (crawls are zipfian by site) costs
  * nothing. At 100 TB the blocklist side stays a broadcast even at
  * millions of entries (~tens of MB of domains).
  *
  * Patterns are java.util.regex / RE2 agreeing shapes (no
  * lookaround), same discipline as [[TextStats.piiScan]].
  */
object UrlFilter {

  /** Host capture skips an optional userinfo prefix (`user:pass@`) —
    * otherwise `https://innocent@spam.example/x` would yield host
    * `innocent` and the blocked registered domain would never be
    * seen, a one-character evasion of the gate. RE2/Java-agreeing
    * (no lookaround; the userinfo group is non-capturing).
    */
  val UrlPattern = """https?://(?:[^/@\s]+@)?([A-Za-z0-9.-]+)"""

  /** First URL host in the text ('' if none). */
  def hostOf(text: Column): Column = regexp_extract(text, UrlPattern, 1)

  /** Registered domain = last two dot-labels; hosts with fewer than
    * two labels pass through unchanged (both engines clamp the same
    * way only when told to — the guard makes the semantics explicit).
    */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    when(size(parts) >= 2, concat_ws(".", slice(parts, -2, 2))).otherwise(host)
  }

  /** Flag every doc against a blocklist of registered domains.
    * Output: (idCol, domain, kept) for every input row — filtering is
    * the caller's `.filter(col("kept"))`, so audit trails can keep
    * the rejected side (same convention as the CRUD gates).
    *
    * @param blocklist single-column frame of blocked registered
    *                  domains (column name: domain)
    */
  def filterByBlocklist(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blocklist: DataFrame
  ): DataFrame =
    df.select(
      col(idCol),
      registeredDomain(hostOf(col(textCol))).as("domain")
    ).join(
      // distinct: a repeated blocklist entry must not duplicate every
      // matching corpus row (membership join, not a fact join)
      broadcast(blocklist.select(col("domain")).distinct().withColumn("blocked", lit(true))),
      Seq("domain"),
      "left"
    ).select(col(idCol), col("domain"), col("blocked").isNull.as("kept"))
}
