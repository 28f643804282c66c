package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in `graft.queries.*`; operators in
  * `graft.operators.*` / `graft.ml.*`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Catalog-enrichment revenue rollup (SURVEY §2.3 broadcast joins +
    * §2.4 aggregation).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q_catalog_enrich").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
