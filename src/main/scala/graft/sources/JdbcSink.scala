package graft.sources

import org.apache.spark.sql.DataFrame

/** Staged bulk upsert over JDBC — the write side of the north-star
  * "bulk ingest/sync via DataFrame + JDBC", mirroring
  * `R/dbAppendTableRLS.R:28-33,200-240` (YukonWRB/AquaCache): the
  * batch lands in a STAGING table with one bulk write (executors
  * stream partitions over their own connections), then a single
  * set-based `MERGE` applies it to the target with the chosen
  * conflict mode — the RDBMS equivalent of `operators.Upsert`.
  *
  * The per-row bind fallback the reference keeps for non-Postgres
  * backends is unnecessary here: `df.write.jdbc` already batches
  * binds per partition.
  */
object JdbcSink {

  /** @param mode   Upsert.DoNothing -> only WHEN NOT MATCHED INSERT;
    *               Upsert.DoUpdate  -> also WHEN MATCHED UPDATE
    * @param props  JDBC properties (driver, credentials)
    * @return (staged row count, target row count after merge)
    */
  def upsertViaStaging(
      df: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      mode: graft.operators.Upsert.ConflictMode,
      props: java.util.Properties = new java.util.Properties()
  ): (Long, Long) = {
    require(keys.nonEmpty, "upsert needs key columns")
    val staging = s"${table}_STAGE"
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    // 1. bulk-load the staging table (overwrite recreates it)
    df.write.mode("overwrite").jdbc(url, staging, props)
    // 2. one set-based merge on the server
    val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val updateSet = nonKeys.map(c => s"t.$c = s.$c").mkString(", ")
    val insertCols = cols.mkString(", ")
    val insertVals = cols.map(c => s"s.$c").mkString(", ")
    val matched =
      if (mode == graft.operators.Upsert.DoUpdate && nonKeys.nonEmpty)
        s"WHEN MATCHED THEN UPDATE SET $updateSet "
      else ""
    val merge =
      s"""MERGE INTO $table t USING $staging s ON ($on)
         |${matched}WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        st.executeUpdate(merge)
        st.executeUpdate(s"DROP TABLE $staging")
      } finally st.close()
    } finally conn.close()
    val spark = df.sparkSession
    val n = spark.read.jdbc(url, table, props).count()
    (df.count(), n)
  }
}
