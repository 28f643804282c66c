package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Table-snapshot export — the analog of `R/db_dump.R:1-107`
  * (YukonWRB/AquaCache), which shells out to pg_dump/pg_dumpall for a
  * schema-only or schema+data dump. Lake-native shape: the "schema
  * dump" is a JSON manifest of every table's columns/types/nullability
  * (plus the visibility groups found in the data, standing in for
  * pg_dumpall's role dump), and the data dump is one parquet directory
  * per table — restorable by pointing the engine at the directory.
  *
  * Schema introspection is metadata-only (no jobs); the data legs are
  * plain distributed parquet writes, one job per table.
  */
object DbDump {

  final case class DumpResult(manifestFile: String, tableFiles: Map[String, String])

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Dump `tables` under `outPath`.
    *
    * @param withData false: manifest only (pg_dump -s); true: also
    *                 write every table as parquet
    * @param shareWithCol name of the visibility-groups array column,
    *                 collected distinct into the manifest where
    *                 present (the roles-dump analog)
    */
  def dump(
      tables: Map[String, DataFrame],
      outPath: String,
      withData: Boolean = false,
      shareWithCol: String = "share_with"
  ): DumpResult = {
    Files.createDirectories(Paths.get(outPath))
    val tableEntries = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      val cols = df.schema.fields
        .map { f =>
          s"""{"name": ${q(f.name)}, "type": ${q(f.dataType.simpleString)}, "nullable": ${f.nullable}}"""
        }
        .mkString("[", ", ", "]")
      val groups =
        if (df.columns.contains(shareWithCol)) {
          import org.apache.spark.sql.functions._
          val gs = df
            .select(explode(col(shareWithCol)).as("g"))
            .distinct()
            .collect()
            .map(_.getString(0))
            .sorted
          gs.map(q).mkString("[", ", ", "]")
        } else "[]"
      s"""  {"table": ${q(name)}, "columns": $cols, "groups": $groups}"""
    }
    val manifest = tableEntries.mkString("[\n", ",\n", "\n]\n")
    val manifestFile = s"$outPath/schema_dump.json"
    Files.writeString(Paths.get(manifestFile), manifest)
    val files = if (withData) {
      tables.map { case (name, df) =>
        val p = s"$outPath/$name"
        df.write.mode("overwrite").parquet(p)
        name -> p
      }
    } else Map.empty[String, String]
    DumpResult(manifestFile, files)
  }

  final case class RestoreResult(
      tables: Map[String, DataFrame],
      /** human-readable schema deviations (manifest vs parquet);
        * empty = clean restore
        */
      mismatches: Seq[String]
  )

  /** Restore a [[dump]] directory: parse the schema manifest, attach
    * every table whose parquet data leg exists, and validate the
    * on-disk schema against the manifest column-by-column (name, type,
    * manifest-nullable must admit the data). The restore-side analog
    * of `R/restore_seed_db.R:1-60`'s psql replay (which drops and
    * recreates the target database, then replays the pg_dump SQL);
    * lake-native, so "replay" is just re-attaching directories — data
    * never moves.
    *
    * Deviations are REPORTED, not thrown: a restore onto a newer
    * engine (extra columns) or a partial dump (missing data leg) is a
    * recoverable state the caller decides about, mirroring the
    * reference's continue-on-notice dump/restore scripts.
    */
  def restore(spark: SparkSession, dumpPath: String): RestoreResult = {
    import org.apache.spark.sql.functions._
    val manifest = spark.read
      .option("multiLine", "true")
      .json(s"$dumpPath/schema_dump.json")
      .select(
        col("table"),
        col("columns").as("cols")
      )
      .collect()
    val issues = Seq.newBuilder[String]
    val tables = manifest.flatMap { row =>
      val name = row.getString(0)
      val wanted = row
        .getSeq[org.apache.spark.sql.Row](1)
        .map(c =>
          (
            c.getAs[String]("name"),
            c.getAs[String]("type"),
            c.getAs[Boolean]("nullable")
          )
        )
      val dataPath = Paths.get(s"$dumpPath/$name")
      if (!Files.isDirectory(dataPath)) {
        issues += s"$name: no data leg in dump (schema-only)"
        None
      } else {
        val df = spark.read.parquet(dataPath.toString)
        val actual = df.schema.fields.map(f => f.name -> f).toMap
        // nullability is NOT validated: Spark's parquet reader reports
        // every column nullable regardless of writer-side schema, so a
        // manifest-vs-read comparison would flag every NOT NULL column
        wanted.foreach { case (cn, ct, _) =>
          actual.get(cn) match {
            case None =>
              issues += s"$name.$cn: in manifest, missing from parquet"
            case Some(f) if f.dataType.simpleString != ct =>
              issues += s"$name.$cn: manifest type $ct, parquet ${f.dataType.simpleString}"
            case _ => ()
          }
        }
        val extra = df.schema.fieldNames.toSet -- wanted.map(_._1).toSet
        extra.toSeq.sorted.foreach(cn => issues += s"$name.$cn: in parquet, not in manifest")
        Some(name -> df)
      }
    }.toMap
    RestoreResult(tables, issues.result())
  }
}
