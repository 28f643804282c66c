package graft.jobs

import org.apache.spark.sql.DataFrame
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
}
