package graft.jobs

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import graft.tables.Schemas

/** HTML schema reference generator — the reference's
  * `generateACDatabaseReference` (`R/generateACDatabaseReference.R:1-7`
  * in YukonWRB/AquaCache) renders the live database's tables/columns
  * to an HTML document; here the DECLARED schemas (`tables.Schemas`)
  * are the source of truth, so the doc is generated from code and can
  * never drift from what the engine actually writes.
  */
object SchemaDocs {

  private def typeName(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case ArrayType(e, _)   => s"array&lt;${typeName(e)}&gt;"
    case MapType(k, v, _)  => s"map&lt;${typeName(k)}, ${typeName(v)}&gt;"
    case other             => other.simpleString
  }

  def tables: Seq[(String, String, StructType)] = Seq(
    ("timeseries", "Continuous-series catalog (one row per series)", Schemas.timeseries),
    ("measurements_continuous", "Measurement fact table (long/narrow)", Schemas.measurements),
    ("measurements_calculated_daily", "Daily aggregates + DOY statistics (all-history and 30-yr)", Schemas.calculatedDaily),
    ("qc_segments", "Non-overlapping half-open QC interval metadata", Schemas.qcSegments),
    ("corrections", "Value-correction dimension (7 operators, priority fold)", Schemas.corrections),
    ("samples", "Discrete sample headers", Schemas.samples),
    ("results", "Discrete results incl. censored non-detects", Schemas.results),
    ("audit_log", "UPDATE/DELETE row log for as-of reconstruction", Schemas.auditLog)
  )

  def render(): String = {
    val sections = tables.map { case (name, desc, schema) =>
      val rows = schema.fields.map { f =>
        s"<tr><td><code>${f.name}</code></td><td>${typeName(f.dataType)}</td>" +
          s"<td>${if (f.nullable) "" else "NOT NULL"}</td></tr>"
      }.mkString("\n")
      s"""<section id="$name">
         |<h2><code>$name</code></h2>
         |<p>$desc</p>
         |<table>
         |<thead><tr><th>column</th><th>type</th><th>constraint</th></tr></thead>
         |<tbody>
         |$rows
         |</tbody>
         |</table>
         |</section>""".stripMargin
    }
    val toc = tables
      .map { case (n, _, _) => s"""<li><a href="#$n"><code>$n</code></a></li>""" }
      .mkString("\n")
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |<meta charset="utf-8">
       |<title>graft schema reference (v${Schemas.SchemaVersion})</title>
       |<style>
       |body { font-family: sans-serif; max-width: 60rem; margin: 2rem auto; }
       |table { border-collapse: collapse; width: 100%; }
       |th, td { border: 1px solid #ccc; padding: 0.3rem 0.6rem; text-align: left; }
       |th { background: #f3f3f3; }
       |</style>
       |</head>
       |<body>
       |<h1>graft schema reference</h1>
       |<p>Schema version ${Schemas.SchemaVersion}; generated from
       |<code>graft.tables.Schemas</code>.</p>
       |<ul>
       |$toc
       |</ul>
       |${sections.mkString("\n")}
       |</body>
       |</html>""".stripMargin
  }

  /** Write the doc; args(0) = output path (default ./schema_reference.html). */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("schema_reference.html")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), render())
    println(s"wrote $out")
  }
}
