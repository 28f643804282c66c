package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

class SchemaDocsSpec extends AnyFunSuite {

  test("renders every declared table with its columns") {
    val html = SchemaDocs.render()
    SchemaDocs.tables.foreach { case (name, _, schema) =>
      assert(html.contains(s"""<section id="$name">"""), s"missing section $name")
      schema.fieldNames.foreach { f =>
        assert(html.contains(s"<code>$f</code>"), s"missing column $f of $name")
      }
    }
    assert(html.contains("array&lt;string&gt;"), "array types rendered")
    assert(html.contains("map&lt;string, string&gt;"), "map types rendered")
    assert(html.contains("NOT NULL"), "nullability rendered")
  }
}
