package graft.sources

import graft.SparkSpec

class SwobXmlSpec extends SparkSpec {

  private def writeFixture(dir: String, name: String, ts: String, temp: Double): Unit = {
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="no"?>
         |<om:ObservationCollection xmlns:om="http://www.opengis.net/om/1.0" xmlns="http://dms.ec.gc.ca/schema/point-observation/2.0" xmlns:gml="http://www.opengis.net/gml">
         |  <om:member>
         |    <om:Observation>
         |      <om:samplingTime>
         |        <gml:TimeInstant>
         |          <gml:timePosition>$ts</gml:timePosition>
         |        </gml:TimeInstant>
         |      </om:samplingTime>
         |      <om:result>
         |        <elements>
         |          <element name="air_temp" uom="°C" value="$temp" />
         |          <element name="rel_hum" uom="%" value="65" />
         |          <element name="air_temp" uom="°C" value="$temp" />
         |        </elements>
         |      </om:result>
         |    </om:Observation>
         |  </om:member>
         |</om:ObservationCollection>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/$name"), xml)
  }

  test("SwobXmlAdapter parses minute obs, dedupes repeated elements, filters by start") {
    val dir = java.nio.file.Files.createTempDirectory("swob").toString
    writeFixture(dir, "swob-0000.xml", "2026-03-15T00:00:00.000Z", 1.2)
    writeFixture(dir, "swob-0001.xml", "2026-03-15T00:01:00.000Z", 1.4)
    val cfg = SeriesConfig(5L, "downloadSwobMinute", Map("path" -> s"$dir/*.xml", "element" -> "air_temp"))
    val all = SwobXmlAdapter
      .fetch(spark, cfg, java.sql.Timestamp.valueOf("2026-03-15 00:00:00"))
      .orderBy("datetime")
      .collect()
    assert(all.length == 2) // repeated air_temp element deduped
    assert(all(0).getAs[Double]("value") == 1.2)
    assert(all(1).getAs[Double]("value") == 1.4)
    val later = SwobXmlAdapter
      .fetch(spark, cfg, java.sql.Timestamp.valueOf("2026-03-15 00:00:30"))
      .collect()
    assert(later.length == 1)
  }

  test("repeated element with differing values resolves by max, not scan order") {
    val dir = java.nio.file.Files.createTempDirectory("swob").toString
    val xml =
      """<?xml version="1.0"?>
        |<om:ObservationCollection xmlns:om="http://www.opengis.net/om/1.0" xmlns:gml="http://www.opengis.net/gml">
        |  <om:samplingTime><gml:TimeInstant>
        |    <gml:timePosition>2026-03-15T00:00:00.000Z</gml:timePosition>
        |  </gml:TimeInstant></om:samplingTime>
        |  <elements>
        |    <element name="air_temp" uom="°C" value="2.5" />
        |    <element name="air_temp" uom="°C" value="1.5" />
        |  </elements>
        |</om:ObservationCollection>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/swob-x.xml"), xml)
    val cfg = SeriesConfig(5L, "downloadSwobMinute", Map("path" -> s"$dir/*.xml", "element" -> "air_temp"))
    val rows = SwobXmlAdapter
      .fetch(spark, cfg, java.sql.Timestamp.valueOf("2026-03-15 00:00:00"))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("value") == 2.5)
  }
}
