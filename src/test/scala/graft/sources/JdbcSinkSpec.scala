package graft.sources

import graft.SparkSpec
import graft.operators.Upsert
import java.sql.DriverManager

class JdbcSinkSpec extends SparkSpec {

  private lazy val dbDir = java.nio.file.Files.createTempDirectory("jdbcsink").toString
  private lazy val url = s"jdbc:derby:$dbDir/sinkdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val s = c.createStatement(); try s.executeUpdate(sql) finally s.close() }
    finally c.close()
  }

  test("staged MERGE upsert: DoUpdate replaces matches, inserts the rest") {
    import spark.implicits._
    exec("CREATE TABLE MEAS (TSID BIGINT NOT NULL, DT BIGINT NOT NULL, VAL DOUBLE, PRIMARY KEY (TSID, DT))")
    exec("INSERT INTO MEAS VALUES (1, 100, 1.0), (1, 200, 2.0), (2, 100, 9.0)")

    val batch = Seq(
      (1L, 200L, 2.5), // existing key: updated
      (1L, 300L, 3.0), // new key: inserted
      (3L, 100L, 7.0)  // new series: inserted
    ).toDF("TSID", "DT", "VAL")

    val (staged, total) = JdbcSink.upsertViaStaging(
      batch, url, "MEAS", keys = Seq("TSID", "DT"), mode = Upsert.DoUpdate)
    assert(staged == 3 && total == 5)

    val back = spark.read.jdbc(url, "MEAS", new java.util.Properties())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(back((1L, 200L)) == 2.5) // remote wins
    assert(back((1L, 100L)) == 1.0) // untouched
    assert(back((1L, 300L)) == 3.0 && back((3L, 100L)) == 7.0)
  }

  test("DoNothing leaves matched rows intact") {
    import spark.implicits._
    exec("CREATE TABLE MEAS2 (TSID BIGINT NOT NULL, DT BIGINT NOT NULL, VAL DOUBLE, PRIMARY KEY (TSID, DT))")
    exec("INSERT INTO MEAS2 VALUES (1, 100, 1.0)")
    val batch = Seq((1L, 100L, 99.0), (1L, 200L, 2.0)).toDF("TSID", "DT", "VAL")
    val (_, total) = JdbcSink.upsertViaStaging(
      batch, url, "MEAS2", keys = Seq("TSID", "DT"), mode = Upsert.DoNothing)
    assert(total == 2)
    val back = spark.read.jdbc(url, "MEAS2", new java.util.Properties())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(back((1L, 100L)) == 1.0) // conflict ignored
    assert(back((1L, 200L)) == 2.0)
  }
}
