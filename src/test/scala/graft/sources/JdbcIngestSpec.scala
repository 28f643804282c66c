package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.DriverManager

/** JDBC ingest path against an embedded Derby database (the driver
  * that ships with Spark) standing in for the reference's SQLite
  * HYDAT / Access EQWin sources — same contract, different `driver`
  * arg in production.
  */
class JdbcIngestSpec extends SparkSpec {

  private lazy val dbDir = java.nio.file.Files.createTempDirectory("jdbcspec").toString
  private lazy val url = s"jdbc:derby:$dbDir/hydat;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c)
    finally c.close()
  }

  private lazy val setup: Unit = withConn { c =>
    val st = c.createStatement()
    st.execute("CREATE TABLE MEAS (DT TIMESTAMP, VAL DOUBLE)")
    (1 to 10).foreach { d =>
      st.execute(f"INSERT INTO MEAS VALUES (TIMESTAMP('2023-01-$d%02d 06:00:00'), ${d * 1.5}%.1f)")
    }
    val flowCols = (1 to 31).map(i => s"FLOW$i DOUBLE").mkString(", ")
    st.execute(s"""CREATE TABLE DLY_FLOWS (STATION_NUMBER VARCHAR(10), "YEAR" INT, "MONTH" INT, $flowCols)""")
    def insertMonth(station: String, year: Int, month: Int, base: Double): Unit = {
      val vals = (1 to 31).map(d => if (d <= 28) (base + d).toString else "NULL").mkString(", ")
      st.execute(s"INSERT INTO DLY_FLOWS VALUES ('$station', $year, $month, $vals)")
    }
    insertMonth("09AB001", 2023, 1, 100.0)
    insertMonth("09AB001", 2023, 2, 200.0)
    insertMonth("09CD002", 2023, 1, 300.0)
    st.close()
  }

  test("JdbcSourceAdapter reads incrementally and pushes the datetime filter down") {
    setup
    val cfg = SeriesConfig(
      7L,
      "downloadJdbc",
      Map(
        "url" -> url,
        "table" -> "MEAS",
        "datetime_col" -> "DT",
        "value_col" -> "VAL"
      )
    )
    val out = JdbcSourceAdapter.fetch(spark, cfg, java.sql.Timestamp.valueOf("2023-01-05 00:00:00"))
    val rows = out.orderBy("datetime").collect()
    assert(rows.length == 6) // days 5..10
    assert(rows.head.getAs[Double]("value") == 7.5)
    // the incremental predicate must reach the remote DB, not Spark
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(DT"), plan)
  }

  test("JdbcSourceAdapter parallel partitioned read returns the same rows") {
    setup
    val cfg = SeriesConfig(
      7L,
      "downloadJdbc",
      Map(
        "url" -> url,
        "query" -> "SELECT DT, VAL, 1 AS PK FROM MEAS",
        "datetime_col" -> "DT",
        "value_col" -> "VAL",
        "partition_col" -> "PK",
        "lower_bound" -> "0",
        "upper_bound" -> "2",
        "num_partitions" -> "2"
      )
    )
    val out = JdbcSourceAdapter.fetch(spark, cfg, java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))
    assert(out.rdd.getNumPartitions == 2)
    assert(out.count() == 10)
  }

  test("Hydat.dailyFromDlyFlows unpivots the wide month layout and drops invalid dates") {
    setup
    val dly = spark.read.format("jdbc").option("url", url).option("dbtable", "DLY_FLOWS").load()
    val daily = Hydat.dailyFromDlyFlows(dly)
    // 3 months x 28 non-null days
    assert(daily.count() == 84)
    val jan5 = daily
      .filter(col("station") === "09AB001" && col("date") === "2023-01-05")
      .head()
    assert(jan5.getAs[Double]("value") == 105.0)
    // no fabricated Feb 29-31
    assert(daily.filter(col("date") > "2023-02-28" && col("date") < "2023-03-01").count() == 0)
  }

  test("HYDAT end-to-end: JDBC read -> unpivot -> noon-UTC P1D rows -> high-frequency-day exclusion") {
    setup
    import spark.implicits._
    val dly = spark.read.format("jdbc").option("url", url).option("dbtable", "DLY_FLOWS").load()
    val meas = Hydat.toMeasurements(
      Hydat.dailyFromDlyFlows(dly).filter(col("station") === "09AB001"),
      timeseriesId = 7L,
      offsetHours = -7 // Yukon: local noon = 19:00 UTC
    )
    assert(meas.select("datetime").head().getTimestamp(0).toString == "2023-01-01 19:00:00.0")

    // existing data: 5-minute rows on Jan 3 + an existing daily row on Jan 4
    val existing = Seq(
      (7L, java.sql.Timestamp.valueOf("2023-01-03 14:00:00"), 1.0, 300L),
      (7L, java.sql.Timestamp.valueOf("2023-01-03 14:05:00"), 1.1, 300L),
      (7L, java.sql.Timestamp.valueOf("2023-01-04 19:00:00"), 103.9, 86400L)
    ).toDF("timeseries_id", "datetime", "value", "period_seconds")
    val merged = Hydat.mergeNewDaily(meas, existing, offsetHours = -7)
    val dates = merged.select(to_date(col("datetime") + expr("INTERVAL -7 HOURS")).as("d"))
      .collect().map(_.getDate(0).toString).toSet
    assert(!dates.contains("2023-01-03"), "high-frequency day must be excluded")
    assert(dates.contains("2023-01-04"), "existing noon P1D daily row is not high-frequency")
    assert(dates.contains("2023-01-05"))
    assert(merged.count() == 55) // 56 days - Jan 3
  }
}
