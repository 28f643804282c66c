package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class DoyStatsSpec extends SparkSpec {

  private def daily(rows: (String, String, Double)*) = {
    import spark.implicits._
    rows.toSeq
      .toDF("series_key", "date_s", "value")
      .withColumn("date", to_date(col("date_s")))
      .drop("date_s")
  }

  test("stats cover only PRIOR years with same doy; exact interpolated quantiles") {
    val df = daily(
      ("a", "2019-03-05", 10.0),
      ("a", "2020-03-05", 20.0),
      ("a", "2021-03-05", 40.0),
      ("a", "2022-03-05", 25.0),
      ("a", "2022-03-06", 99.0) // different doy, must not contaminate
    )
    val out = DoyStats(df)
      .filter(col("date") === Date.valueOf("2022-03-05"))
      .select("doy_count", "min", "max", "mean", "q50", "percent_historic_range")
      .collect()
      .head
    assert(out.getLong(0) == 3L)
    assert(out.getDouble(1) == 10.0)
    assert(out.getDouble(2) == 40.0)
    assert(math.abs(out.getDouble(3) - 70.0 / 3) < 1e-12)
    assert(out.getDouble(4) == 20.0) // median of 10,20,40
    assert(out.getDouble(5) == 50.0) // (25-10)/(40-10)*100
  }

  test("first year has doy_count 0 and null stats") {
    val out = DoyStats(daily(("a", "2020-06-01", 5.0))).collect().head
    assert(out.getLong(3) == 0L) // doy_count
    assert(out.isNullAt(4)) // min
  }

  test("normalized doy aligns post-Feb-29 leap days and nulls Feb 29") {
    // 2020 is leap: Mar 1 2020 is doy 61 -> normalized 60, matching
    // Mar 1 2019 (doy 60)
    val df = daily(
      ("a", "2019-03-01", 7.0),
      ("a", "2020-02-29", 1.0),
      ("a", "2020-03-01", 9.0)
    )
    val out = DoyStats(df).orderBy("date").collect()
    val mar2020 = out.find(_.getDate(1) == Date.valueOf("2020-03-01")).get
    assert(mar2020.getLong(3) == 1L) // sees 2019-03-01
    assert(mar2020.getDouble(4) == 7.0)
    val feb29 = out.find(_.getDate(1) == Date.valueOf("2020-02-29")).get
    assert(feb29.getLong(3) == 0L)
  }

  test("rolling window excludes values older than the cutoff") {
    val df = daily(
      ("a", "2015-07-01", 100.0),
      ("a", "2019-07-01", 10.0),
      ("a", "2021-07-01", 30.0),
      ("a", "2022-07-01", 20.0)
    )
    val all = DoyStats(df).filter(col("date") === Date.valueOf("2022-07-01")).collect().head
    assert(all.getLong(3) == 3L)
    val rolling = DoyStats(df, rollingYears = Some(3))
      .filter(col("date") === Date.valueOf("2022-07-01"))
      .collect()
      .head
    assert(rolling.getLong(3) == 2L) // 2015 and 2019 out of the 3y window
    assert(rolling.getDouble(4) == 10.0)
  }

  test("percentileCont matches linear interpolation") {
    val a = IndexedSeq(1.0, 2.0, 10.0, 20.0)
    assert(DoyStats.percentileCont(a, 0.5) == 6.0)
    assert(DoyStats.percentileCont(a, 0.0) == 1.0)
    assert(DoyStats.percentileCont(a, 1.0) == 20.0)
    assert(math.abs(DoyStats.percentileCont(a, 0.25) - 1.75) < 1e-12)
    assert(DoyStats.percentileCont(IndexedSeq(5.0), 0.9) == 5.0)
  }
}
