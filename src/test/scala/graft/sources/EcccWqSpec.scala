package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-based ECCC water-quality ingest with import-key mapping —
  * fixture mirrors the open-data CSV shape and the
  * `downloadECCCeq1.csv` key shape.
  */
class EcccWqSpec extends SparkSpec {

  private lazy val dir = java.nio.file.Files.createTempDirectory("ecccwq").toString

  private lazy val paths: (String, String) = {
    val data = new java.io.PrintWriter(s"$dir/eccc.csv")
    data.println("SITE_NO,DATE_TIME_HEURE,FLAG_MARQUEUR,VALUE_VALEUR,UNIT_UNITE,VARIABLE,SAMPLE_ID_ECHANTILLON")
    // one sample with three results at 10:00 (one censored, one unmapped unit)
    data.println("YT09FA0001,2023-05-01 10:00:00,,7.8,PH UNITS,PH,1001")
    data.println("YT09FA0001,2023-05-01 10:00:00,<,0.5,UG/L,ALUMINUM DISSOLVED,1001")
    data.println("YT09FA0001,2023-05-01 10:00:00,,42.0,NTU,TURBIDITY,1001") // unmapped
    // second sample; one bad flag row (skipped)
    data.println("YT09FA0001,2023-06-01 10:00:00,,120.0,UG/L,ALUMINUM DISSOLVED,1002")
    data.println("YT09FA0001,2023-06-01 10:00:00,?,5.0,PH UNITS,PH,1002")
    // other site + pre-start rows are filtered
    data.println("YT09FA0002,2023-05-01 10:00:00,,6.5,PH UNITS,PH,2001")
    data.println("YT09FA0001,2022-01-01 10:00:00,,6.9,PH UNITS,PH,900")
    data.close()
    val key = new java.io.PrintWriter(s"$dir/key.csv")
    key.println("input_param,input_unit,parameter_id,conversion,result_type,sample_fraction,result_value_type,result_speciation_id,matrix_state")
    key.println("PH,PH UNITS,1,1,2,19,1,,liquid")
    key.println("ALUMINUM DISSOLVED,UG/L,1046,0.001,2,5,1,,liquid")
    key.close()
    (s"$dir/eccc.csv", s"$dir/key.csv")
  }

  test("ECCC-wq adapter maps parameters, converts units and censors flagged rows") {
    val (file, key) = paths
    val cfg = SeriesConfig(
      1L,
      "downloadECCCwq",
      Map("file" -> file, "key" -> key, "location" -> "YT09FA0001")
    )
    val batch = EcccWqAdapter.fetch(spark, cfg, java.sql.Timestamp.valueOf("2023-01-01 00:00:00"))
    val results = batch.results.orderBy("datetime", "parameter_id").collect()
    // sample 1: PH mapped 1:1 + censored aluminum; turbidity unmapped.
    // sample 2: aluminum only; the '?'-flagged PH row skipped.
    assert(results.length == 3)
    val ph = results(0)
    assert(ph.getAs[Long]("parameter_id") == 1L)
    assert(ph.getAs[Double]("result") == 7.8)
    val al = results(1)
    assert(al.getAs[Long]("parameter_id") == 1046L)
    assert(al.isNullAt(al.fieldIndex("result")))
    assert(al.getAs[String]("condition") == "below detection")
    assert(math.abs(al.getAs[Double]("condition_value") - 0.0005) < 1e-12)
    val al2 = results(2)
    assert(math.abs(al2.getAs[Double]("result") - 0.12) < 1e-12)

    val samples = batch.samples.orderBy("datetime").collect()
    assert(samples.length == 2)
    assert(samples(0).getAs[String]("import_source_id") == "1001")
    // the mapping join must be a broadcast, not a shuffle
    val plan = batch.results.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("tz offset shifts input-local datetimes to UTC") {
    val (file, key) = paths
    val cfg = SeriesConfig(
      1L,
      "downloadECCCwq",
      Map("file" -> file, "key" -> key, "location" -> "YT09FA0001", "tz_offset_hours" -> "-7")
    )
    val batch = EcccWqAdapter.fetch(spark, cfg, java.sql.Timestamp.valueOf("2023-01-01 00:00:00"))
    val first = batch.results.orderBy("datetime").select("datetime").head().getTimestamp(0)
    assert(first.toString == "2023-05-01 17:00:00.0") // 10:00 MST -> 17:00 UTC
  }
}
