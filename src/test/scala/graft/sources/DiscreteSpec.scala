package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiscreteSpec extends SparkSpec {

  private val cfg =
    SeriesConfig(1L, "downloadSyntheticDiscrete", Map("n_samples" -> "12"))

  test("SyntheticDiscreteAdapter returns keyed samples with 3 results each") {
    val batch = SyntheticDiscreteAdapter
      .fetch(spark, cfg, java.sql.Timestamp.valueOf("2023-01-01 00:00:00"))
    assert(batch.samples.count() == 12)
    assert(batch.results.count() == 36)
    // every result joins back to exactly one sample (import keying holds)
    val joined = batch.results
      .join(batch.samples, Seq("sample_id"))
    assert(joined.count() == 36)
    assert(
      batch.samples.select("import_source_id").distinct().count() == 12,
      "import_source_id must be unique per sample for re-import reconciliation"
    )
  }

  test("censored non-detects carry condition + DL but a NULL result") {
    val batch = SyntheticDiscreteAdapter
      .fetch(spark, cfg, java.sql.Timestamp.valueOf("2023-01-01 00:00:00"))
    val zinc = batch.results.filter(col("parameter") === "dissolved_zinc")
    val censored = zinc.filter(col("condition").isNotNull)
    assert(censored.count() == 4) // every 3rd of 12 samples
    assert(censored.filter(col("result").isNotNull).count() == 0)
    assert(censored.filter(col("condition_value") =!= 0.005).count() == 0)
    val detected = zinc.filter(col("condition").isNull)
    assert(detected.filter(col("result").isNull).count() == 0)
  }

  test("UnitConvert: imperial->metric conversions and the inf scrub") {
    import spark.implicits._
    val df = Seq(32.0, 212.0, Double.NaN, Double.PositiveInfinity)
      .toDF("v")
    val c = df
      .select(UnitConvert.convert("f_to_c", org.apache.spark.sql.functions.col("v")).as("c"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(c(0).contains(0.0) && c(1).contains(100.0))
    assert(c(2).isEmpty && c(3).isEmpty, "NaN and Inf scrub to NULL, rows kept")
    val m = Seq(3.28084).toDF("v")
      .select(UnitConvert.convert("ft_to_m", org.apache.spark.sql.functions.col("v")))
      .head().getDouble(0)
    assert(math.abs(m - 1.0) < 1e-9)
    intercept[IllegalArgumentException](UnitConvert.convert("furlongs", org.apache.spark.sql.functions.lit(1.0)))
  }

  test("incremental startTs filters samples and their results") {
    val batch = SyntheticDiscreteAdapter
      .fetch(spark, cfg, java.sql.Timestamp.valueOf("2023-06-01 00:00:00"))
    assert(batch.samples.count() < 12)
    assert(batch.results.count() == batch.samples.count() * 3)
    val minDt = batch.samples.agg(min("datetime")).head().getTimestamp(0)
    assert(!minDt.before(java.sql.Timestamp.valueOf("2023-06-01 00:00:00")))
  }
}
