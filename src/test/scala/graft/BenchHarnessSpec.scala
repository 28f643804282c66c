package graft

import org.apache.spark.sql.functions._

/** The bench harness must never ship a failure as a timing row: a
  * crashing query propagates (with its name) instead of becoming a
  * -1.0 entry in BENCH_LOCAL.json, and the per-query session reset
  * actually clears the debris (cached plans, localCheckpoint blocks)
  * that round 5's in-suite timing swings tracked to.
  */
class BenchHarnessSpec extends SparkSpec {

  test("timeQuery: a crashing query fails the bench, names the query") {
    val explode = udf { (_: Int) =>
      throw new RuntimeException("kaboom"); false
    }
    val boom = (_: org.apache.spark.sql.SparkSession, _: String) =>
      spark.range(1).select(col("id").cast("int").as("x")).filter(explode(col("x")))
    val e = intercept[IllegalStateException] {
      Bench.timeQuery(spark, "/nonexistent", "q_exploding", boom, reps = 1)
    }
    assert(e.getMessage.contains("q_exploding"))
  }

  test("timeQuery: a healthy query returns reps timings, median within range") {
    val ok = (_: org.apache.spark.sql.SparkSession, _: String) =>
      spark.range(100).toDF("n")
    val (med, mn, mx, runs) = Bench.timeQuery(spark, "unused", "q_ok", ok, reps = 3)
    assert(runs.length == 3)
    assert(mn <= med && med <= mx && mn >= 0)
  }

  test("resetSession drops cached plans and localCheckpoint blocks") {
    import spark.implicits._
    val cached = (1 to 100).toDF("n").cache()
    cached.count()
    val ckpt = (1 to 100).toDF("m").localCheckpoint(true)
    ckpt.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Bench.resetSession(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
