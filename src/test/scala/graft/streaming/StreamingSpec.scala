package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {

  test("AvailableNow file ingest drains the backlog exactly once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val cp = s"$base/cp"
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2023-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2023-01-01 01:00:00"), 2.0),
      (2L, java.sql.Timestamp.valueOf("2023-01-01 00:30:00"), 5.0)
    ).toDF("timeseries_id", "datetime", "value")
    batch.write.parquet(src)

    val schema = StructType(Seq(
      StructField("timeseries_id", LongType),
      StructField("datetime", TimestampType),
      StructField("value", DoubleType)
    ))
    val q = StreamingIngest.ingestAvailableNow(spark, src, schema, sink, cp)
    q.awaitTermination(60000)
    assert(spark.read.parquet(sink).count() == 3)

    // second run with no new files: nothing re-ingested (checkpoint)
    val q2 = StreamingIngest.ingestAvailableNow(spark, src, schema, sink, cp)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(sink).count() == 3)
  }

  test("windowedDaily aggregates a stream into daily means") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream2").toString
    val src = s"$base/src"
    Seq(
      (1L, java.sql.Timestamp.valueOf("2023-01-01 06:00:00"), 2.0),
      (1L, java.sql.Timestamp.valueOf("2023-01-01 18:00:00"), 4.0),
      (1L, java.sql.Timestamp.valueOf("2023-01-02 06:00:00"), 9.0)
    ).toDF("timeseries_id", "datetime", "value").write.parquet(src)
    val schema = StructType(Seq(
      StructField("timeseries_id", LongType),
      StructField("datetime", TimestampType),
      StructField("value", DoubleType)
    ))
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamingIngest
      .windowedDaily(stream)
      .writeStream
      .format("memory")
      .queryName("daily_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.sql("select * from daily_out order by date_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("value") == 3.0)
    assert(rows(1).getAs[Double]("value") == 9.0)
  }
}
