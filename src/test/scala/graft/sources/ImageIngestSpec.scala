package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageIngestSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def catalog = {
    import spark.implicits._
    Seq(
      (1L, Some(ts("2024-01-01 12:00:00")), true),
      (2L, None: Option[java.sql.Timestamp], true), // new series: no watermark
      (3L, Some(ts("2024-01-01 00:00:00")), false)  // inactive
    ).toDF("img_series_id", "last_img", "active")
  }

  private def fetched = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 11:00:00"), "old", "jpg"),   // at/before watermark: dropped
      (1L, ts("2024-01-01 13:00:00"), "aaa", "jpg"),
      (1L, ts("2024-01-01 13:00:00"), "bbb", "jpg"),   // same-ts duplicate
      (2L, ts("2024-01-01 09:00:00"), "ccc", "jpg"),
      (3L, ts("2024-01-02 00:00:00"), "ddd", "jpg")    // inactive series: dropped
    ).map { case (s, t, body, f) => (s, t, body.getBytes("UTF-8"), f) }
      .toDF("img_series_id", "img_ts", "payload", "format")
  }

  test("newImages: active + watermark filters, deterministic same-ts dedup, fingerprint") {
    val out = ImageIngest.newImages(catalog, fetched).orderBy("img_series_id", "img_ts").collect()
    assert(out.map(_.getLong(0)).toList == List(1L, 2L))
    // of the two 13:00 payloads the lower fingerprint wins, reproducibly
    val md5num = (s: String) =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .take(7).map("%02x".format(_)).mkString, 16)
    val expectBody = if (md5num("aaa") < md5num("bbb")) "aaa" else "bbb"
    assert(new String(out(0).getAs[Array[Byte]]("payload"), "UTF-8") == expectBody)
    assert(out(0).getAs[Long]("fingerprint") == md5num(expectBody))
  }

  test("skipExisting drops rows already present; latestPerSeries advances the watermark") {
    import spark.implicits._
    val existing = Seq((2L, ts("2024-01-01 09:00:00"))).toDF("img_series_id", "img_ts")
    val fresh = ImageIngest.newImages(catalog, fetched)
    val novel = ImageIngest.skipExisting(fresh, existing)
    assert(novel.select("img_series_id").as[Long].collect().toList == List(1L))

    val latest = ImageIngest.latestPerSeries(fresh).orderBy("img_series_id").collect()
    assert(latest.length == 2)
    assert(latest(0).getAs[java.sql.Timestamp]("last_img") == ts("2024-01-01 13:00:00"))
    assert(latest(0).getAs[Int]("last_bytes") == 3)
  }
}
