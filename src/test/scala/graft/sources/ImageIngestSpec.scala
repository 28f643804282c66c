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

  test("registerSeries: every gate fires; ids sequential; args JSON keeps colons in values") {
    import spark.implicits._
    val incoming = Seq(
      (10L, 1L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c1, path: a:b", Seq("public_reader")),
      (20L, 2L, None, Some("fx"), "cam: c2", Seq("public_reader")), // missing start
      (30L, 3L, Some(ts("2024-01-01 00:00:00")), None, "cam: c3", Seq("public_reader")), // missing fx
      (40L, 99L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c4", Seq("public_reader")), // unknown loc
      (50L, 4L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c5", Seq("nonesuch")), // bad group
      (60L, 5L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c6", Seq("public_reader")), // dup existing
      (70L, 6L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c7", Seq("public_reader")),
      (71L, 6L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c8", Seq("public_reader")) // dup in batch
    ).toDF("src_key", "location_id", "start_datetime", "source_fx", "source_fx_args", "share_with")
    val locations = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("location_id")
    val groups = Seq("public_reader", "yg").toDF("group_name")
    val existing = Seq((7L, 5L)).toDF("img_series_id", "location_id")
    val reg = ImageIngest.registerSeries(incoming, locations, groups, existing)
    val rejects = reg.rejects.collect()
      .map(r => r.getAs[Long]("src_key") -> r.getAs[String]("reject_reason")).toMap
    assert(rejects == Map(
      20L -> "missing_start", 30L -> "missing_source_fx", 40L -> "unknown_location",
      50L -> "bad_share_with", 60L -> "duplicate_series", 71L -> "duplicate_in_batch"))
    val acc = reg.accepted.orderBy("src_key").collect()
    assert(acc.map(_.getAs[Long]("src_key")).toSeq == Seq(10L, 70L))
    assert(acc.map(_.getAs[Long]("img_series_id")).toSeq == Seq(8L, 9L)) // above max(existing)=7
    assert(acc(0).getAs[String]("source_fx_args") == """{"cam":"c1","path":"a:b"}""")
    // pre-fetch watermark: first_img = last_img = start
    assert(acc(0).getAs[java.sql.Timestamp]("first_img") == ts("2024-01-01 00:00:00"))
    assert(acc(0).getAs[java.sql.Timestamp]("last_img") == ts("2024-01-01 00:00:00"))
  }

  test("registerSeries: NULL share_with (or a NULL element) is bad_share_with, not accepted") {
    import spark.implicits._
    val incoming = Seq(
      (10L, 1L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c1", null),
      (20L, 2L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c2", Seq("public_reader", null)),
      (30L, 3L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c3", Seq("public_reader"))
    ).toDF("src_key", "location_id", "start_datetime", "source_fx", "source_fx_args", "share_with")
    val reg = ImageIngest.registerSeries(
      incoming,
      Seq(1L, 2L, 3L).toDF("location_id"),
      Seq("public_reader").toDF("group_name"),
      Seq.empty[(Long, Long)].toDF("img_series_id", "location_id")
    )
    val rejects = reg.rejects.collect()
      .map(r => r.getAs[Long]("src_key") -> r.getAs[String]("reject_reason")).toMap
    assert(rejects == Map(10L -> "bad_share_with", 20L -> "bad_share_with"))
    assert(reg.accepted.collect().map(_.getAs[Long]("src_key")).toSeq == Seq(30L))
  }

  test("parseFxArgs: duplicate keys last-wins instead of throwing") {
    import spark.implicits._
    val out = Seq("cam: old, path: p, cam: new")
      .toDF("a")
      .select(ImageIngest.parseFxArgs(col("a")).as("j"))
      .head()
      .getString(0)
    assert(out == """{"path":"p","cam":"new"}""" || out == """{"cam":"new","path":"p"}""", out)
  }

  test("seedFirstFetch: empty first fetch rolls the series back; hits rewrite the watermarks") {
    import spark.implicits._
    val incoming = Seq(
      (10L, 1L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c1", Seq("public_reader")),
      (20L, 2L, Some(ts("2024-01-01 00:00:00")), Some("fx"), "cam: c2", Seq("public_reader"))
    ).toDF("src_key", "location_id", "start_datetime", "source_fx", "source_fx_args", "share_with")
    val reg = ImageIngest.registerSeries(
      incoming,
      Seq(1L, 2L).toDF("location_id"),
      Seq("public_reader").toDF("group_name"),
      Seq((0L, 0L)).toDF("img_series_id", "location_id").limit(0)
    )
    val fetched = Seq( // only series 1 finds images
      (1L, ts("2024-01-02 06:00:00")), (1L, ts("2024-01-03 06:00:00"))
    ).toDF("img_series_id", "img_ts")
    val seed = ImageIngest.seedFirstFetch(reg.accepted, fetched)
    assert(seed.rolledBack.collect().map(_.getAs[Long]("img_series_id")).toSeq == Seq(2L))
    val kept = seed.kept.collect()
    assert(kept.length == 1)
    assert(kept(0).getAs[java.sql.Timestamp]("first_img") == ts("2024-01-02 06:00:00"))
    assert(kept(0).getAs[java.sql.Timestamp]("last_img") == ts("2024-01-03 06:00:00"))
  }
}
