package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompoundSpec extends SparkSpec {

  private def series(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toSeq
      .toDF("timeseries_id", "dt_s", "value")
      .withColumn("datetime", to_timestamp(col("dt_s")))
      .drop("dt_s")
  }

  test("priorityCoalesce: lower priority number wins, backup fills gaps") {
    val primary = series((1L, "2023-01-01 00:00:00", 1.0), (1L, "2023-01-01 02:00:00", 3.0))
    val backup = series((1L, "2023-01-01 00:00:00", 100.0), (1L, "2023-01-01 01:00:00", 2.0))
    val out = Compound
      .priorityCoalesce(Seq((primary, 1, "p"), (backup, 2, "b")), Seq("timeseries_id"), "datetime")
      .orderBy("datetime")
      .select("value", "member_alias")
      .collect()
      .map(r => (r.getDouble(0), r.getString(1)))
      .toList
    assert(out == List((1.0, "p"), (2.0, "b"), (3.0, "p")))
  }

  test("expressionCompound: reference fixture formula over aligned members") {
    val temp = series((1L, "2023-01-01 00:00:00", 25.0), (1L, "2023-01-01 01:00:00", 30.0))
    val cond = series((1L, "2023-01-01 00:00:00", 150.0), (1L, "2023-01-01 01:00:00", 200.0), (1L, "2023-01-01 02:00:00", 999.0))
    val out = Compound
      .expressionCompound(
        Seq("temp" -> temp, "cond" -> cond),
        "cond / (1 + 0.0191 * (temp - 25))",
        Seq("timeseries_id"),
        "datetime"
      )
      .orderBy("datetime")
      .select("value")
      .collect()
      .map(_.getDouble(0))
      .toList
    assert(out.size == 2) // inner join: 02:00 has no temp member
    assert(out.head == 150.0)
    assert(math.abs(out(1) - 200.0 / (1 + 0.0191 * 5)) < 1e-12)
  }

  test("expressionCompound rejects expressions outside the sandbox") {
    val t = series((1L, "2023-01-01 00:00:00", 1.0))
    val e = intercept[IllegalArgumentException] {
      Compound.expressionCompound(Seq("a" -> t), "a; drop table x", Seq("timeseries_id"), "datetime")
    }
    assert(e.getMessage.contains("unsafe"))
  }

  test("toleranceAsOf: mutual nearest within tolerance, ties broken deterministically") {
    import spark.implicits._
    def df(rows: (Long, Long, String)*) =
      rows.toSeq
        .toDF("timeseries_id", "id", "dt_s")
        .withColumn("datetime", to_timestamp(col("dt_s")))
        .drop("dt_s")
    // anchor a1@00:00, a2@00:10; members m1@00:01 (nearest a1),
    // m2@00:09 (nearest a2), m3@00:20 (within tol of a2 but a2 taken by m2? no:
    // mutual-nearest means m3's nearest anchor is a2 but a2's nearest member is m2 -> m3 unmatched)
    val anchors = df((1L, 1L, "2023-01-01 00:00:00"), (1L, 2L, "2023-01-01 00:10:00"))
    val members = df((1L, 11L, "2023-01-01 00:01:00"), (1L, 12L, "2023-01-01 00:09:00"), (1L, 13L, "2023-01-01 00:20:00"))
    val out = Compound
      .toleranceAsOf(anchors, members, 900L, Seq("timeseries_id"), "datetime", "id", mutual = true)
      .select("a_id", "m_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out == Set((1L, 11L), (2L, 12L)))
  }

  test("toleranceAsOf: non-mutual (reuse) keeps nearest per anchor even if member reused") {
    import spark.implicits._
    def df(rows: (Long, Long, String)*) =
      rows.toSeq
        .toDF("timeseries_id", "id", "dt_s")
        .withColumn("datetime", to_timestamp(col("dt_s")))
        .drop("dt_s")
    val anchors = df((1L, 1L, "2023-01-01 00:00:00"), (1L, 2L, "2023-01-01 00:02:00"))
    val members = df((1L, 11L, "2023-01-01 00:01:00"))
    val out = Compound
      .toleranceAsOf(anchors, members, 900L, Seq("timeseries_id"), "datetime", "id", mutual = false)
      .select("a_id", "m_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out == Set((1L, 11L), (2L, 11L)))
  }

  test("toleranceAsOf matches a direct oracle on randomized instances (SURVEY §7.4 #2)") {
    import spark.implicits._
    val tolUs = 900L * 1000000L
    // direct reimplementation of the reference semantics: rank pairs
    // per anchor by (|dt|, member dt, member id) and per member by
    // (|dt|, anchor dt, anchor id); keep rank-1 (both ranks if mutual)
    def oracle(
        as: Seq[(Long, Long)], // (id, epochUs)
        ms: Seq[(Long, Long)],
        mutual: Boolean
    ): Set[(Long, Long)] = {
      val pairs = for {
        (aid, at) <- as
        (mid, mt) <- ms
        d = math.abs(at - mt)
        if d <= tolUs
      } yield (aid, at, mid, mt, d)
      val anchorBest = pairs
        .groupBy(_._1)
        .map { case (_, ps) => ps.minBy(p => (p._5, p._4, p._3)) }
        .toSet
      if (!mutual) anchorBest.map(p => (p._1, p._3))
      else {
        val memberBest = pairs
          .groupBy(_._3)
          .map { case (_, ps) => ps.minBy(p => (p._5, p._2, p._1)) }
          .toSet
        (anchorBest intersect memberBest).map(p => (p._1, p._3))
      }
    }
    (1 to 8).foreach { seed =>
      val rng = new scala.util.Random(seed)
      def gen(n: Int): Seq[(Long, Long)] =
        (1 to n)
          .map(i => (i.toLong, rng.nextInt(20000).toLong * 1000000L))
          .groupBy(_._2).map(_._2.head).toSeq // distinct timestamps
      val as = gen(15)
      val ms = gen(15)
      def df(rows: Seq[(Long, Long)]) =
        rows.toDF("id", "us")
          .withColumn("timeseries_id", lit(1L))
          .withColumn("datetime", timestamp_micros(col("us")))
          .drop("us")
      Seq(true, false).foreach { mutual =>
        val got = Compound
          .toleranceAsOf(df(as), df(ms), 900L, Seq("timeseries_id"), "datetime", "id", mutual)
          .select(col("a_id"), col("m_id"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toSet
        val want = oracle(as, ms, mutual)
        assert(got == want, s"seed=$seed mutual=$mutual: got $got want $want")
      }
    }
  }
}
