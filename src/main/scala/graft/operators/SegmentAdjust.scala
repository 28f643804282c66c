package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.kernels.SegmentAlgebra
import graft.kernels.SegmentAlgebra.Seg

/** Spark wrapper for the per-series segment algebra: each
  * (series, stream) group's segments are bounded QC metadata (dozens,
  * not millions — SURVEY §7.4 #9), so the split/merge runs as a
  * `flatMapGroups` scan after one shuffle on the stream key.
  * Qualifier-style overlapping types pass the type as `streamCol` —
  * every stream is independently non-overlapping.
  *
  * Output: the post-adjust segments with `op` = 'upsert' plus rows
  * with `op` = 'delete' for ids made redundant; empty output for a
  * group means the proposed state was identical (idempotence
  * short-circuit — the reference's `segments_identical` check).
  */
object SegmentAdjust {

  private val outSchema = StructType(
    Seq(
      StructField("series_id", LongType, nullable = false),
      StructField("stream", StringType, nullable = true),
      StructField("id", LongType, nullable = true),
      StructField("value", StringType, nullable = true),
      StructField("start_dt", TimestampType, nullable = true),
      StructField("end_dt", TimestampType, nullable = true),
      StructField("op", StringType, nullable = false)
    )
  )

  /** Both inputs need: series_id LONG, id LONG (nullable on new),
    * value STRING, start_dt/end_dt TIMESTAMP, plus `streamCol` when
    * given.
    */
  def adjust(
      exist: DataFrame,
      newSegments: DataFrame,
      streamCol: Option[String] = None,
      bridgeLatestExtension: Boolean = false
  ): DataFrame = {
    val streamExpr = streamCol.map(col).getOrElse(lit(null).cast(StringType))
    def prep(df: DataFrame, tag: String) =
      df.select(
        col("series_id").cast(LongType),
        streamExpr.as("stream"),
        col("id").cast(LongType),
        col("value").cast(StringType),
        col("start_dt").cast(TimestampType),
        col("end_dt").cast(TimestampType),
        lit(tag).as("side")
      )
    val all = prep(exist, "E").unionByName(prep(newSegments, "N"))

    all
      .groupByKey(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))(
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
      )
      .flatMapGroups { (key: (Long, String), it: Iterator[Row]) =>
        val rows = it.toArray
        // full-microsecond round-trip: getTime is millis-only, the
        // sub-milli part lives in getNanos
        def toMicros(t: java.sql.Timestamp): Long =
          t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        def toSeg(r: Row) = Seg(
          id = if (r.isNullAt(2)) None else Some(r.getLong(2)),
          seriesId = r.getLong(0),
          value = Option(r.getString(3)),
          startDt = toMicros(r.getTimestamp(4)),
          endDt = toMicros(r.getTimestamp(5))
        )
        def toTs(micros: Long): java.sql.Timestamp = {
          val t = new java.sql.Timestamp(micros / 1000000L * 1000L)
          t.setNanos((micros % 1000000L).toInt * 1000)
          t
        }
        val exist = rows.filter(_.getString(6) == "E").map(toSeg).toSeq
        val news = rows.filter(_.getString(6) == "N").map(toSeg).toSeq
        val stream = if (key._2.isEmpty) null else key._2
        SegmentAlgebra.adjust(exist, news, key._1, bridgeLatestExtension) match {
          case None => Iterator.empty
          case Some((segs, deleteIds)) =>
            val upserts = segs.iterator.map { s =>
              Row(
                key._1,
                stream,
                s.id.map(Long.box).orNull,
                s.value.orNull,
                toTs(s.startDt),
                toTs(s.endDt),
                "upsert"
              )
            }
            val deletes = deleteIds.iterator.map { id =>
              Row(key._1, stream, Long.box(id), null, null, null, "delete")
            }
            upserts ++ deletes
        }
      }(Encoders.row(outSchema))
  }
}
