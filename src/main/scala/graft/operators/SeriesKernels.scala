package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.kernels.{IncrementKernel, PeriodKernel}

/** Spark wrappers for the per-series ordered-scan kernels (period
  * inference, increment extraction). Series are independent and each
  * series' points fit comfortably in one task (the reference's whole
  * DB is bounded per series), so `flatMapGroups` after a shuffle on
  * the series key is the right distribution: order is pinned by an
  * in-group sort, state is per-group, and 100 TB of series fan out
  * across executors with no driver involvement (SURVEY §7.4 #3).
  */
object SeriesKernels {

  /** Adds an ISO-8601 `period` column per (series, datetime) row. */
  def inferPeriods(
      df: DataFrame,
      keyCol: String,
      dtCol: String
  ): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(keyCol, LongType, nullable = false),
        StructField(dtCol, TimestampType, nullable = true),
        StructField("period", StringType, nullable = true)
      )
    )
    val prepared = df.select(
      col(keyCol).cast(LongType),
      col(dtCol).cast(TimestampType)
    )
    prepared
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        // sort on full micros: millis-only ordering is nondeterministic
        // across shuffles for sub-milli timestamps
        val ts = it.map(_.getTimestamp(1)).toArray.sortBy(t => (t.getTime, t.getNanos))
        val epochs = ts.map(t => Math.floorDiv(t.getTime, 1000L))
        val periods = PeriodKernel.inferPeriods(epochs)
        ts.iterator.zip(periods.iterator).map { case (t, p) =>
          Row(key, t, p.orNull)
        }
      }(Encoders.row(schema))
  }

  /** Increments from cumulative per-series values (densified rows
    * included, `increment` NULL where not computable).
    */
  def increments(
      df: DataFrame,
      keyCol: String,
      dtCol: String,
      valueCol: String,
      resetDrop: Double = 20.0,
      minPos: Double = 0.0,
      maxGap: Int = 0
  ): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(keyCol, LongType, nullable = false),
        StructField(dtCol, TimestampType, nullable = true),
        StructField("increment", DoubleType, nullable = true),
        // densified position within the series: a deterministic sort
        // key even when second-truncated timestamps collide
        StructField("seq", LongType, nullable = false)
      )
    )
    val prepared = df.select(
      col(keyCol).cast(LongType),
      col(dtCol).cast(TimestampType),
      col(valueCol).cast(DoubleType)
    )
    prepared
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        // NULL measurements are observation gaps, not zeros: dropping
        // them here lets densification re-insert them as NA points, so
        // they obey the maxGap rule instead of faking a reset (the
        // reference treats NA rows as no-increment gaps,
        // R/compute_increments.R:69-80)
        val rows = it.filter(!_.isNullAt(2))
          .map(r => (r.getTimestamp(1), r.getDouble(2)))
          .toArray.sortBy(r => (r._1.getTime, r._1.getNanos))
        if (rows.length < 2) Iterator.empty
        else {
          val epochs = rows.map(r => Math.floorDiv(r._1.getTime, 1000L))
          val (dts, incs) = IncrementKernel.computeIncrements(
            epochs,
            rows.map(_._2),
            resetDrop,
            minPos,
            maxGap
          )
          dts.iterator.zip(incs.iterator).zipWithIndex.map { case ((e, inc), i) =>
            Row(key, new java.sql.Timestamp(e * 1000L), inc.map(Double.box).orNull, (i + 1).toLong)
          }
        }
      }(Encoders.row(schema))
  }
}
