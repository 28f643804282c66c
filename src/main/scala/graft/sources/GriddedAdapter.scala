package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gridded-product source adapters — the portable layer of
  * `R/downloadERA5.R:17-100` / `R/downloadHRDPA.R` / `R/downloadHRDPS.R`
  * / `R/downloadCaLDAS.R` (YukonWRB/AquaCache). The decode step is a
  * pluggable trait: [[Grib2Decoder]] parses real GRIB2 bytes (regular
  * grid, simple packing — the fixture product shapes) via the pure-JVM
  * [[Grib2]] reader; [[ParquetStubDecoder]] reads pre-decoded cells;
  * only the HTTP transport remains environment-bound (zero egress).
  * Everything around the decoder is real:
  *
  *   - availability clamping: ERA5-Land lags ~5 days behind realtime;
  *     requests past the availability horizon are clamped, and a
  *     window entirely past it yields an EMPTY frame, not an error
  *     (`downloadERA5.R:41-49`);
  *   - `hrs` validation/parsing: comma-string or ints, each in 0..23
  *     (`:54-73`);
  *   - clip-to-extent on cell coordinates (the reference clips to a
  *     300 km-buffered province polygon; the adapter takes the
  *     bounding extent);
  *   - emission as `operators.Raster` tile rows.
  */
object GriddedAdapter {

  /** One decoded grid: cell rows (x, y, value) for one (valid_ts,
    * band). A production decoder parses GRIB2/NetCDF; the stub reads
    * pre-decoded parquet — same row shape, same plumbing.
    */
  trait GridDecoder extends Serializable {
    def decode(spark: SparkSession, path: String): DataFrame
  }

  /** Reads cells already materialized as parquet
    * (x INT, y INT, value DOUBLE, valid_ts TIMESTAMP, band STRING).
    */
  object ParquetStubDecoder extends GridDecoder {
    override def decode(spark: SparkSession, path: String): DataFrame =
      spark.read.parquet(path)
  }

  /** Real-byte decoder: GRIB2 regular-grid files (simple packing)
    * via [[Grib2.decodeMessages]]. Distributed end-to-end — the
    * `binaryFile` source splits files across executors and the pure
    * byte parser runs inside `flatMap`; one file never needs to fit
    * on the driver. Cell coordinates are grid indices (x west->east,
    * y north->south), valid_ts = reference time + forecast offset.
    */
  object Grib2Decoder extends GridDecoder {
    override def decode(spark: SparkSession, path: String): DataFrame = {
      import spark.implicits._
      spark.read
        .format("binaryFile")
        .load(path)
        .select(col("content"))
        .as[Array[Byte]]
        .flatMap { bytes =>
          Grib2.decodeMessages(bytes).iterator.flatMap { g =>
            val validSec = g.refEpochSec + g.forecastHours * 3600L
            val ts = new java.sql.Timestamp(validSec * 1000L)
            var i = 0
            val rows = new scala.collection.mutable.ArrayBuffer[(Int, Int, Double, java.sql.Timestamp, String)](g.values.length)
            while (i < g.values.length) {
              rows += ((i % g.ni, i / g.ni, g.values(i), ts, g.band))
              i += 1
            }
            rows
          }
        }
        .toDF("x", "y", "value", "valid_ts", "band")
    }
  }

  /** Parse + validate the reference's `hrs` argument: "0,6,12,18" or
    * already-split ints, each an integer in [0, 23].
    */
  def parseHrs(raw: String): Seq[Int] = {
    val parts = raw.split(",").map(_.trim).filter(_.nonEmpty)
    val ints = parts.map { p =>
      val v = p.toDoubleOption.getOrElse(
        throw new IllegalArgumentException(s"hrs must be numeric, got '$p'")
      )
      if (v < 0 || v > 23 || v % 1 != 0)
        throw new IllegalArgumentException(s"hrs values must be integers in 0..23, got '$p'")
      v.toInt
    }
    ints.toSeq
  }

  /** Fetch one gridded series:
    *
    * @param args file (decoded-grid path), optional hrs, optional clip
    *             extent x_min/x_max/y_min/y_max (cell coordinates),
    *             series_id, issue (forecast issue ts, else the window
    *             start), raster_type
    * @param from requested window start (inclusive)
    * @param to   requested window end (inclusive)
    * @param availabilityHorizon latest instant the remote can serve
    *             (ERA5: now - 5 days); `to` is clamped here, and a
    *             window starting past it returns an empty frame
    */
  def fetch(
      spark: SparkSession,
      args: Map[String, String],
      from: java.sql.Timestamp,
      to: java.sql.Timestamp,
      availabilityHorizon: java.sql.Timestamp,
      tileW: Int = 64,
      tileH: Int = 64,
      decoder: GridDecoder = ParquetStubDecoder
  ): DataFrame = {
    val seriesId = args.getOrElse("series_id", "0").toLong
    val clampedTo = if (to.after(availabilityHorizon)) availabilityHorizon else to
    val cells0 = decoder.decode(spark, args("file"))
    val empty = from.after(clampedTo)
    val windowed = cells0
      .filter(!lit(empty) && col("valid_ts") >= lit(from) && col("valid_ts") <= lit(clampedTo))
    val hrsFiltered = args.get("hrs") match {
      case Some(raw) =>
        val hrs = parseHrs(raw)
        windowed.filter(hour(col("valid_ts")).isin(hrs: _*))
      case None => windowed
    }
    val clipped = (for {
      xMin <- args.get("x_min"); xMax <- args.get("x_max")
      yMin <- args.get("y_min"); yMax <- args.get("y_max")
    } yield hrsFiltered.filter(
      col("x") >= xMin.toInt && col("x") < xMax.toInt &&
        col("y") >= yMin.toInt && col("y") < yMax.toInt
    )).getOrElse(hrsFiltered)
    val issued = args.get("issue").map(java.sql.Timestamp.valueOf).getOrElse(from)
    graft.operators.Raster
      .tileGrid(
        clipped
          .withColumn("series_id", lit(seriesId))
          .withColumn("issue_ts", lit(issued)),
        tileW,
        tileH
      )
      .withColumn("raster_type", lit(args.getOrElse("raster_type", "reanalysis")))
  }
}
