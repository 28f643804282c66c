package graft.sources

import java.nio.ByteBuffer

/** Minimal pure-JVM GRIB2 reader for the regular lat/lon,
  * simple-packing product shapes the gridded adapters ingest
  * (`R/downloadERA5.R:14`, `R/writeRaster.R:1-12` decode the same
  * products through terra/GDAL). Scope, by design:
  *
  *   - edition 2, possibly many messages concatenated per file;
  *   - grid definition template 3.0 (regular lat/lon), row-major
  *     scanning (west->east, north->south);
  *   - data representation template 5.0 (simple packing, any
  *     bits-per-value 1..31), value = (R + X * 2^E) / 10^D;
  *   - no bitmap (section 6 indicator 255) — the fixture products are
  *     dense reanalysis grids.
  *
  * Anything outside that scope throws with the offending section —
  * fail loud, not garbage cells. The byte layer is deliberately
  * driver-free: `decodeMessages` is a pure function on a byte array,
  * so executors run it inside `flatMap` over `binaryFile` rows.
  */
object Grib2 {

  /** One decoded message: reference time (epoch seconds), forecast
    * offset in hours, grid dims, band key
    * (discipline/category/number), and Ni*Nj values row-major.
    */
  final case class DecodedGrid(
      refEpochSec: Long,
      forecastHours: Int,
      ni: Int,
      nj: Int,
      band: String,
      values: Array[Double]
  )

  private final class Reader(bytes: Array[Byte], var pos: Int) {
    def u8(off: Int): Int = bytes(pos + off) & 0xff
    def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
    def u32(off: Int): Long = (u16(off).toLong << 16) | u16(off + 2)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    /** GRIB2 signed fields are sign-magnitude: high bit = negative. */
    def s16(off: Int): Int = {
      val raw = u16(off)
      if ((raw & 0x8000) != 0) -(raw & 0x7fff) else raw
    }
    def f32(off: Int): Float =
      ByteBuffer.wrap(bytes, pos + off, 4).getFloat
  }

  /** Decode every message in a GRIB2 file image. */
  def decodeMessages(bytes: Array[Byte]): Seq[DecodedGrid] = {
    val out = Seq.newBuilder[DecodedGrid]
    var off = 0
    while (off + 16 <= bytes.length) {
      val r = new Reader(bytes, off)
      require(
        r.u8(0) == 'G' && r.u8(1) == 'R' && r.u8(2) == 'I' && r.u8(3) == 'B',
        s"not a GRIB message at offset $off"
      )
      require(r.u8(7) == 2, s"unsupported GRIB edition ${r.u8(7)} (only 2)")
      val discipline = r.u8(6)
      val totalLen = r.u64(8)
      // fail loud on a corrupt length rather than spinning in place;
      // compare without addition — `off + totalLen` overflows negative
      // for a u64 just under 2^63 and would slip past the gate into a
      // truncating toInt (lengths >= 2^63 already read back negative)
      require(
        totalLen >= 16 && totalLen <= bytes.length.toLong - off,
        s"corrupt GRIB2 message length $totalLen at offset $off (file ${bytes.length} bytes)"
      )
      out += decodeOne(bytes, off + 16, off + totalLen.toInt, discipline)
      off += totalLen.toInt
    }
    out.result()
  }

  private def decodeOne(bytes: Array[Byte], start: Int, end: Int, discipline: Int): DecodedGrid = {
    var pos = start
    var refEpochSec = 0L
    var forecastHours = 0
    var ni = 0
    var nj = 0
    var category = -1
    var number = -1
    var refValue = 0.0f
    var binScale = 0
    var decScale = 0
    var bitsPerValue = 0
    var nPoints = 0L
    var values: Array[Double] = null

    while (pos < end - 4) {
      val r = new Reader(bytes, pos)
      val secLen = r.u32(0).toInt
      val secNum = r.u8(4)
      require(secLen >= 5, s"corrupt GRIB2 section length $secLen (section $secNum at $pos)")
      secNum match {
        case 1 =>
          // octets 13-14 year, 15 month, 16 day, 17 hour, 18 min, 19 sec
          val y = r.u16(12); val mo = r.u8(14); val d = r.u8(15)
          val h = r.u8(16); val mi = r.u8(17); val s = r.u8(18)
          refEpochSec = java.time.LocalDateTime
            .of(y, mo, d, h, mi, s)
            .toEpochSecond(java.time.ZoneOffset.UTC)
        case 2 => // local use — skip
        case 3 =>
          val template = r.u16(12)
          require(template == 0, s"unsupported grid template 3.$template (only 3.0 lat/lon)")
          ni = r.u32(30).toInt
          nj = r.u32(34).toInt
          val scan = r.u8(71)
          require(scan == 0, s"unsupported scanning mode $scan (only 0: W->E, N->S)")
        case 4 =>
          val template = r.u16(7)
          require(template == 0, s"unsupported product template 4.$template (only 4.0)")
          category = r.u8(9)
          number = r.u8(10)
          val timeUnit = r.u8(17)
          val fc = r.u32(18).toInt
          // unit 0 = minutes, 1 = hours (the fixture products are hourly)
          forecastHours = timeUnit match {
            case 0 => fc / 60
            case 1 => fc
            case u => throw new IllegalArgumentException(s"unsupported forecast time unit $u")
          }
        case 5 =>
          val template = r.u16(9)
          require(template == 0, s"unsupported packing template 5.$template (only 5.0 simple)")
          nPoints = r.u32(5)
          refValue = r.f32(11)
          binScale = r.s16(15)
          decScale = r.s16(17)
          bitsPerValue = r.u8(19)
          require(bitsPerValue > 0 && bitsPerValue < 32, s"unsupported bits-per-value $bitsPerValue")
        case 6 =>
          require(r.u8(5) == 255, s"bitmaps not supported (indicator ${r.u8(5)})")
        case 7 =>
          val n = nPoints.toInt
          values = new Array[Double](n)
          val twoPowE = math.pow(2.0, binScale)
          val tenPowD = math.pow(10.0, decScale)
          var bitPos = 0L
          val base = pos + 5
          var i = 0
          while (i < n) {
            var x = 0L
            var got = 0
            while (got < bitsPerValue) {
              val byteIdx = base + (bitPos >> 3).toInt
              val bitInByte = (bitPos & 7).toInt
              val take = math.min(8 - bitInByte, bitsPerValue - got)
              val chunk = ((bytes(byteIdx) & 0xff) >> (8 - bitInByte - take)) & ((1 << take) - 1)
              x = (x << take) | chunk
              got += take
              bitPos += take
            }
            values(i) = (refValue + x * twoPowE) / tenPowD
            i += 1
          }
        case other =>
          throw new IllegalArgumentException(s"unexpected GRIB2 section $other")
      }
      pos += secLen
    }
    require(values != null, "GRIB2 message has no data section")
    require(
      ni.toLong * nj == values.length,
      s"grid dims ${ni}x$nj don't match ${values.length} data points"
    )
    DecodedGrid(refEpochSec, forecastHours, ni, nj, s"d${discipline}_c${category}_n$number", values)
  }
}
