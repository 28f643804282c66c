package graft.sources

import graft.SparkSpec
import java.nio.ByteBuffer

/** GRIB2 byte-level round trip: a synthetic encoder writes real
  * edition-2 messages (template 3.0 grid, 4.0 product, 5.0 simple
  * packing), the decoder must recover dims, band, timestamps and
  * values bit-exactly (same (R + X*2^E)/10^D arithmetic), including
  * non-byte-aligned bit widths and multi-message files; the Spark
  * `binaryFile` path feeds the gridded adapter with the same bytes.
  */
class Grib2Spec extends SparkSpec {

  /** Minimal GRIB2 writer for the decoder's supported shapes. */
  private def encodeMessage(
      discipline: Int,
      category: Int,
      number: Int,
      year: Int, month: Int, day: Int, hour: Int,
      forecastHours: Int,
      ni: Int, nj: Int,
      refValue: Float,
      binScale: Int,
      decScale: Int,
      bitsPerValue: Int,
      packed: Array[Int]
  ): Array[Byte] = {
    require(packed.length == ni * nj)
    def s16(v: Int): Int = if (v < 0) 0x8000 | -v else v

    val sec1 = ByteBuffer.allocate(21)
    sec1.putInt(21).put(1.toByte)
    sec1.putShort(0).putShort(0).put(0.toByte).put(0.toByte).put(0.toByte)
    sec1.putShort(year.toShort).put(month.toByte).put(day.toByte)
    sec1.put(hour.toByte).put(0.toByte).put(0.toByte)
    sec1.put(0.toByte).put(0.toByte)

    val sec3 = ByteBuffer.allocate(72)
    sec3.putInt(72).put(3.toByte)
    sec3.put(0.toByte).putInt(ni * nj).put(0.toByte).put(0.toByte)
    sec3.putShort(0) // template 3.0
    sec3.position(30); sec3.putInt(ni)
    sec3.position(34); sec3.putInt(nj)
    sec3.position(71); sec3.put(0.toByte) // scanning mode 0

    val sec4 = ByteBuffer.allocate(34)
    sec4.putInt(34).put(4.toByte)
    sec4.putShort(0) // no coord values
    sec4.putShort(0) // template 4.0
    sec4.put(category.toByte).put(number.toByte)
    sec4.position(17); sec4.put(1.toByte) // time unit: hours
    sec4.position(18); sec4.putInt(forecastHours)

    val sec5 = ByteBuffer.allocate(21)
    sec5.putInt(21).put(5.toByte)
    sec5.putInt(ni * nj)
    sec5.putShort(0) // template 5.0
    sec5.putFloat(refValue)
    sec5.putShort(s16(binScale).toShort)
    sec5.putShort(s16(decScale).toShort)
    sec5.put(bitsPerValue.toByte).put(0.toByte)

    val sec6 = ByteBuffer.allocate(6)
    sec6.putInt(6).put(6.toByte).put(255.toByte)

    val dataBytes = (packed.length * bitsPerValue + 7) / 8
    val sec7 = ByteBuffer.allocate(5 + dataBytes)
    sec7.putInt(5 + dataBytes).put(7.toByte)
    var acc = 0L; var accBits = 0
    packed.foreach { x =>
      acc = (acc << bitsPerValue) | (x.toLong & ((1L << bitsPerValue) - 1))
      accBits += bitsPerValue
      while (accBits >= 8) {
        sec7.put(((acc >> (accBits - 8)) & 0xff).toByte)
        accBits -= 8
      }
    }
    if (accBits > 0) sec7.put(((acc << (8 - accBits)) & 0xff).toByte)

    val body = Array(sec1, sec3, sec4, sec5, sec6, sec7).map(_.array()).reduce(_ ++ _)
    val totalLen = 16L + body.length + 4
    val sec0 = ByteBuffer.allocate(16)
    sec0.put('G'.toByte).put('R'.toByte).put('I'.toByte).put('B'.toByte)
    sec0.putShort(0).put(discipline.toByte).put(2.toByte)
    sec0.putLong(totalLen)
    sec0.array() ++ body ++ "7777".getBytes("ASCII")
  }

  test("round trip: 16-bit exact integers, identity scaling") {
    val packed = Array.tabulate(6 * 4)(i => i * 7 % 65536)
    val bytes = encodeMessage(0, 1, 8, 2024, 3, 15, 6, 0, 6, 4, 0.0f, 0, 0, 16, packed)
    val Seq(g) = Grib2.decodeMessages(bytes)
    assert(g.ni == 6 && g.nj == 4)
    assert(g.band == "d0_c1_n8")
    assert(g.forecastHours == 0)
    assert(
      g.refEpochSec ==
        java.time.LocalDateTime.of(2024, 3, 15, 6, 0, 0).toEpochSecond(java.time.ZoneOffset.UTC)
    )
    assert(g.values.toSeq == packed.map(_.toDouble).toSeq)
  }

  test("round trip: 12-bit packing with binary and decimal scaling") {
    val packed = Array.tabulate(5 * 3)(i => (i * 251) % 4096)
    val bytes = encodeMessage(2, 0, 5, 2023, 12, 31, 18, 6, 5, 3, 100.0f, -1, 1, 12, packed)
    val Seq(g) = Grib2.decodeMessages(bytes)
    assert(g.forecastHours == 6)
    val expected = packed.map(x => (100.0f + x * math.pow(2.0, -1)) / math.pow(10.0, 1))
    g.values.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"$got vs $want")
    }
  }

  test("multi-message file decodes every message") {
    val m1 = encodeMessage(0, 1, 8, 2024, 1, 1, 0, 0, 4, 2, 0.0f, 0, 0, 8, Array.tabulate(8)(_ * 3))
    val m2 = encodeMessage(0, 1, 8, 2024, 1, 1, 0, 1, 4, 2, 0.0f, 0, 0, 8, Array.tabulate(8)(_ * 5))
    val gs = Grib2.decodeMessages(m1 ++ m2)
    assert(gs.map(_.forecastHours) == Seq(0, 1))
    assert(gs(1).values.toSeq == (0 until 8).map(_ * 5.0))
  }

  test("unsupported shapes fail loud") {
    val ok = encodeMessage(0, 1, 8, 2024, 1, 1, 0, 0, 2, 2, 0.0f, 0, 0, 8, Array(1, 2, 3, 4))
    val badEdition = ok.clone(); badEdition(7) = 1
    intercept[IllegalArgumentException](Grib2.decodeMessages(badEdition))
    val truncatedMagic = "JUNK".getBytes("ASCII") ++ ok.drop(4)
    intercept[IllegalArgumentException](Grib2.decodeMessages(truncatedMagic))
  }

  test("Spark binaryFile path: adapter tiles real GRIB2 bytes") {
    val dir = java.nio.file.Files.createTempDirectory("grib2").toString
    val packed = Array.tabulate(8 * 8)(i => i)
    // two hourly messages, valid 2024-03-15 06:00 and 07:00
    val bytes =
      encodeMessage(0, 1, 8, 2024, 3, 15, 6, 0, 8, 8, 0.0f, 0, 0, 16, packed) ++
        encodeMessage(0, 1, 8, 2024, 3, 15, 6, 1, 8, 8, 0.0f, 0, 0, 16, packed.map(_ * 2))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/fixture.grib2"), bytes)

    val cells = GriddedAdapter.Grib2Decoder.decode(spark, dir)
    assert(cells.count() == 128)
    val tiles = GriddedAdapter.fetch(
      spark,
      Map("file" -> dir, "series_id" -> "42", "hrs" -> "6"),
      from = java.sql.Timestamp.valueOf("2024-03-15 00:00:00"),
      to = java.sql.Timestamp.valueOf("2024-03-15 23:00:00"),
      availabilityHorizon = java.sql.Timestamp.valueOf("2024-03-20 00:00:00"),
      tileW = 4,
      tileH = 4,
      decoder = GriddedAdapter.Grib2Decoder
    )
    val collected = tiles.collect()
    // hrs filter keeps only the 06:00 message; 8x8 grid in 4x4 tiles = 4 tiles
    assert(collected.length == 4)
  }
}
