package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Real pure-JDK media codecs: lossless round trips (PNG, PCM WAV)
  * are exact; lossy/indexed formats (JPEG, GIF) are decoded and
  * bounded; corrupt payloads surface as NULL-feature rows rather than
  * exceptions or silent drops.
  */
class MediaCodecsSpec extends SparkSpec {

  import spark.implicits._

  private def gradient(id: Long)(x: Int, y: Int): Int = {
    val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
    val g = ((id * 11 + x * 3 + y * 17) % 256).toInt
    val b = ((id * 5 + x * 19 + y * 23) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def expectedSums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    for (x <- 0 until w; y <- 0 until h) {
      val p = gradient(id)(x, y)
      r += (p >>> 16) & 0xff
      g += (p >>> 8) & 0xff
      b += p & 0xff
    }
    (r, g, b)
  }

  test("PNG round trip reproduces exact pixel sums") {
    val bytes = MediaCodecs.encodeImage(16, 12, gradient(42))
    val f = MediaCodecs.decodeImage(bytes).get
    val (r, g, b) = expectedSums(42, 16, 12)
    assert(f.width == 16 && f.height == 12)
    assert((f.sumR, f.sumG, f.sumB) == ((r, g, b)))
  }

  test("BMP round trip is also lossless; JPEG decodes with bounded error") {
    val bmp = MediaCodecs.encodeImage(16, 12, gradient(7), format = "bmp")
    val fb = MediaCodecs.decodeImage(bmp).get
    val (r, g, b) = expectedSums(7, 16, 12)
    assert((fb.sumR, fb.sumG, fb.sumB) == ((r, g, b)))

    val jpg = MediaCodecs.encodeImage(16, 12, gradient(7), format = "jpg")
    val fj = MediaCodecs.decodeImage(jpg).get
    assert(fj.width == 16 && fj.height == 12)
    // lossy: per-channel mean must stay within ~16/255 of the source
    val n = 16 * 12
    assert(math.abs(fj.sumR - r) <= 16L * n)
    assert(math.abs(fj.sumG - g) <= 16L * n)
    assert(math.abs(fj.sumB - b) <= 16L * n)
  }

  test("bilinear resize of a constant-color image is exactly value-preserving") {
    // exhaustive over every channel value an oracle fixture can take
    for (id <- 0L until 256L) {
      val c = (id * 7 % 256).toInt
      val bytes = MediaCodecs.encodeImage(16, 12, (_, _) => (c << 16) | (c << 8) | c)
      val out = MediaCodecs.resizeImage(bytes, 8, 6).get
      val f = MediaCodecs.decodeImage(out).get
      assert(f.width == 8 && f.height == 6)
      assert(f.sumR == 48L * c && f.sumG == 48L * c && f.sumB == 48L * c, s"channel $c")
    }
  }

  test("resize of a gradient keeps dimensions and approximate brightness") {
    val bytes = MediaCodecs.encodeImage(32, 24, gradient(3))
    val f = MediaCodecs.decodeImage(MediaCodecs.resizeImage(bytes, 16, 12).get).get
    assert(f.width == 16 && f.height == 12)
    val (r, _, _) = expectedSums(3, 32, 24)
    val srcMeanR = r.toDouble / (32 * 24)
    val dstMeanR = f.sumR.toDouble / (16 * 12)
    assert(math.abs(srcMeanR - dstMeanR) < 24.0) // interpolation, not garbage
  }

  test("WAV round trip reproduces exact 16-bit PCM samples") {
    val samples = Array.tabulate(256)(i => ((31L * 9 + i * 7) % 4096 - 2048).toShort)
    val bytes = MediaCodecs.encodeWav(samples, 8000f)
    val f = MediaCodecs.decodeWav(bytes).get
    assert(f.sampleRate == 8000)
    assert(f.nSamples == 256L)
    assert(f.sumSamples == samples.map(_.toLong).sum)
    assert(f.peakAbs == samples.map(s => math.abs(s.toInt)).max)
  }

  test("dHash56 matches the bit-by-bit definition on a native 9x7 grayscale grid") {
    def v(x: Int, y: Int): Int = (x * 13 + y * 31) % 256
    val png = MediaCodecs.encodeImage(9, 7, (x, y) => { val g = v(x, y); (g << 16) | (g << 8) | g })
    var expected = 0L
    for (y <- 0 until 7; x <- 0 until 8)
      if (v(x + 1, y) > v(x, y)) expected |= 1L << (y * 8 + x)
    assert(MediaCodecs.dHash56(png).contains(expected))
    assert(expected >= 0L, "56-bit hash stays in the positive Long range")
  }

  test("dHash56 is deterministic and a single-cell perturbation flips at most 2 bits") {
    def enc(pert: Int): Array[Byte] =
      MediaCodecs.encodeImage(
        9,
        7,
        (x, y) => {
          val g = ((x * 13 + y * 31 + (if (x == 4 && y == 3) pert else 0)) % 256)
          (g << 16) | (g << 8) | g
        }
      )
    val a = MediaCodecs.dHash56(enc(0)).get
    val b = MediaCodecs.dHash56(enc(0)).get
    val c = MediaCodecs.dHash56(enc(60)).get
    assert(a == b)
    assert(java.lang.Long.bitCount(a ^ c) <= 2, "one cell touches only its two horizontal comparisons")
  }

  test("dHash56 resizes non-9x7 inputs (perceptual path) and rejects garbage") {
    val big = MediaCodecs.encodeImage(32, 24, (x, y) => ((x * 8) << 16) | ((y * 10) << 8) | 50)
    assert(MediaCodecs.dHash56(big).isDefined)
    assert(MediaCodecs.dHash56(big).get >= 0L)
    assert(MediaCodecs.dHash56(null).isEmpty)
    assert(MediaCodecs.dHash56("junk".getBytes).isEmpty)
  }

  test("audioEnergyHash matches the frame-energy definition and rejects degenerate input") {
    val samples = Array.tabulate(64)(i => ((i * 37) % 4096 - 2048).toShort)
    val bytes = MediaCodecs.encodeWav(samples, 8000f)
    val energies = samples.map(_.toLong).grouped(8).map(_.map(s => s * s).sum).toArray
    var expected = 0L
    for (f <- 0 until energies.length - 1)
      if (energies(f + 1) > energies(f)) expected |= 1L << f
    assert(MediaCodecs.audioEnergyHash(bytes, 8).contains(expected))
    // deterministic; too-short (one frame) and garbage reject
    assert(MediaCodecs.audioEnergyHash(bytes, 8) == MediaCodecs.audioEnergyHash(bytes, 8))
    assert(MediaCodecs.audioEnergyHash(MediaCodecs.encodeWav(samples.take(8), 8000f), 8).isEmpty)
    assert(MediaCodecs.audioEnergyHash(null).isEmpty)
    assert(MediaCodecs.audioEnergyHash("junk".getBytes).isEmpty)
  }

  test("RIFF walk skips unknown chunks (LIST/INFO) and odd-size padding before data") {
    val samples = Array.tabulate(10)(i => (i * 300 - 1500).toShort)
    val plain = MediaCodecs.encodeWav(samples, 8000f)
    val expected = MediaCodecs.decodeWav(plain).get
    // splice a 7-byte LIST chunk (odd size -> 1 pad byte) between
    // "fmt " and "data": real encoders emit INFO metadata here
    val head = plain.take(36) // RIFF..WAVE + fmt chunk
    val tail = plain.drop(36) // data chunk onward
    val listChunk = "LIST".getBytes ++ Array[Byte](7, 0, 0, 0) ++ "INFOxyz".getBytes ++ Array[Byte](0)
    val spliced = head ++ listChunk ++ tail
    // fix the RIFF size field (bytes 4..7, little-endian)
    val total = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((total >> (8 * i)) & 0xff).toByte
    assert(MediaCodecs.decodeWav(spliced).contains(expected))
    assert(
      MediaCodecs.audioEnergyHash(spliced, 2) == MediaCodecs.audioEnergyHash(plain, 2)
    )
  }

  test("crafted RIFF chunk size near 2^31 ends the walk as None, no index overflow") {
    // RIFF/WAVE header followed by one chunk claiming ~2GB of payload
    val b = new Array[Byte](64)
    for ((s, o) <- Seq(("RIFF", 0), ("WAVE", 8), ("junk", 12))) {
      for (i <- 0 until 4) b(o + i) = s(i).toByte
    }
    b(16) = 0xf0.toByte; b(17) = 0xff.toByte; b(18) = 0xff.toByte; b(19) = 0x7f.toByte
    assert(MediaCodecs.decodeWav(b).isEmpty)
    assert(MediaCodecs.audioEnergyHash(b).isEmpty)
  }

  test("corrupt payloads yield None, not exceptions") {
    assert(MediaCodecs.decodeImage("not an image".getBytes).isEmpty)
    assert(MediaCodecs.decodeImage(Array.emptyByteArray).isEmpty)
    assert(MediaCodecs.decodeImage(null).isEmpty, "NULL binary cell degrades, not NPEs")
    assert(MediaCodecs.decodeWav(null).isEmpty)
    assert(MediaCodecs.resizeImage(null, 4, 4).isEmpty)
    assert(MediaCodecs.resizeImage("nope".getBytes, 4, 4).isEmpty)
    assert(MediaCodecs.decodeWav("not audio".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(Array.emptyByteArray).isEmpty)
    // truncated PNG: valid signature, sliced body
    val png = MediaCodecs.encodeImage(16, 12, gradient(1))
    assert(MediaCodecs.decodeImage(png.take(20)).isEmpty)
  }

  test("Multimodal video wrappers keep undecodable rows with NULL features") {
    import spark.implicits._
    val ok = AviCodec.encodeAviRgb(4, 3, 2, 5, (f, x, y) => (f * 40 + x * 20 + y * 10) & 0xffffff)
    val rows = Seq((1L, ok), (2L, "not a video".getBytes)).toDF("doc_id", "media")
    val feats = Multimodal
      .videoFrameFeatures(rows, "doc_id", "media")
      .orderBy(col("doc_id"), col("frame_no"))
      .collect()
    assert(feats.length == 3, "2 frames for doc 1 + 1 NULL row for doc 2")
    assert(feats.count(_.isNullAt(1)) == 1)
    val hashes = Multimodal
      .videoFrameDHashes(rows, "doc_id", "media", stride = 1)
      .collect()
    assert(hashes.length == 3)
    assert(hashes.count(_.isNullAt(2)) == 1)
  }

  test("Multimodal.imageFeatures keeps undecodable rows with NULL features") {
    val ok = MediaCodecs.encodeImage(4, 4, (_, _) => 0x804020)
    val df = Seq((1L, ok), (2L, "garbage".getBytes)).toDF("doc_id", "media")
    val rows = Multimodal
      .imageFeatures(df, "doc_id", "media")
      .orderBy("doc_id")
      .collect()
    assert(rows.length == 2)
    assert(rows(0) == Row(1L, 4, 4, 16L * 0x80, 16L * 0x40, 16L * 0x20))
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) && rows(1).isNullAt(3))
  }

  test("Multimodal.audioFeatures keeps undecodable rows with NULL features") {
    val ok = MediaCodecs.encodeWav(Array.tabulate(8)(i => (i * 100).toShort), 16000f)
    val df = Seq((1L, ok), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val rows = Multimodal
      .audioFeatures(df, "doc_id", "media")
      .orderBy("doc_id")
      .collect()
    assert(rows(0) == Row(1L, 16000, 8L, (0 until 8).map(_ * 100L).sum, 700))
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1))
  }

  test("property: PNG and WAV round trips are lossless for arbitrary content") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val imgGen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      seed <- Gen.choose(0L, Long.MaxValue - 1)
    } yield (w, h, seed)
    val pImg = Prop.forAll(imgGen) { case (w, h, seed) =>
      // deterministic per-seed pixels via a splitmix-style mix
      def px(x: Int, y: Int): Int = {
        var z = seed + 0x9e3779b97f4a7c15L * (x * 40L + y + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z ^ (z >>> 27)).toInt & 0xffffff
      }
      var r = 0L; var g = 0L; var b = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val p = px(x, y)
        r += (p >>> 16) & 0xff; g += (p >>> 8) & 0xff; b += p & 0xff
      }
      val f = MediaCodecs.decodeImage(MediaCodecs.encodeImage(w, h, px)).get
      f.width == w && f.height == h && f.sumR == r && f.sumG == g && f.sumB == b
    }
    val wavGen = for {
      n <- Gen.choose(1, 2000)
      seed <- Gen.choose(0L, Long.MaxValue - 1)
    } yield (n, seed)
    val pWav = Prop.forAll(wavGen) { case (n, seed) =>
      val samples = Array.tabulate(n)(i => ((seed + i * 31L) % 65536 - 32768).toShort)
      val f = MediaCodecs.decodeWav(MediaCodecs.encodeWav(samples, 8000f)).get
      f.nSamples == n.toLong &&
      f.sumSamples == samples.map(_.toLong).sum &&
      f.peakAbs == samples.map(s => math.abs(s.toInt)).max
    }
    for (p <- Seq(pImg, pWav)) {
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
      assert(res.passed, res.status.toString)
    }
  }

  test("stereo WAV decodes: frames sum across channels") {
    // hand-build interleaved stereo PCM through the AudioSystem writer
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val left = Array[Short](100, 200, 300)
    val right = Array[Short](-50, -100, -150)
    val pcm = new Array[Byte](12)
    for (i <- 0 until 3) {
      pcm(4 * i) = (left(i) & 0xff).toByte
      pcm(4 * i + 1) = ((left(i) >> 8) & 0xff).toByte
      pcm(4 * i + 2) = (right(i) & 0xff).toByte
      pcm(4 * i + 3) = ((right(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 3)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val f = MediaCodecs.decodeWav(bos.toByteArray).get
    assert(f.nSamples == 6L)
    assert(f.sumSamples == (left ++ right).map(_.toLong).sum)
    assert(f.peakAbs == 300)
  }
}
