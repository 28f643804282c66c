package graft.ml

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real media codecs on the pure-JDK `javax.imageio` /
  * `javax.sound.sampled` stacks (java.desktop module — no external
  * libraries): PNG/JPEG/BMP/GIF image decode, headless bilinear
  * resize, and 16-bit PCM WAV decode. These replace the byte-level
  * stub decoder for the image and audio legs of the multimodal
  * pipeline (reference: R/insertACImage.R stores and serves the same
  * payloads via magick); video is handled by [[AviCodec]] for
  * uncompressed RIFF/AVI — compressed video codecs (H.264 etc.) stay
  * out of scope, since the JDK ships no decoder for them.
  *
  * Everything here is driver/executor-local scalar code invoked from
  * `mapPartitions` (see [[Multimodal]]): payloads are decoded where
  * they are read and only fixed-width feature projections move on, so
  * none of this shuffles binary data at 100 TB.
  *
  * All entry points are total: undecodable bytes yield `None`, never
  * an exception, so a corrupt blob cannot kill a 1000-executor stage.
  */
object MediaCodecs {

  // ImageIO defaults to spilling through temp files; decode fully
  // in-memory (payloads arrive as byte arrays anyway) and never touch
  // the display pipeline.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  /** Per-image decoded features: dimensions plus exact per-channel
    * pixel sums (sRGB). Sums rather than means so integer arithmetic
    * stays exact end-to-end (oracle-hashable).
    */
  final case class ImageFeatures(
      width: Int,
      height: Int,
      sumR: Long,
      sumG: Long,
      sumB: Long
  )

  /** Decode any ImageIO-supported format (PNG/JPEG/BMP/GIF/WBMP).
    * Returns None for unrecognized or truncated payloads.
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageFeatures] =
    readImage(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      var r = 0L; var g = 0L; var b = 0L
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          r += (p >>> 16) & 0xff
          g += (p >>> 8) & 0xff
          b += p & 0xff
          x += 1
        }
        y += 1
      }
      ImageFeatures(w, h, r, g, b)
    }

  /** Decode + bilinear resize to (w, h), re-encoded as PNG. Headless
    * Graphics2D — no display needed.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0)
    readImage(bytes).map { src =>
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      try {
        g2.setRenderingHint(
          RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR
        )
        g2.drawImage(src, 0, 0, w, h, null)
      } finally g2.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Encode a procedural RGB image (pixel (x, y) = `rgb(x, y)` packed
    * 0xRRGGBB) in any ImageIO-writable format. PNG is lossless, so an
    * encode/decode round trip through [[decodeImage]] reproduces the
    * exact pixel sums — the fixture generator for the codec oracles.
    */
  def encodeImage(width: Int, height: Int, rgb: (Int, Int) => Int, format: String = "png"): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rgb(x, y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Difference-hash (dHash) perceptual fingerprint: decode, reduce to
    * a 9x7 luminance grid, emit one bit per horizontal neighbor pair
    * (bit i = y*8+x set iff gray(x+1,y) > gray(x,y)) — 56 bits, kept
    * inside the positive `Long` range so the hash survives the same
    * signed-BIGINT round trips as the other portable 56-bit hashes.
    *
    * Luminance is the integer ITU-R 601 mix `(299r + 587g + 114b) /
    * 1000` (truncating division) — exact integer arithmetic, so for a
    * losslessly-coded grayscale image the whole hash is a closed-form
    * function of the pixel values (oracle-computable). Images already
    * 9x7 are hashed on their native grid; anything else is bilinearly
    * reduced first (that path is perceptual, not closed-form).
    */
  def dHash56(bytes: Array[Byte]): Option[Long] =
    readImage(bytes).map(dHash56OfImage)

  /** [[dHash56]] on an already-decoded frame (e.g. a video frame from
    * [[AviCodec]]) — same grid, luminance and bit layout.
    */
  def dHash56OfImage(img0: BufferedImage): Long = {
    val img =
      if (img0.getWidth == 9 && img0.getHeight == 7) img0
      else {
        val dst = new BufferedImage(9, 7, BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        try {
          g2.setRenderingHint(
            RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR
          )
          g2.drawImage(img0, 0, 0, 9, 7, null)
        } finally g2.dispose()
        dst
      }
    def gray(x: Int, y: Int): Int = {
      val p = img.getRGB(x, y)
      (299 * ((p >>> 16) & 0xff) + 587 * ((p >>> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }
    var h = 0L
    var y = 0
    while (y < 7) {
      var x = 0
      while (x < 8) {
        if (gray(x + 1, y) > gray(x, y)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  // NonFatal, not just IOException: individual ImageIO plugin readers
  // throw unchecked exceptions on some malformed payloads, and a null
  // binary cell must degrade like any other undecodable payload
  private def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** Per-clip decoded features: format metadata plus exact integer
    * sample aggregates (16-bit PCM values in [-32768, 32767]).
    */
  final case class WavFeatures(
      sampleRate: Int,
      nSamples: Long,
      sumSamples: Long,
      peakAbs: Int
  )

  /** Pure RIFF/WAVE chunk walk for 16-bit signed PCM — the executor
    * hot path deliberately avoids `AudioSystem.getAudioInputStream`:
    * its provider lookup synchronizes on a global registry, which
    * serializes per-row decode across executor threads (measured ~20x
    * per-row inflation at 10+ concurrent tasks in the sf1 rehearsal).
    * WAV PCM payloads are always little-endian, so no endianness
    * dispatch is needed. Returns (sampleRate, dataOffset, dataLength)
    * into the original array — zero copies.
    */
  private def parseWavPcm16(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 44) return None
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def tag(i: Int, s: String): Boolean =
      bytes(i) == s(0).toByte && bytes(i + 1) == s(1).toByte &&
        bytes(i + 2) == s(2).toByte && bytes(i + 3) == s(3).toByte
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var rate = -1
    var pcm16 = false
    var fmtSeen = false
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && pos >= 0) {
      val sz = u32(pos + 4)
      // standard RIFF semantics: the FIRST fmt/data chunk wins (files
      // with duplicate chunks must parse like mainstream readers), and
      // a fmt chunk must declare >= 16 bytes before its fields are read
      if (tag(pos, "fmt ") && !fmtSeen && sz >= 16 && pos + 8 + 16 <= bytes.length) {
        fmtSeen = true
        pcm16 = u16(pos + 8) == 1 && u16(pos + 8 + 14) == 16
        rate = u32(pos + 8 + 4).toInt
      } else if (tag(pos, "data") && dataOff < 0) {
        dataOff = pos + 8
        dataLen = math.min(sz, (bytes.length - dataOff).toLong).toInt
      }
      // advance in Long: a crafted chunk size near 2^31 must end the
      // walk (truncated container), not overflow pos into a negative
      // index
      val next = pos.toLong + 8L + sz + (sz & 1L)
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    if (pcm16 && rate > 0 && dataOff >= 0) Some((rate, dataOff, dataLen)) else None
  }

  /** Decode a RIFF/WAVE payload (16-bit signed PCM, any channel
    * count — frames are summed across channels sample-by-sample).
    * Returns None for non-WAV bytes or unsupported sample widths.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavFeatures] =
    parseWavPcm16(bytes).map { case (rate, off, len) =>
      val end = off + len
      var i = off
      var n = 0L; var sum = 0L; var peak = 0
      while (i + 1 < end) {
        val s = (((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)).toShort.toInt
        n += 1
        sum += s
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 2
      }
      WavFeatures(rate, n, sum, peak)
    }

  /** Audio energy fingerprint (the WAV analog of [[dHash56]]): decode,
    * split the sample stream into `frameLen`-sample frames, and emit
    * one bit per adjacent frame pair (bit f set iff energy(f+1) >
    * energy(f), energy = exact integer sum of squared samples). A
    * clip with n frames yields n-1 bits, capped at 62 so the hash
    * stays a positive Long. Returns None for undecodable payloads or
    * clips shorter than two frames.
    */
  def audioEnergyHash(bytes: Array[Byte], frameLen: Int = 8): Option[Long] = {
    require(frameLen > 0)
    parseWavPcm16(bytes).flatMap { case (_, off, len) =>
      val nSamples = len / 2
      val nFrames = nSamples / frameLen
      if (nFrames < 2) None
      else {
        val energies = new Array[Long](nFrames)
        var i = 0
        while (i < nFrames * frameLen) {
          val s =
            (((bytes(off + 2 * i + 1) & 0xff) << 8) | (bytes(off + 2 * i) & 0xff)).toShort.toLong
          energies(i / frameLen) += s * s
          i += 1
        }
        var h = 0L
        var f = 0
        val nBits = math.min(nFrames - 1, 62)
        while (f < nBits) {
          if (energies(f + 1) > energies(f)) h |= 1L << f
          f += 1
        }
        Some(h)
      }
    }
  }

  /** Encode mono 16-bit PCM samples as a WAV container — the fixture
    * generator for the audio oracle (WAV PCM is lossless, so decode
    * reproduces the exact samples).
    */
  def encodeWav(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    // hand-rolled canonical 44-byte RIFF header + LE PCM; the
    // AudioSystem.write path does a synchronized provider lookup per
    // call, which serializes per-row fixture generation on executors
    // exactly like the decode side did
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def tag(i: Int, s: String): Unit = { var j = 0; while (j < 4) { out(i + j) = s(j).toByte; j += 1 } }
    def u32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def u16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    val rate = sampleRate.round
    tag(0, "RIFF"); u32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); u32(16, 16L)
    u16(20, 1) // PCM
    u16(22, 1) // mono
    u32(24, rate.toLong)
    u32(28, rate.toLong * 2) // byte rate
    u16(32, 2) // block align
    u16(34, 16) // bits per sample
    tag(36, "data"); u32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
