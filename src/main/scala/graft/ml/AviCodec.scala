package graft.ml

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM AVI (RIFF) container codec for UNCOMPRESSED 24-bit RGB
  * video — the real container-parse path for the multimodal video leg
  * (reference: R/insertACImage.R stores station media; video arrives
  * as short uncompressed clips from the same camera pipeline).
  * Compressed codecs (H.264 etc.) remain out of scope: the JDK ships
  * no video decoder, and that boundary is documented rather than
  * faked.
  *
  * Format notes (all little-endian):
  *   - RIFF 'AVI ' → LIST 'hdrl' (avih, LIST 'strl' → strh/strf) →
  *     LIST 'movi' → one '00db' chunk per frame;
  *   - frames are bottom-up rows of BGR triples, each row padded to a
  *     4-byte boundary (BITMAPINFOHEADER, biCompression=BI_RGB);
  *   - odd-sized chunks carry a pad byte (RIFF word alignment).
  *
  * The reader walks the chunk tree generically — it does not assume
  * the writer's layout — and degrades to None on anything malformed,
  * like the other codecs here.
  */
object AviCodec {

  final case class AviVideo(
      width: Int,
      height: Int,
      fps: Int,
      frames: Seq[BufferedImage]
  )

  private def fourcc(s: String): Int =
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)

  /** Encode frames (pixel (x, y) of frame f = `rgb(f, x, y)` packed
    * 0xRRGGBB) as an uncompressed AVI. Deterministic bytes — the
    * fixture generator for the video oracles.
    */
  def encodeAviRgb(
      width: Int,
      height: Int,
      nFrames: Int,
      fps: Int,
      rgb: (Int, Int, Int) => Int
  ): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0)
    val stride = (width * 3 + 3) & ~3
    val frameBytes = stride * height

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1)).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(fourcc(id)).putInt(body.length).put(body)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(fourcc("LIST")).putInt(4 + body.length).putInt(fourcc(kind)).put(body)
      b.array()
    }

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(0, 1000000 / fps) // dwMicroSecPerFrame
    avih.putInt(4, frameBytes * fps) // dwMaxBytesPerSec
    avih.putInt(16, nFrames) // dwTotalFrames
    avih.putInt(24, 1) // dwStreams
    avih.putInt(28, frameBytes) // dwSuggestedBufferSize
    avih.putInt(32, width)
    avih.putInt(36, height)

    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.putInt(0, fourcc("vids"))
    strh.putInt(4, fourcc("DIB "))
    strh.putInt(20, 1) // dwScale
    strh.putInt(24, fps) // dwRate
    strh.putInt(32, nFrames) // dwLength
    strh.putInt(36, frameBytes) // dwSuggestedBufferSize

    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(0, 40) // biSize
    strf.putInt(4, width)
    strf.putInt(8, height)
    strf.putShort(12, 1.toShort) // biPlanes
    strf.putShort(14, 24.toShort) // biBitCount
    strf.putInt(16, 0) // BI_RGB
    strf.putInt(20, frameBytes) // biSizeImage

    val movi = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val px = new Array[Byte](frameBytes)
      var y = 0
      while (y < height) {
        val row = (height - 1 - y) * stride // bottom-up
        var x = 0
        while (x < width) {
          val p = rgb(f, x, y) & 0xffffff
          px(row + x * 3) = (p & 0xff).toByte // B
          px(row + x * 3 + 1) = ((p >>> 8) & 0xff).toByte // G
          px(row + x * 3 + 2) = ((p >>> 16) & 0xff).toByte // R
          x += 1
        }
        y += 1
      }
      movi.write(chunk("00db", px))
      f += 1
    }

    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val moviList = list("movi", movi.toByteArray)
    val body = hdrl ++ moviList
    val out = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(fourcc("RIFF")).putInt(4 + body.length).putInt(fourcc("AVI ")).put(body)
    out.array()
  }

  /** Decode an uncompressed-RGB AVI. None for anything that is not a
    * RIFF/AVI with a 24-bit BI_RGB video stream.
    */
  def decodeAviRgb(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes == null || bytes.length < 24) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    try {
      if (b.getInt(0) != fourcc("RIFF") || b.getInt(8) != fourcc("AVI ")) return None
      var width = 0
      var height = 0
      var fps = 0
      var scale = 1
      var rate = 0
      var ok = true
      val frames = Seq.newBuilder[BufferedImage]

      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (ok && pos + 8 <= end) {
          val id = b.getInt(pos)
          val len = b.getInt(pos + 4)
          if (len < 0 || pos + 8 + len > end) { ok = false; return }
          if (id == fourcc("LIST")) {
            walk(pos + 12, pos + 8 + len)
          } else if (id == fourcc("strh")) {
            // header reads stay inside the chunk's declared length —
            // a truncated strh must degrade to None, not read the
            // next chunk's bytes as dwScale/dwRate
            if (len < 28) { ok = false; return }
            if (b.getInt(pos + 8) == fourcc("vids")) {
              scale = math.max(b.getInt(pos + 8 + 20), 1)
              rate = b.getInt(pos + 8 + 24)
            }
          } else if (id == fourcc("strf")) {
            // BITMAPINFOHEADER is 40 bytes; anything shorter cannot
            // carry the fields read below
            if (len < 40) { ok = false; return }
            width = b.getInt(pos + 8 + 4)
            height = b.getInt(pos + 8 + 8)
            val bitCount = b.getShort(pos + 8 + 14)
            val compression = b.getInt(pos + 8 + 16)
            if (bitCount != 24 || compression != 0) ok = false
          } else if (id == fourcc("00db") || id == fourcc("00dc")) {
            if (width <= 0 || height <= 0) { ok = false; return }
            val stride = (width * 3 + 3) & ~3
            if (len < stride * height) { ok = false; return }
            val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < height) {
              val row = pos + 8 + (height - 1 - y) * stride
              var x = 0
              while (x < width) {
                val bb = bytes(row + x * 3) & 0xff
                val gg = bytes(row + x * 3 + 1) & 0xff
                val rr = bytes(row + x * 3 + 2) & 0xff
                img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
                x += 1
              }
              y += 1
            }
            frames += img
          }
          pos += 8 + len + (len & 1) // RIFF word alignment
        }
      }

      walk(12, math.min(12 + b.getInt(4) - 4, bytes.length))
      fps = if (rate > 0) rate / scale else 0
      val fs = frames.result()
      if (!ok || width <= 0 || height <= 0 || fs.isEmpty) None
      else Some(AviVideo(width, height, fps, fs))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
