package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM AVI container codec: exact round trips through the
  * real RIFF parse (bottom-up BGR rows, stride padding, word-aligned
  * chunks), plus total degradation on malformed input.
  */
class AviCodecSpec extends AnyFunSuite {

  private def px(f: Int, x: Int, y: Int): Int = {
    val rr = (f * 11 + x * 13 + y * 31) % 256
    val gg = (f * 19 + x * 3 + y * 17) % 256
    val bb = (f * 7 + x * 19 + y * 23) % 256
    (rr << 16) | (gg << 8) | bb
  }

  test("round trip reproduces every pixel of every frame (9x7: padded 28-byte stride)") {
    val bytes = AviCodec.encodeAviRgb(9, 7, 4, 5, px)
    val v = AviCodec.decodeAviRgb(bytes).get
    assert(v.width == 9 && v.height == 7 && v.fps == 5)
    assert(v.frames.size == 4)
    for (f <- 0 until 4; y <- 0 until 7; x <- 0 until 9)
      assert(
        (v.frames(f).getRGB(x, y) & 0xffffff) == px(f, x, y),
        s"pixel mismatch at f=$f x=$x y=$y"
      )
  }

  test("round trip with an unpadded stride (4-wide: 12 bytes, already aligned)") {
    val bytes = AviCodec.encodeAviRgb(4, 3, 2, 10, px)
    val v = AviCodec.decodeAviRgb(bytes).get
    assert(v.width == 4 && v.height == 3 && v.frames.size == 2 && v.fps == 10)
    for (f <- 0 until 2; y <- 0 until 3; x <- 0 until 4)
      assert((v.frames(f).getRGB(x, y) & 0xffffff) == px(f, x, y))
  }

  test("malformed input degrades to None, never throws") {
    assert(AviCodec.decodeAviRgb(null).isEmpty)
    assert(AviCodec.decodeAviRgb(Array.emptyByteArray).isEmpty)
    assert(AviCodec.decodeAviRgb("RIFFnope".getBytes).isEmpty)
    // PNG bytes are a valid media payload but not an AVI
    assert(AviCodec.decodeAviRgb(MediaCodecs.encodeImage(4, 4, (_, _) => 0)).isEmpty)
    // truncated mid-movi: header parses, frame chunk length overruns
    val ok = AviCodec.encodeAviRgb(4, 3, 2, 10, px)
    assert(AviCodec.decodeAviRgb(ok.take(ok.length - 10)).isEmpty)
  }

  test("video frame dHash agrees with the still-image dHash of the same content") {
    val gray: (Int, Int, Int) => Int = (f, x, y) => {
      val v = (x * 13 + y * 31 + f * 29) % 256
      (v << 16) | (v << 8) | v
    }
    val v = AviCodec.decodeAviRgb(AviCodec.encodeAviRgb(9, 7, 2, 5, gray)).get
    val still = MediaCodecs
      .dHash56(MediaCodecs.encodeImage(9, 7, (x, y) => gray(1, x, y)))
      .get
    assert(MediaCodecs.dHash56OfImage(v.frames(1)) == still)
  }
}
