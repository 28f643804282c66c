package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * Image (PNG/JPEG/BMP/GIF) and audio (16-bit PCM WAV) decode is REAL
  * — pure-JDK codecs via [[MediaCodecs]] (`javax.imageio` /
  * `javax.sound.sampled`): see [[imageFeatures]], [[audioFeatures]],
  * [[resizeImages]]. Only VIDEO decode remains stubbed behind the
  * `MediaDecoder` trait (no container/codec support ships with the
  * JDK); `DeterministicStubDecoder` computes real byte-level features
  * (length, first byte, md5-derived checksum) so the video plumbing
  * (schema, batching, partitioning, feature schema) stays real and
  * oracle-testable.
  *
  * Scale: `mapPartitions` keeps decode batched and partition-local
  * (the PySpark equivalent is `mapInPandas` with an Arrow batch per
  * call); binary payloads never shuffle — features are extracted at
  * scan time and only the (id, features) projection moves on.
  * Undecodable payloads surface as NULL-feature rows, never silent
  * drops and never stage-killing exceptions.
  */
object Multimodal {

  /** Decoded feature payload for one media blob. */
  final case class MediaFeatures(
      nBytes: Long,
      headByte: Int,
      checksum: Long // md5-derived; stand-in for a real content hash
  )

  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaFeatures
  }

  /** Real byte-level features; the decode step a production build
    * would replace with actual image/audio decoding.
    */
  object DeterministicStubDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val checksum = java.lang.Long.parseLong(hex.take(14), 16)
      MediaFeatures(
        nBytes = bytes.length.toLong,
        headByte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
        checksum = checksum
      )
    }
  }

  /** Video-style frame sampling: the binary payload is treated as a
    * container of fixed-size frames; every `everyNth` frame is
    * emitted as its own row (id, frame_no, frame BINARY). The byte
    * slicing is real — a production decoder replaces "fixed-size
    * slice" with codec-aware frame extraction, keeping this exact
    * row shape. The trailing partial frame is kept.
    */
  def frameSample(
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameBytes: Int,
      everyNth: Int = 1
  ): DataFrame = {
    require(frameBytes > 0 && everyNth > 0)
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("frame_no", IntegerType, nullable = false),
        StructField("frame", BinaryType, nullable = false)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        // a NULL payload has no frames — skip the row (the real codecs
        // return None here; the stub paths must not NPE on it either)
        val nFrames = if (bytes == null) 0 else (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator
          .filter(_ % everyNth == 0)
          .map { i =>
            val from = i * frameBytes
            val until = math.min(from + frameBytes, bytes.length)
            Row(r.getLong(0), i, java.util.Arrays.copyOfRange(bytes, from, until))
          }
      }
    }(Encoders.row(schema))
  }

  /** Resize stub: normalize every payload to exactly `targetBytes`
    * (truncate or zero-pad) — the deterministic stand-in for an image
    * resize, with the real production shape: fixed-size binary out,
    * batched partition-local processing, no shuffle of payloads.
    */
  def resizeStub(
      df: DataFrame,
      idCol: String,
      binCol: String,
      targetBytes: Int
  ): DataFrame = {
    require(targetBytes > 0)
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("media", BinaryType, nullable = false)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      // NULL payloads are dropped: there is nothing to resize, and the
      // output contract is non-nullable fixed-size media
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) None
        else Some(Row(r.getLong(0), java.util.Arrays.copyOf(bytes, targetBytes)))
      }
    }(Encoders.row(schema))
  }

  /** REAL image decode over a binary column (PNG/JPEG/BMP/GIF via
    * `javax.imageio`): output (idCol, width, height, sum_r, sum_g,
    * sum_b) with exact per-channel pixel sums. Undecodable payloads
    * keep their row with NULL features.
    */
  def imageFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("width", IntegerType, nullable = true),
        StructField("height", IntegerType, nullable = true),
        StructField("sum_r", LongType, nullable = true),
        StructField("sum_g", LongType, nullable = true),
        StructField("sum_b", LongType, nullable = true)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.decodeImage(r.getAs[Array[Byte]](1)) match {
          case Some(f) => Row(r.getLong(0), f.width, f.height, f.sumR, f.sumG, f.sumB)
          case None    => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(Encoders.row(schema))
  }

  /** REAL audio decode over a binary column (16-bit PCM WAV via
    * `javax.sound.sampled`): output (idCol, sample_rate, n_samples,
    * sum_samples, peak_abs) with exact integer sample aggregates.
    * Undecodable payloads keep their row with NULL features.
    */
  def audioFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = true),
        StructField("n_samples", LongType, nullable = true),
        StructField("sum_samples", LongType, nullable = true),
        StructField("peak_abs", IntegerType, nullable = true)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.decodeWav(r.getAs[Array[Byte]](1)) match {
          case Some(f) => Row(r.getLong(0), f.sampleRate, f.nSamples, f.sumSamples, f.peakAbs)
          case None    => Row(r.getLong(0), null, null, null, null)
        }
      }
    }(Encoders.row(schema))
  }

  /** REAL image resize (decode -> headless bilinear scale -> PNG
    * re-encode) to fixed (w, h) — the production form of
    * [[resizeStub]]. Undecodable payloads keep their row with a NULL
    * media column.
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String, w: Int, h: Int): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("media", BinaryType, nullable = true)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.map { r =>
        Row(r.getLong(0), MediaCodecs.resizeImage(r.getAs[Array[Byte]](1), w, h).orNull)
      }
    }(Encoders.row(schema))
  }

  /** Extract features from a binary column in partition-local batches.
    * Output: idCol + n_bytes + head_byte + checksum.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      decoder: MediaDecoder = DeterministicStubDecoder
  ): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false),
        StructField("head_byte", IntegerType, nullable = false),
        StructField("checksum", LongType, nullable = false)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      // NULL payloads are dropped: the feature row is non-nullable and
      // a missing payload has no decodable content
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) None
        else {
          val f = decoder.decode(bytes)
          Some(Row(r.getLong(0), f.nBytes, f.headByte, f.checksum))
        }
      }
    }(Encoders.row(schema))
  }

  /** Perceptual difference-hash over a binary image column
    * ([[MediaCodecs.dHash56]]): output (idCol, dhash), 56-bit positive
    * Long, NULL for undecodable payloads. Scan-local projection —
    * binary never shuffles; only the 8-byte hash moves downstream,
    * which is what makes Hamming near-dup joins feasible at 100 TB.
    */
  def imageDHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("dhash", LongType, nullable = true)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.dHash56(r.getAs[Array[Byte]](1)) match {
          case Some(h) => Row(r.getLong(0), h)
          case None    => Row(r.getLong(0), null)
        }
      }
    }(Encoders.row(schema))
  }

  /** REAL video decode over a binary AVI column ([[AviCodec]]): one
    * output row per frame with exact per-channel pixel sums.
    * Undecodable payloads keep ONE row with NULL features (parallel
    * to the image/audio wrappers). Scan-local: the container is
    * parsed where it is read; only fixed-width per-frame projections
    * move on.
    */
  def videoFrameFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("frame_no", IntegerType, nullable = true),
        StructField("width", IntegerType, nullable = true),
        StructField("height", IntegerType, nullable = true),
        StructField("sum_r", LongType, nullable = true),
        StructField("sum_g", LongType, nullable = true),
        StructField("sum_b", LongType, nullable = true)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.flatMap { r =>
        AviCodec.decodeAviRgb(r.getAs[Array[Byte]](1)) match {
          case Some(v) =>
            v.frames.iterator.zipWithIndex.map { case (img, f) =>
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < v.height) {
                var x = 0
                while (x < v.width) {
                  val p = img.getRGB(x, y)
                  sr += (p >>> 16) & 0xff
                  sg += (p >>> 8) & 0xff
                  sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              Row(r.getLong(0), f, v.width, v.height, sr, sg, sb)
            }
          case None => Iterator.single(Row(r.getLong(0), null, null, null, null, null, null))
        }
      }
    }(Encoders.row(schema))
  }

  /** Perceptual dHashes of every `stride`-th decoded video frame —
    * the frame-sampling fingerprint pass video near-dup runs on
    * (hash a handful of frames, not every pixel of every frame).
    */
  def videoFrameDHashes(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int
  ): DataFrame = {
    require(stride > 0)
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("frame_no", IntegerType, nullable = true),
        StructField("dhash", LongType, nullable = true)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.flatMap { r =>
        AviCodec.decodeAviRgb(r.getAs[Array[Byte]](1)) match {
          case Some(v) =>
            v.frames.iterator.zipWithIndex
              .filter { case (_, f) => f % stride == 0 }
              .map { case (img, f) => Row(r.getLong(0), f, MediaCodecs.dHash56OfImage(img)) }
          case None => Iterator.single(Row(r.getLong(0), null, null))
        }
      }
    }(Encoders.row(schema))
  }

  /** Audio energy fingerprints over a binary WAV column
    * ([[MediaCodecs.audioEnergyHash]]): output (idCol, ahash), NULL
    * for undecodable/too-short clips. Same scan-local shape as
    * [[imageDHashes]] — only the 8-byte fingerprint moves downstream.
    */
  def audioEnergyHashes(
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameLen: Int = 8
  ): DataFrame = {
    val schema = StructType(
      Seq(
        StructField(idCol, LongType, nullable = false),
        StructField("ahash", LongType, nullable = true)
      )
    )
    val prepared = df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
    prepared.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.audioEnergyHash(r.getAs[Array[Byte]](1), frameLen) match {
          case Some(h) => Row(r.getLong(0), h)
          case None    => Row(r.getLong(0), null)
        }
      }
    }(Encoders.row(schema))
  }
}
