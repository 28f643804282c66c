package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The actual media decode (JPEG/wav/frame-sample) is STUBBED — the
  * decode libraries are not in this container — behind the
  * `MediaDecoder` trait; `DeterministicStubDecoder` computes real
  * byte-level features (length, first byte, md5-derived checksum) so
  * the Spark-side plumbing (schema, batching, partitioning, feature
  * schema) is fully real and oracle-testable.
  *
  * Scale: `mapPartitions` keeps decode batched and partition-local
  * (the PySpark equivalent is `mapInPandas` with an Arrow batch per
  * call); binary payloads never shuffle — features are extracted at
  * scan time and only the (id, features) projection moves on.
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
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
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
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), java.util.Arrays.copyOf(bytes, targetBytes))
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
      it.map { r =>
        val f = decoder.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), f.nBytes, f.headByte, f.checksum)
      }
    }(Encoders.row(schema))
  }
}
