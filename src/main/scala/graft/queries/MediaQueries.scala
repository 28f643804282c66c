package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ml.{MediaCodecs, Multimodal}
import graft.tables.TestTables

/** Real-codec media queries: each one synthesizes a procedural
  * image/audio payload per document, round-trips it through the REAL
  * pure-JDK codec ([[graft.ml.MediaCodecs]] — `javax.imageio` /
  * `javax.sound.sampled`), and emits exact integer pixel/sample
  * aggregates of the DECODED output. Because the fixture content is a
  * closed-form integer function of `doc_id` and the codecs are
  * lossless (PNG, PCM WAV), DuckDB can compute the expected
  * aggregates arithmetically — a full hash check of a real
  * encode->decode cycle with no codec on the oracle side.
  *
  * Reference anchor: R/insertACImage.R:1-120 decodes/normalizes
  * station images with magick before storing; these queries prove the
  * Spark-side equivalent (decode + resize + feature extraction at
  * scan time, partition-local, binary never shuffled).
  */
object MediaQueries {

  private val ImgW = 16
  private val ImgH = 12
  private val OutW = 8
  private val OutH = 6
  private val NSamples = 256
  private val SampleRate = 8000f

  private val mediaSchema = StructType(
    Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false)
    )
  )

  /** One 16x12 PNG per doc: pixel (x, y) channels are small-prime
    * linear mixes of (doc_id, x, y) mod 256 — a gradient, so decode
    * sums exercise every pixel position distinctly.
    */
  private def gradientImages(s: SparkSession, d: String): DataFrame = {
    val ids = TestTables.documents(s, d).select(col("doc_id").cast(LongType))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val png = MediaCodecs.encodeImage(
          ImgW,
          ImgH,
          (x, y) => {
            val rr = ((id * 7 + x * 13 + y * 31) % 256).toInt
            val gg = ((id * 11 + x * 3 + y * 17) % 256).toInt
            val bb = ((id * 5 + x * 19 + y * 23) % 256).toInt
            (rr << 16) | (gg << 8) | bb
          }
        )
        Row(id, png)
      }
    }(Encoders.row(mediaSchema))
  }

  /** One constant-color 16x12 PNG per doc — bilinear interpolation of
    * equal values is exact, so the resized image's sums stay in
    * closed form (verified exhaustively in MediaCodecsSpec).
    */
  private def flatImages(s: SparkSession, d: String): DataFrame = {
    val ids = TestTables.documents(s, d).select(col("doc_id").cast(LongType))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val rr = ((id * 7) % 256).toInt
        val gg = ((id * 11) % 256).toInt
        val bb = ((id * 5) % 256).toInt
        Row(id, MediaCodecs.encodeImage(ImgW, ImgH, (_, _) => (rr << 16) | (gg << 8) | bb))
      }
    }(Encoders.row(mediaSchema))
  }

  /** One 256-sample mono WAV per doc: sample i is a sawtooth
    * `(doc_id*31 + i*7) % 4096 - 2048` — integer-valued 16-bit PCM,
    * losslessly recoverable.
    */
  private def sawtoothWavs(s: SparkSession, d: String): DataFrame = {
    val ids = TestTables.documents(s, d).select(col("doc_id").cast(LongType))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(NSamples)(i => ((id * 31 + i * 7) % 4096 - 2048).toShort)
        Row(id, MediaCodecs.encodeWav(samples, SampleRate))
      }
    }(Encoders.row(mediaSchema))
  }

  /** PNG encode -> ImageIO decode -> exact per-channel pixel sums. */
  private def imageDecode(s: SparkSession, d: String): DataFrame =
    Multimodal
      .imageFeatures(gradientImages(s, d), "doc_id", "media")
      .orderBy(col("doc_id"))

  private val imageDecodeSql =
    s"""WITH px AS (
       |  SELECT doc_id, x, y
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(0, $ImgW)) AS x),
       |       LATERAL (SELECT unnest(range(0, $ImgH)) AS y)
       |)
       |SELECT doc_id,
       |       CAST($ImgW AS INT) AS width,
       |       CAST($ImgH AS INT) AS height,
       |       CAST(SUM((doc_id * 7 + x * 13 + y * 31) % 256) AS BIGINT) AS sum_r,
       |       CAST(SUM((doc_id * 11 + x * 3 + y * 17) % 256) AS BIGINT) AS sum_g,
       |       CAST(SUM((doc_id * 5 + x * 19 + y * 23) % 256) AS BIGINT) AS sum_b
       |FROM px
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** PNG encode -> decode -> REAL bilinear resize (16x12 -> 8x6) ->
    * PNG re-encode -> decode: two full codec cycles plus Java2D
    * scaling, with closed-form expected sums (constant-color input).
    */
  private def imageResize(s: SparkSession, d: String): DataFrame = {
    val resized = Multimodal.resizeImages(flatImages(s, d), "doc_id", "media", OutW, OutH)
    Multimodal
      .imageFeatures(resized, "doc_id", "media")
      .orderBy(col("doc_id"))
  }

  private val imageResizeSql =
    s"""SELECT doc_id,
       |       CAST($OutW AS INT) AS width,
       |       CAST($OutH AS INT) AS height,
       |       CAST(${OutW * OutH} * ((doc_id * 7) % 256) AS BIGINT) AS sum_r,
       |       CAST(${OutW * OutH} * ((doc_id * 11) % 256) AS BIGINT) AS sum_g,
       |       CAST(${OutW * OutH} * ((doc_id * 5) % 256) AS BIGINT) AS sum_b
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---- perceptual hash (dHash) + Hamming near-dup ------------------

  private val DhW = 9
  private val DhH = 7

  /** One 9x7 GRAYSCALE PNG per doc, pixel value a closed-form integer
    * mix of (doc_id % 97, x, y): docs sharing `doc_id % 97` render the
    * same pattern, except odd docs perturb one cell (+60 at (4,3)) —
    * so each pattern group yields exact-dup AND small-Hamming pairs.
    * Grayscale (r=g=b=v) makes the ITU-601 luminance reduce to v
    * exactly, keeping the whole dHash closed-form for the oracle.
    */
  private def dhashImages(s: SparkSession, d: String): DataFrame = {
    val ids = TestTables.documents(s, d).select(col("doc_id").cast(LongType))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val png = MediaCodecs.encodeImage(
          DhW,
          DhH,
          (x, y) => {
            val g = id % 97
            // the x*y*(g+3) cross term makes the comparison STRUCTURE
            // differ across groups (a constant brightness shift alone
            // barely changes neighbor comparisons, which would leave
            // every doc Hamming-close to every other — degenerate LSH
            // buckets); odd docs perturb one cell for small-Hamming pairs
            val pert = if (x == 4 && y == 3 && id % 2 == 1) 60 else 0
            val v = ((g * 37 + x * 13 + y * 31 + (x * y * (g + 3)) % 97 + pert) % 256).toInt
            (v << 16) | (v << 8) | v
          }
        )
        Row(id, png)
      }
    }(Encoders.row(mediaSchema))
  }

  /** The fixture pixel value as DuckDB SQL (mirrors dhashImages). */
  private def vSql(xe: String, ye: String): String =
    s"((doc_id % 97) * 37 + ($xe) * 13 + ($ye) * 31 + (($xe) * ($ye) * (doc_id % 97 + 3)) % 97 + " +
      s"CASE WHEN ($xe) = 4 AND ($ye) = 3 AND doc_id % 2 = 1 THEN 60 ELSE 0 END) % 256"

  private val dhashCte =
    s"""b AS (
       |  SELECT doc_id, y * 8 + x AS i,
       |         CASE WHEN ${vSql("x + 1", "y")} > ${vSql("x", "y")} THEN 1 ELSE 0 END AS bit
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(0, ${DhW - 1})) AS x),
       |       LATERAL (SELECT unnest(range(0, $DhH)) AS y)
       |), h AS (
       |  SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
       |  FROM b GROUP BY doc_id
       |)""".stripMargin

  /** PNG encode -> REAL decode -> 56-bit perceptual dHash; the oracle
    * computes the same bits arithmetically from the closed-form pixel
    * function (no codec on the oracle side — lossless PNG + grayscale
    * luminance identity make decode exact).
    */
  private def imagePhash(s: SparkSession, d: String): DataFrame =
    Multimodal
      .imageDHashes(dhashImages(s, d), "doc_id", "media")
      .orderBy(col("doc_id"))

  private val imagePhashSql =
    s"""WITH $dhashCte
       |SELECT doc_id, dhash FROM h ORDER BY doc_id""".stripMargin

  /** Near-duplicate image pairs at Hamming <= 4 over the dHashes,
    * found via 5-band (11/11/11/11/12-bit) LSH banding (pigeonhole:
    * <= 4 flipped bits leave >= 1 of 5 bands intact, so recall at
    * threshold 4 is complete and the banded result EQUALS the
    * oracle's exhaustive self-join). Only the 8-byte hash ever
    * shuffles; candidate pairs are bounded to band-bucket collisions
    * — the 100 TB path, vs the oracle's O(n^2) scan which exists only
    * as the small-SF ground truth.
    */
  private def imageNearDup(s: SparkSession, d: String): DataFrame = {
    val h = Multimodal
      .imageDHashes(dhashImages(s, d), "doc_id", "media")
      .filter(col("dhash").isNotNull)
      // both sides of the band self-join read this projection; without
      // a materialization the PNG decode + resize + hash (the dominant
      // cost) runs once per side
      .localCheckpoint(false)
    // 5 bands of 12/11/11/11/11 bits (Dedup.bandSpec): pigeonhole
    // still guarantees a shared band at the query's Hamming <= 4
    // threshold (4 flipped bits can't touch all 5 bands), but each
    // band keys into 2^11+ buckets instead of 2^8 — candidate pairs
    // drop ~8x. With a FIXED band space, candidates grow ~n^2/buckets:
    // the 7x8-bit layout measured ~15x wall at 10x data (n^2/256
    // dominating); wider bands push the crossover an order of
    // magnitude out. Banding is geometry-only: the pair SET equals the
    // exhaustive self-join (the oracle) at any valid layout.
    graft.ml.Dedup
      .bandedNearDupPairs(h, "doc_id", "dhash", maxHamming = 4, nBands = 5)
      .select(col("id1").as("d1"), col("id2").as("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }

  private val imageNearDupSql =
    s"""WITH $dhashCte
       |SELECT a.doc_id AS d1, c.doc_id AS d2,
       |       CAST(bit_count(xor(a.dhash, c.dhash)) AS INT) AS hamming
       |FROM h a JOIN h c ON a.doc_id < c.doc_id
       |WHERE bit_count(xor(a.dhash, c.dhash)) <= 4
       |ORDER BY d1, d2""".stripMargin

  /** WAV encode -> javax.sound decode -> exact sample aggregates. */
  private def audioDecode(s: SparkSession, d: String): DataFrame =
    Multimodal
      .audioFeatures(sawtoothWavs(s, d), "doc_id", "media")
      .orderBy(col("doc_id"))

  private val audioDecodeSql =
    s"""WITH smp AS (
       |  SELECT doc_id, (doc_id * 31 + i * 7) % 4096 - 2048 AS s
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(0, $NSamples)) AS i)
       |)
       |SELECT doc_id,
       |       CAST(${SampleRate.toInt} AS INT) AS sample_rate,
       |       CAST(COUNT(*) AS BIGINT) AS n_samples,
       |       CAST(SUM(s) AS BIGINT) AS sum_samples,
       |       CAST(MAX(ABS(s)) AS INT) AS peak_abs
       |FROM smp
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- real video decode (uncompressed AVI) ------------------------

  private val VidF = 6
  private val VidFps = 5

  /** One 6-frame 9x7 uncompressed AVI per doc, RGB channels linear in
    * (doc_id, x, y, frame) — exercises the full RIFF container parse
    * (bottom-up BGR rows, 28-byte padded stride) with closed-form
    * expected sums.
    */
  private def rgbVideos(s: SparkSession, d: String): DataFrame = {
    val ids = TestTables.documents(s, d).select(col("doc_id").cast(LongType))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val avi = graft.ml.AviCodec.encodeAviRgb(
          DhW,
          DhH,
          VidF,
          VidFps,
          (f, x, y) => {
            val rr = ((id * 7 + x * 13 + y * 31 + f * 11) % 256).toInt
            val gg = ((id * 11 + x * 3 + y * 17 + f * 19) % 256).toInt
            val bb = ((id * 5 + x * 19 + y * 23 + f * 7) % 256).toInt
            (rr << 16) | (gg << 8) | bb
          }
        )
        Row(id, avi)
      }
    }(Encoders.row(mediaSchema))
  }

  /** Grayscale variant (per-frame dHash stays closed-form). */
  private def grayVideos(s: SparkSession, d: String): DataFrame = {
    val ids = TestTables.documents(s, d).select(col("doc_id").cast(LongType))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val g = id % 97
        val avi = graft.ml.AviCodec.encodeAviRgb(
          DhW,
          DhH,
          VidF,
          VidFps,
          (f, x, y) => {
            val v = ((g * 37 + x * 13 + y * 31 + (x * y * (g + 3)) % 97 + f * 29) % 256).toInt
            (v << 16) | (v << 8) | v
          }
        )
        Row(id, avi)
      }
    }(Encoders.row(mediaSchema))
  }

  /** AVI encode -> REAL container decode -> exact per-frame channel
    * sums; one row per frame.
    */
  private def videoDecode(s: SparkSession, d: String): DataFrame =
    Multimodal
      .videoFrameFeatures(rgbVideos(s, d), "doc_id", "media")
      .orderBy(col("doc_id"), col("frame_no"))

  private val videoDecodeSql =
    s"""WITH px AS (
       |  SELECT doc_id, f, x, y
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(0, $VidF)) AS f),
       |       LATERAL (SELECT unnest(range(0, $DhW)) AS x),
       |       LATERAL (SELECT unnest(range(0, $DhH)) AS y)
       |)
       |SELECT doc_id,
       |       CAST(f AS INT) AS frame_no,
       |       CAST($DhW AS INT) AS width,
       |       CAST($DhH AS INT) AS height,
       |       CAST(SUM((doc_id * 7 + x * 13 + y * 31 + f * 11) % 256) AS BIGINT) AS sum_r,
       |       CAST(SUM((doc_id * 11 + x * 3 + y * 17 + f * 19) % 256) AS BIGINT) AS sum_g,
       |       CAST(SUM((doc_id * 5 + x * 19 + y * 23 + f * 7) % 256) AS BIGINT) AS sum_b
       |FROM px
       |GROUP BY doc_id, f
       |ORDER BY doc_id, frame_no""".stripMargin

  /** The fixture pixel value for gray videos as DuckDB SQL. */
  private def vfSql(xe: String, ye: String, fe: String): String =
    s"((doc_id % 97) * 37 + ($xe) * 13 + ($ye) * 31 + (($xe) * ($ye) * (doc_id % 97 + 3)) % 97 + ($fe) * 29) % 256"

  /** AVI decode -> dHash of every 2nd frame — the sampled-frame
    * fingerprint pass video near-dup runs on. Oracle computes the
    * bits arithmetically per sampled frame.
    */
  private def videoPhash(s: SparkSession, d: String): DataFrame =
    Multimodal
      .videoFrameDHashes(grayVideos(s, d), "doc_id", "media", stride = 2)
      .orderBy(col("doc_id"), col("frame_no"))

  private val videoPhashSql =
    s"""WITH b AS (
       |  SELECT doc_id, f, y * 8 + x AS i,
       |         CASE WHEN ${vfSql("x + 1", "y", "f")} > ${vfSql("x", "y", "f")} THEN 1 ELSE 0 END AS bit
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(0, $VidF, 2)) AS f),
       |       LATERAL (SELECT unnest(range(0, ${DhW - 1})) AS x),
       |       LATERAL (SELECT unnest(range(0, $DhH)) AS y)
       |)
       |SELECT doc_id, CAST(f AS INT) AS frame_no,
       |       CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
       |FROM b GROUP BY doc_id, f
       |ORDER BY doc_id, frame_no""".stripMargin

  /** Clip-level near-dup: clips sharing >=2 of their 3 sampled frame
    * hashes at the SAME frame position. A plain (frame_no, dhash)
    * equi-join — hash-partitionable, no banding needed because frame
    * hashes match exactly for re-encoded/re-uploaded copies; the
    * per-pair count is the match-strength score video dedup thresholds
    * on.
    */
  private def videoNearDup(s: SparkSession, d: String): DataFrame = {
    val fh = Multimodal
      .videoFrameDHashes(grayVideos(s, d), "doc_id", "media", stride = 2)
      .filter(col("dhash").isNotNull)
    val l = fh.select(col("doc_id").as("d1"), col("frame_no"), col("dhash"))
    val r = fh.select(col("doc_id").as("d2"), col("frame_no"), col("dhash"))
    l.join(r, Seq("frame_no", "dhash"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_matching_frames"))
      .filter(col("n_matching_frames") >= 2)
      .orderBy(col("d1"), col("d2"))
  }

  private val videoNearDupSql =
    s"""WITH b AS (
       |  SELECT doc_id, f, y * 8 + x AS i,
       |         CASE WHEN ${vfSql("x + 1", "y", "f")} > ${vfSql("x", "y", "f")} THEN 1 ELSE 0 END AS bit
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(0, $VidF, 2)) AS f),
       |       LATERAL (SELECT unnest(range(0, ${DhW - 1})) AS x),
       |       LATERAL (SELECT unnest(range(0, $DhH)) AS y)
       |), h AS (
       |  SELECT doc_id, f, CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
       |  FROM b GROUP BY doc_id, f
       |)
       |SELECT a.doc_id AS d1, c.doc_id AS d2, CAST(count(*) AS BIGINT) AS n_matching_frames
       |FROM h a JOIN h c ON a.f = c.f AND a.dhash = c.dhash AND a.doc_id < c.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= 2
       |ORDER BY d1, d2""".stripMargin

  /** WAV encode -> REAL decode -> 31-bit energy fingerprint (32
    * 8-sample frames over the 256-sample sawtooth); the oracle
    * recomputes frame energies arithmetically from the closed-form
    * sample function — a decoded-audio perceptual hash with no codec
    * on the oracle side.
    */
  private def audioFingerprint(s: SparkSession, d: String): DataFrame =
    Multimodal
      .audioEnergyHashes(sawtoothWavs(s, d), "doc_id", "media")
      .orderBy(col("doc_id"))

  private val audioFingerprintSql =
    s"""WITH smp AS (
       |  SELECT doc_id, i, (doc_id * 31 + i * 7) % 4096 - 2048 AS s
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(0, $NSamples)) AS i)
       |), fr AS (
       |  SELECT doc_id, i // 8 AS f, SUM(s * s) AS e
       |  FROM smp GROUP BY 1, 2
       |), bits AS (
       |  SELECT a.doc_id, a.f AS i, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
       |  FROM fr a JOIN fr b ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |)
       |SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS ahash
       |FROM bits GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_image_decode", imageDecode, Some(imageDecodeSql)),
    QueryDef("q_image_resize", imageResize, Some(imageResizeSql)),
    QueryDef("q_image_phash", imagePhash, Some(imagePhashSql)),
    QueryDef("q_image_neardup", imageNearDup, Some(imageNearDupSql)),
    QueryDef("q_audio_decode", audioDecode, Some(audioDecodeSql)),
    QueryDef("q_audio_fingerprint", audioFingerprint, Some(audioFingerprintSql)),
    QueryDef("q_video_decode", videoDecode, Some(videoDecodeSql)),
    QueryDef("q_video_phash", videoPhash, Some(videoPhashSql)),
    QueryDef("q_video_neardup", videoNearDup, Some(videoNearDupSql))
  )
}
