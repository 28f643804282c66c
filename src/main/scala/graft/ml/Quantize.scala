package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Embedding compression for ANN at scale: per-vector int8 scalar
  * quantization (the standard "SQ8" storage format — 4x smaller than
  * float32, dot products computable on the codes).
  *
  * Everything is an elementwise array projection — zero shuffles, runs
  * at scan speed; every arithmetic step (max, divide, floor) is
  * IEEE-deterministic, so outputs are bit-identical cross-engine with
  * NO rounding discipline needed (unlike order-dependent sums).
  * Rounding is floor(x + 0.5) — explicit half-up — because engine
  * `round()` tie policies differ.
  */
object Quantize {

  /** Quantize `vecCol` (float/double array) to int8 codes with a
    * per-vector scale = max|x| / 127. Returns one row per input row:
    * scale, saturation count, max reconstruction error, and a
    * portable checksum of the code array (so an oracle can verify the
    * exact codes without an array-typed compare).
    */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x))) / 127.0"))
      .withColumn(
        "codes",
        expr(
          """CASE WHEN scale = 0.0 THEN transform(v, x -> CAST(0 AS BIGINT))
            |     ELSE transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) END""".stripMargin
        )
      )
      .withColumn("n_sat", expr("size(filter(codes, c -> abs(c) = 127))"))
      .withColumn(
        "linf_err",
        expr("array_max(zip_with(v, codes, (x, c) -> abs(x - c * scale)))")
      )
      .withColumn(
        "code_checksum",
        PortableHash.md5num56(expr("array_join(transform(codes, c -> CAST(c AS STRING)), ',')"))
      )
      .select(col(idCol), col("scale"), col("n_sat"), col("linf_err"), col("code_checksum"))
}
