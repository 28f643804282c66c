package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExpressionSandbox

/** Water-quality guideline (criteria) evaluation: declarative limit
  * rules derived per sample and compared against results.
  *
  * Reference: `inst/patches/patch_51.R` (YukonWRB/AquaCache) —
  * algorithm vocabulary `:355-395` (constant / linear / log_linear /
  * sql_scalar / narrative), evaluator `:2590-2816`, input resolution
  * from same-sample results (e.g. hardness for metal guidelines)
  * `:1780,2156`, output caps and rounding `:2783-2808`.
  *
  *   - constant:    limit = b0
  *   - linear:      limit = b0 + b1 * x
  *   - log_linear:  limit = exp(b0 + b1 * ln(x))
  *   - sql_scalar:  sandbox-validated stored expression of `$1` = x
  *   - narrative:   no numeric limit (text verdict only)
  *
  * where x is the same-sample value of the rule's input parameter;
  * rules with a missing input yield NULL (missing-input policy).
  * Limits are clamped to [cap_min, cap_max] then rounded to
  * `digits`.
  *
  * Spark-first: rules are a tiny dimension — broadcast joined twice
  * (target parameter, input parameter); the evaluation itself is one
  * `when` chain, fully codegen'd; no shuffle beyond the results scan.
  */
object Guidelines {

  /** @param results one row per (sampleKey, parameter) with `value`
    * @param rules   rule_id, algorithm, target_param, input_param
    *                (nullable), b0, b1, cap_min, cap_max (nullable),
    *                digits (int), expression (nullable, sql_scalar)
    */
  def evaluate(
      results: DataFrame,
      rules: DataFrame,
      sampleKeyCols: Seq[String],
      paramCol: String = "parameter",
      valueCol: String = "value"
  ): DataFrame = {
    val spark = results.sparkSession

    val exprs: Map[Long, String] = rules
      .filter(col("algorithm") === "sql_scalar" && col("expression").isNotNull)
      .select(col("rule_id"), col("expression"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    exprs.foreach { case (id, e) =>
      ExpressionSandbox.validate(e) match {
        case Left(err) => throw new IllegalArgumentException(s"unsafe guideline rule $id: $err")
        case Right(_) =>
          spark.sessionState.sqlParser.parseExpression(
            ExpressionSandbox.bindPlaceholders(e, Map(1 -> "1.0"))
          )
      }
    }
    val sqlScalarCase =
      if (exprs.isEmpty) lit(null).cast("double")
      else
        expr(
          exprs.toSeq
            .sortBy(_._1)
            .map { case (id, e) =>
              s"WHEN rule_id = ${id}L THEN CAST((${ExpressionSandbox.bindPlaceholders(e, Map(1 -> "x"))}) AS DOUBLE)"
            }
            .mkString("CASE ", " ", " ELSE CAST(NULL AS DOUBLE) END")
        )

    // rename the input-lookup side before the self-join: same-lineage
    // column refs are ambiguous otherwise
    val inputs = results.select(
      sampleKeyCols.map(c => col(c).as(s"i_$c")) :+
        col(paramCol).as("i_param") :+ col(valueCol).as("x"): _*
    )
    val joined = results
      .join(broadcast(rules), results(paramCol) === rules("target_param"), "inner")
      .join(
        inputs,
        sampleKeyCols.map(c => col(c) === col(s"i_$c")).reduce(_ && _) &&
          col("input_param") === col("i_param"),
        "left"
      )
      .drop((sampleKeyCols.map(c => s"i_$c") :+ "i_param"): _*)

    val rawLimit = when(col("algorithm") === "constant", col("b0"))
      .when(col("algorithm") === "linear", col("b0") + col("b1") * col("x"))
      .when(col("algorithm") === "log_linear", exp(col("b0") + col("b1") * log(col("x"))))
      .when(col("algorithm") === "sql_scalar", sqlScalarCase)

    // per-rule digits is a COLUMN; Spark's round() needs a foldable
    // scale, so scale-and-round manually (round half-up, matching the
    // reference's positive-limit rounding)
    val capped = least(
      greatest(rawLimit, coalesce(col("cap_min"), rawLimit)),
      coalesce(col("cap_max"), rawLimit)
    )
    val p10 = pow(lit(10.0), col("digits"))
    joined
      .withColumn("limit", round(capped * p10) / p10)
      .withColumn(
        "exceeds",
        when(col("algorithm") === "narrative", lit(null).cast("boolean"))
          .otherwise(col(valueCol) > col("limit"))
      )
  }
}
