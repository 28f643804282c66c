package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two `array<double>`
  * columns, with whole-stage codegen.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), ...)`)
  * is evaluated INTERPRETED per element — Spark's higher-order
  * functions don't participate in codegen, which makes every candidate
  * pair of a similarity join allocate an intermediate array and walk a
  * lambda. This expression compiles to a tight primitive loop (same
  * sequential summation order, so results are bit-identical to the
  * HOF form and to DuckDB's `list_dot_product`). O(n^2) pair scoring
  * is exactly the hot path where this matters at scale.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"vec_dot requires (array<double>, array<double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val sum = ctx.freshName("sum")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $sum = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $sum += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $sum;
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VectorOps {
  val DotName = "vec_dot"

  /** Register in the session's function registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName,
      exprs => VecDot(exprs(0), exprs(1)),
      "built-in"
    )

  /** Column API (requires `register` on the session first). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(DotName, a, b)
}
