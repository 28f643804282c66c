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

/** Native Catalyst expression: cosine similarity of two
  * `array<double>` columns in a SINGLE fused pass — one loop
  * accumulates xy, xx, yy together, then `xy / sqrt(xx * yy)`, NULL
  * when the denominator is not positive (zero-norm vectors have no
  * direction; matches DuckDB's x/0 = NULL).
  *
  * This replaces the Column-level form
  * `when(sqrt(dot(a,a)*dot(b,b)) > 0, dot(a,b)/sqrt(...))`, which
  * inlines the denominator twice (predicate + branch value) and is
  * NOT merged by codegen subexpression elimination — conditional
  * branch values are excluded from CSE — so each compared pair paid
  * FIVE array walks (dot(a,b) once, dot(a,a)/dot(b,b) twice each).
  * The fused loop pays one. Pair scoring is the hot path of every
  * similarity/semdedup kernel, so at 100 TB this is the difference
  * between one corpus scan and five.
  *
  * Summation order per accumulator is the same sequential order as
  * [[VecDot]] and DuckDB's `list_dot_product`, so results are
  * bit-identical to the three-dot formulation.
  */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on zero-norm inputs, not just on NULL inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"vec_cosine requires (array<double>, array<double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var xy = 0.0
    var xx = 0.0
    var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      xy += xi * yi
      xx += xi * xi
      yy += yi * yi
      i += 1
    }
    val denom = math.sqrt(xx * yy)
    if (denom > 0) java.lang.Double.valueOf(xy / denom) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val xy = ctx.freshName("xy")
        val xx = ctx.freshName("xx")
        val yy = ctx.freshName("yy")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        val denom = ctx.freshName("denom")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $a.getDouble($i);
           |  double $yi = $b.getDouble($i);
           |  $xy += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
           |}
           |double $denom = java.lang.Math.sqrt($xx * $yy);
           |if ($denom > 0) { ${ev.value} = $xy / $denom; } else { ${ev.isNull} = true; }
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_cosine"
}

/** Native Catalyst expression: `v[i] / s` elementwise — the L2
  * normalization kernel `VecScaleInv(v, norm)`. NULL when `s` is NULL
  * or not positive (a zero-norm vector cannot be normalized; callers
  * filter such rows out by contract, this expression just refuses to
  * divide by zero under ANSI). NULL elements pass through as NULL,
  * matching the `transform(v, x => x / norm)` HOF it replaces.
  *
  * True per-element DIVISION, deliberately not `* (1/s)`: the oracle
  * mirrors normalize with `x / sqrt(list_dot_product(v, v))` and the
  * reciprocal form differs in the last ulp, which can flip a
  * 4-decimal rounding or a threshold comparison on a near-boundary
  * pair. Replaces `transform(v, x => x / when(norm > 0, norm))`,
  * whose per-element `when` guard re-evaluated per element in
  * interpreted HOF-lambda code; here the guard is hoisted to one
  * per-row check and each element costs one divide in a codegen'd
  * loop.
  */
case class VecScaleInv(left: Expression, right: Expression) extends BinaryExpression {

  private def elementNullable: Boolean = left.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = elementNullable)

  // NULL on non-positive scale, not just on NULL inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"vec_scale_inv requires (array<double>, double), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val s = b.asInstanceOf[Double]
    if (!(s > 0)) return null
    val n = v.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = v.getDouble(i) / s; i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (v.isNullAt(i)) null else java.lang.Double.valueOf(v.getDouble(i) / s)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, s) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val prim = ctx.freshName("prim")
        val boxed = ctx.freshName("boxed")
        val hasNull = ctx.freshName("hasNull")
        s"""
           |if (!($s > 0)) { ${ev.isNull} = true; } else {
           |  int $n = $a.numElements();
           |  boolean $hasNull = false;
           |  for (int $i = 0; $i < $n && !$hasNull; $i++) { $hasNull = $a.isNullAt($i); }
           |  if (!$hasNull) {
           |    double[] $prim = new double[$n];
           |    for (int $j = 0; $j < $n; $j++) { $prim[$j] = $a.getDouble($j) / $s; }
           |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($prim);
           |  } else {
           |    Object[] $boxed = new Object[$n];
           |    for (int $j = 0; $j < $n; $j++) {
           |      if (!$a.isNullAt($j)) { $boxed[$j] = java.lang.Double.valueOf($a.getDouble($j) / $s); }
           |    }
           |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
           |  }
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecScaleInv =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_scale_inv"
}

object VectorOps {
  val DotName = "vec_dot"
  val CosineName = "vec_cosine"
  val ScaleInvName = "vec_scale_inv"

  /** Register in the session's function registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(DotName, exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(CosineName, exprs => VecCosine(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(ScaleInvName, exprs => VecScaleInv(exprs(0), exprs(1)), "built-in")
  }

  /** Column API (requires `register` on the session first). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(DotName, a, b)

  /** Fused single-pass cosine; NULL for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(CosineName, a, b)

  /** Elementwise `v / s`; NULL when `s` is not positive. */
  def scaleInv(v: Column, s: Column): Column =
    org.apache.spark.sql.functions.call_function(ScaleInvName, v, s)
}
