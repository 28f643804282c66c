package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{SimHash64, UnicodeTokens, VecDot, VectorOps}

/** Session extension wiring — `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) registers the
  * engine's native expressions for SQL use in any session, the
  * library-deployment twin of `SimHash64.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier(SimHash64.FunctionName),
        new ExpressionInfo(classOf[SimHash64].getName, SimHash64.FunctionName),
        (children: Seq[Expression]) => SimHash64(children.head, seed = 42L)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier(VectorOps.DotName),
        new ExpressionInfo(classOf[VecDot].getName, VectorOps.DotName),
        (children: Seq[Expression]) => VecDot(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier(UnicodeTokens.FunctionName),
        new ExpressionInfo(classOf[UnicodeTokens].getName, UnicodeTokens.FunctionName),
        (children: Seq[Expression]) => UnicodeTokens(children.head)
      )
    )
  }
}
