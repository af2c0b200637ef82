package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Session extensions for the engine's native expressions — wire with
  * `spark.sql.extensions=graft.GraftExtensions` (or pass to
  * `SparkSession.builder.withExtensions`) and the functions become first-
  * class SQL, usable from `spark.sql(...)` alongside the builtins. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotFunction)
}

object GraftExtensions {
  /** `graft_dot(array<double>, array<double>) -> double` ([[DotProduct]]). */
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1)))
}
