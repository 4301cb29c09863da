package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.FixedPointDot

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT fixed_point_dot(a, b)")` works alongside the
  * Column-level API ([[graft.ops.Vectors.dotScaled]]). Activated via
  * `spark.sql.extensions=graft.GraftExtensions` ([[Sessions.builder]]) —
  * the standard plug-in mechanism, no fork of session internals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fixed_point_dot"),
      new ExpressionInfo(classOf[FixedPointDot].getName, "fixed_point_dot"),
      (exprs: Seq[Expression]) => FixedPointDot(exprs.head, exprs(1))))
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
