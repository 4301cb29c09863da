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
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"fixed_point_dot requires 2 arguments, got ${exprs.length}")
        // coerce here (the analyzer has no implicit-cast rule for custom
        // expressions): array<float> inputs would otherwise be misread
        val arrDouble = org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)
        FixedPointDot(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, arrDouble),
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), arrDouble))
      }))
    ext.injectFunction((
      new FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[graft.expressions.IntDot].getName, "int_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"int_dot requires 2 arguments, got ${exprs.length}")
        val arrInt = org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)
        graft.expressions.IntDot(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, arrInt),
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), arrInt))
      }))
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
