package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd integer dot product: Σ aᵢ·bᵢ over two `array<int>` columns
  * as a LONG — the scoring kernel of the scalar-quantized ANN rungs
  * (q_ann_sq brute force, q_ann_ivf_sq under the IVF cutter).
  *
  * Same rationale as [[FixedPointDot]]: the semantics are expressible as
  * zip_with+aggregate (that was the first implementation, kept as
  * [[graft.queries.SimilarityQueries]]'s oracle-mirror and pinned
  * bit-identical in VectorsSpec), but HOF lambdas are interpreted per
  * element, and the quantized brute-force rung evaluates this kernel
  * |corpus|×|queries|×dims times — it deserves a tight generated loop.
  * Unlike FixedPointDot there is no rounding at all: int·int sums are
  * exact in 64 bits for any realistic dims (≤ 2^31 codes of magnitude
  * ≤ 127² each), so determinism is free.
  *
  * Mismatched array lengths contribute only the common prefix; null
  * elements contribute zero — the FixedPointDot contract. */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(IntegerType) — callers go through
  // Vectors.intDot, which casts; ExpectsInputTypes is private[sql].
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (long) $a.getInt($i) * $b.getInt($i);
         |  }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
