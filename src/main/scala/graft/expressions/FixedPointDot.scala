package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd fixed-point dot product: Σ round_half_away(aᵢ·bᵢ·1e15) as a
  * LONG — the hot kernel of every similarity query (SURVEY §2.7 V3).
  *
  * This is the one place the engine drops below the built-in operators:
  * the semantics ARE expressible as zip_with+aggregate higher-order
  * functions (that was the first implementation), but HOF lambdas are
  * interpreted per element; a brute-force kNN pass evaluates the kernel
  * |corpus|×|queries|×dims times, so it deserves a tight generated loop.
  * Both paths produce bit-identical results (VectorsSpec pins them).
  *
  * Rounding contract: half-away-from-zero computed EXACTLY — floor/ceil
  * then an exact residual compare against 0.5 (v−⌊v⌋ is exact for the
  * |v| < 2^52 domain this kernel operates in). That matches both Spark's
  * `round()` (BigDecimal HALF_UP, away-from-zero for doubles) and
  * DuckDB's `round()` (C++ std::round), keeping the DuckDB oracles
  * hash-exact. Mismatched array lengths contribute only the common
  * prefix; null elements contribute zero.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(DoubleType) — callers go through
  // Vectors.dotScaled, which casts; ExpectsInputTypes is private[sql].
  override def dataType: DataType = LongType
  override def prettyName: String = "fixed_point_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += FixedPointDot.scaledRound(x.getDouble(i) * y.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $v = $a.getDouble($i) * $b.getDouble($i) * 1.0E15;
         |    double $t;
         |    if ($v >= 0.0) {
         |      $t = java.lang.Math.floor($v);
         |      if ($v - $t >= 0.5) $t += 1.0;
         |    } else {
         |      $t = java.lang.Math.ceil($v);
         |      if ($t - $v >= 0.5) $t -= 1.0;
         |    }
         |    $s += (long) $t;
         |  }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FixedPointDot {
  /** Interpreted twin of the generated loop (kept in exact lockstep). */
  def scaledRound(prod: Double): Long = {
    val v = prod * 1e15
    if (v >= 0.0) {
      var t = Math.floor(v)
      if (v - t >= 0.5) t += 1.0
      t.toLong
    } else {
      var t = Math.ceil(v)
      if (t - v >= 0.5) t -= 1.0
      t.toLong
    }
  }
}
