package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All multi-band hyperplane LSH signatures of a vector in ONE fused
  * pass: for global plane p, bit p%rowsPerBand of band p/rowsPerBand is
  * the sign of the fixed-point dot ⟨vec, plane_p⟩ (the [[FixedPointDot]]
  * kernel, so signs — and hence buckets — stay bit-identical to the
  * DuckDB oracle's SQL replica).
  *
  * Why a custom Expression and not `bands × lshBucket(plane slice)`
  * column compositions: that spells 64 separate `fixed_point_dot` calls
  * per row, and each call pays Catalyst per-expression overhead plus an
  * array-cast copy of its plane literal (the literal's `containsNull`
  * never matches the call site, so SimplifyCasts can't drop the cast) —
  * measured ~2 s for a 2 200-row corpus vs ~20 ms fused. The planes ride
  * along as a plain `Array[Array[Double]]` reference object — primitive
  * access, no per-call ArrayData boxing.
  */
case class HyperplaneBandSigs(child: Expression,
                              planes: Array[Array[Double]],
                              rowsPerBand: Int)
    extends UnaryExpression {
  require(rowsPerBand > 0 && rowsPerBand <= 63 &&
    planes.nonEmpty && planes.length % rowsPerBand == 0,
    s"need planes grouped into $rowsPerBand-row bands, got ${planes.length}")

  // input must be ArrayType(DoubleType) — callers go through
  // Vectors.lshBandSigs, which casts.
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_sigs"

  private def nBands: Int = planes.length / rowsPerBand

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sigs = new Array[Long](nBands)
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val m = math.min(v.numElements(), w.length)
      var s = 0L
      var i = 0
      while (i < m) {
        if (!v.isNullAt(i))
          s += FixedPointDot.scaledRound(v.getDouble(i) * w(i))
        i += 1
      }
      if (s > 0) sigs(p / rowsPerBand) |= 1L << (p % rowsPerBand)
      p += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val sigs = ctx.freshName("sigs")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val t = ctx.freshName("t")
      s"""
         |long[] $sigs = new long[$nBands];
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $w = $pl[$p];
         |  int $m = java.lang.Math.min($a.numElements(), $w.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      double $v = $a.getDouble($i) * $w[$i] * 1.0E15;
         |      double $t;
         |      if ($v >= 0.0) {
         |        $t = java.lang.Math.floor($v);
         |        if ($v - $t >= 0.5) $t += 1.0;
         |      } else {
         |        $t = java.lang.Math.ceil($v);
         |        if ($t - $v >= 0.5) $t -= 1.0;
         |      }
         |      $s += (long) $t;
         |    }
         |  }
         |  if ($s > 0) $sigs[$p / $rowsPerBand] |= 1L << ($p % $rowsPerBand);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
