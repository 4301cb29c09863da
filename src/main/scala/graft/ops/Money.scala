package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-point money aggregation — the relational twin of the vector
  * kernel's contract ([[Vectors]]): per-row arithmetic in LONG (codegen'd
  * 64-bit ops — no 128-bit decimal multiplies in the hot path), then an
  * exact DECIMAL(38,0) sum of the scaled longs and ONE correctly-rounded
  * conversion to double per group.
  *
  * Exactness: inputs are 2-decimal money values, so `rint(x·100)`
  * recovers the exact scaled integer (values sit ~1e-12 from the true
  * decimal; nothing is near a .5 boundary, so half-even vs half-away is
  * moot). Summing as DECIMAL(38,0) rather than LONG matters at scale: a
  * scale-6 charge term is ~1e11 per row, which would overflow a LONG
  * total near 8e7 rows (~SF 14) — decimal totals carry 38 digits, good
  * for ~1e27 rows, and stay on Decimal's long fast path until 1e18.
  * The final value divides by 10^scale as an exact decimal and casts to
  * double — the same single rounding as the oracle's DECIMAL→DOUBLE.
  */
object Money {
  /** 2-decimal money column → exact scaled long (cents). */
  def cents(c: Column): Column = rint(c * 100).cast("long")

  /** Exact sum of a scaled-long term → correctly-rounded double at
    * `scale`. */
  def sumExact(scaledTerm: Column, scale: Int): Column = {
    val divisor = lit(math.pow(10, scale).toLong).cast(DecimalType(19, 0))
    (sum(scaledTerm.cast(DecimalType(38, 0))) / divisor).cast("double")
  }
}
