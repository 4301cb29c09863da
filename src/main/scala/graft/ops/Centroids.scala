package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group embedding centroids via a typed [[Aggregator]] — the custom
  * aggregation mechanism of the engine (SURVEY §7 anticipated exactly
  * this shape), and the coarse-quantizer building block an IVF-style ANN
  * index trains on.
  *
  * Exactness contract (same as [[Vectors]]): elements are fixed-point
  * scaled to longs in the reduce step, so the merge tree's order — which
  * Spark does not guarantee — cannot change the sums; the mean is
  * converted to double once at finish. The DuckDB oracle reproduces the
  * identical arithmetic on unnested elements.
  *
  * Range bound: the Long accumulator holds Σ round(x·1e15) per dimension,
  * so a group is exact up to ~9.2e18/1e15 ≈ 9200 rows of worst-case
  * unit components (~10× more at typical |x| ≈ 0.1). Beyond that the
  * fixed-point contract needs a wider accumulator (shift the scale, or
  * aggregate per-partition then merge as BigInt); the oracle's checked
  * BIGINT cast fails loudly at the same boundary where this Long would
  * wrap silently.
  */
object Centroids {

  final case class LabeledVec(label: Int, v: Seq[Double])
  final case class Buf(sums: Array[Long], n: Long)

  /** Σ round(x·1e15) per dimension + count; mean at finish. */
  val centroid: Aggregator[LabeledVec, Buf, Seq[Double]] =
    new Aggregator[LabeledVec, Buf, Seq[Double]] {
      override def zero: Buf = Buf(Array.emptyLongArray, 0L)
      override def reduce(b: Buf, a: LabeledVec): Buf = {
        val s = if (b.sums.isEmpty) new Array[Long](a.v.length) else b.sums
        require(a.v.length == s.length,
          s"ragged embedding: expected ${s.length} dims, got ${a.v.length}")
        var i = 0
        while (i < a.v.length) {
          s(i) += graft.expressions.FixedPointDot.scaledRound(a.v(i))
          i += 1
        }
        Buf(s, b.n + 1)
      }
      override def merge(x: Buf, y: Buf): Buf = {
        if (x.sums.isEmpty) y
        else if (y.sums.isEmpty) x
        else {
          require(x.sums.length == y.sums.length,
            s"ragged embedding: ${x.sums.length} vs ${y.sums.length} dims")
          var i = 0
          while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
          Buf(x.sums, x.n + y.n)
        }
      }
      override def finish(b: Buf): Seq[Double] =
        b.sums.map(s => s.toDouble / 1e15 / b.n).toSeq
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** (label, centroid: array&lt;double&gt;) — the codebook form an IVF
    * index probes against. */
  def perLabelVec(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("label").cast("int"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[LabeledVec]
      .groupByKey(_.label)
      .agg(centroid.toColumn.name("centroid"))
      .toDF("label", "centroid")
  }

  /** (label, dim, c) centroid rows for a frame with (label, embedding). */
  def perLabel(df: DataFrame): DataFrame =
    perLabelVec(df)
      .select(col("label"), posexplode(col("centroid")))
      .toDF("label", "dim", "c")
}
