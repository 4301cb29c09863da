package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch operators for cardinality at scale.
  *
  * KMV (k-minimum-values): hash every distinct value to a 60-bit uniform
  * integer, keep the k smallest per group, estimate the distinct count as
  * (k-1)·2⁶⁰/h_k from the k-th order statistic (exactly the distinct
  * count when a group holds fewer than k distinct hashes). The sketch is
  * a fixed-size order statistic — mergeable across partitions/days by
  * keeping the k smallest of a union — which is why it (and its HLL
  * cousins, `approx_count_distinct`) is the 100 TB path where exact
  * distinct is a full shuffle of every value.
  *
  * Determinism contract: md5-derived hashes (not engine-internal ones),
  * integer order statistics, and a single double division at the end —
  * reproducible bit-for-bit in ANSI SQL, unlike `approx_count_distinct`
  * whose HLL++ register layout no oracle can mirror.
  */
object Sketch {
  /** 2^60, exactly representable as a double. */
  private val Two60 = 1152921504606846976L

  /** 60-bit uniform hash of a string column (md5 prefix, the
    * q_fingerprint kernel). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The raw sketch state: the (up to) k smallest distinct hashes per
    * group → (groupCol, h). This is what makes KMV mergeable — the union
    * of two groups'/days' minima, re-capped to the k smallest, IS the
    * sketch of the union (order statistics compose; SketchSpec proves it
    * executable). The k minima ride the custom [[TopK]] operator:
    * map-side bounded heaps, so after the distinct only ≤ k·|groups|
    * hash rows shuffle. */
  def kmvMinima(df: DataFrame, groupCol: String, valueCol: String,
                k: Int): DataFrame = {
    val hashed = df.select(col(groupCol), hash60(col(valueCol)).as("h"))
      .distinct()
    TopK.perGroup(hashed, Seq(hashed(groupCol)), Seq(hashed("h") -> false), k)
      .select(col(groupCol), col("h"))
  }

  /** Merge two minima frames (same group/h schema): k smallest of the
    * union. `distinct` first — the same value observed in both inputs
    * must count once. */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCol: String,
               k: Int): DataFrame = {
    val u = a.unionAll(b).distinct()
    TopK.perGroup(u, Seq(u(groupCol)), Seq(u("h") -> false), k)
      .select(col(groupCol), col("h"))
  }

  /** Finisher: estimate from a minima frame → (groupCol, kmv_est). */
  def kmvEstimate(minima: DataFrame, groupCol: String, k: Int): DataFrame =
    minima.groupBy(groupCol)
      .agg(max("h").as("hk"), count(lit(1)).as("nk"))
      .select(col(groupCol),
        round(when(col("nk") < k, col("nk").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Two60).cast("double") /
            col("hk").cast("double")), 3).as("kmv_est"))

  /** Per-group KMV distinct estimate → (groupCol, kmv_est); the one-shot
    * composition of [[kmvMinima]] + [[kmvEstimate]]. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame =
    kmvEstimate(kmvMinima(df, groupCol, valueCol, k), groupCol, k)
}
