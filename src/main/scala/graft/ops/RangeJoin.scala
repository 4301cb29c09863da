package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — with as-of join, the second classic
  * operator Spark has no native plan for: pairs every point with every
  * same-key interval containing it. A raw inequality join
  * (`p.key = i.key AND p.t BETWEEN i.s AND i.e`) runs as an in-key
  * all-pairs filter — quadratic in hot keys, the wrong plan at scale.
  *
  * Bucketed formulation: pick a bucket width; each interval explodes to
  * the buckets it covers (bounded by maxIntervalLen/bucket + 1 rows),
  * each point maps to exactly ONE bucket, and the join becomes an
  * equi-join on (key, bucket) + an exact containment filter. A
  * (point, interval) pair meets in exactly one bucket — the point's —
  * so no dedup pass is needed. Candidates are "intervals overlapping the
  * point's bucket", not "all in-key pairs": linear in data for bounded
  * interval length, and the equi-join shape keeps hash partitioning,
  * AQE, and skew handling available.
  *
  * Contract: time columns are epoch-micros LONGs; interval length must
  * be bounded (callers pick bucketUs ≈ the typical interval length).
  */
object RangeJoin {

  /** points(key, pts, ...) ⋈ intervals(key, istart, iend, ...) →
    * one row per (point, containing interval), both sides' columns.
    * Column names must not collide apart from `key`. */
  def joinPointInInterval(points: DataFrame, intervals: DataFrame,
                          key: String, pts: String, istart: String,
                          iend: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    // integer `div`, not Column./ (which is double division)
    val ivb = intervals.withColumn("__b",
      explode(sequence(expr(s"`$istart` div ${bucketUs}L"),
        expr(s"`$iend` div ${bucketUs}L"))))
    val ptb = points.withColumn("__b", expr(s"`$pts` div ${bucketUs}L"))
    ptb.join(ivb, Seq(key, "__b"))
      .filter(col(pts) >= col(istart) && col(pts) <= col(iend))
      .drop("__b")
  }
}
