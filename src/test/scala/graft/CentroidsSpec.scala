package graft

import org.apache.spark.sql.functions._
import graft.ops.Centroids

/** Typed centroid Aggregator: exact means, merge-order independence. */
class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  test("centroid of known vectors is the exact per-dim mean") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)),
      (2, Seq(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = Centroids.perLabel(df).as[(Int, Int, Double)].collect().toSet
    assert(out === Set((1, 0, 2.0), (1, 1, 3.0), (2, 0, 10.0), (2, 1, 0.0)))
  }

  test("centroid is partition-count independent (exact merge)") {
    val base = (1 to 97).map(i => (0, Seq.tabulate(8)(d => (i * 0.013 + d).toFloat)))
    val a = Centroids.perLabel(base.toDF("label", "embedding").repartition(1))
      .as[(Int, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = Centroids.perLabel(base.toDF("label", "embedding").repartition(13))
      .as[(Int, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a === b) // bit-identical, not approximately equal
  }
}
