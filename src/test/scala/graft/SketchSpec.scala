package graft

import graft.ops.Sketch

/** KMV cardinality sketch: exact fallback below k, bounded error above. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("groups with fewer than k distinct values estimate exactly") {
    val df = (0 until 10).map(i => ("small", s"v$i")) ++
      (0 until 10).flatMap(i => Seq(("dups", s"d${i % 3}")))
    val got = Sketch.kmvDistinct(df.toDF("g", "v"), "g", "v", k = 64)
      .as[(String, Double)].collect().toMap
    assert(got("small") === 10.0)
    assert(got("dups") === 3.0) // duplicates collapse before the sketch
  }

  test("k=64 estimate lands within 3 standard errors on 2000 distincts") {
    val df = (0 until 2000).map(i => ("big", s"value_$i")).toDF("g", "v")
    val est = Sketch.kmvDistinct(df, "g", "v", k = 64)
      .as[(String, Double)].head()._2
    // KMV relative stderr ≈ 1/sqrt(k-2) ≈ 12.7%; 3σ ≈ 38%
    assert(math.abs(est - 2000.0) / 2000.0 < 0.38,
      s"estimate $est too far from 2000")
  }

  test("sketches merge: minima of two halves re-capped == sketch of the whole") {
    val rows = (0 until 800).map(i => (s"g${i % 2}", s"v$i"))
    val whole = rows.toDF("g", "v")
    // arbitrary uneven split with overlap — merge must dedup shared values
    val partA = rows.filter(_._2.hashCode % 3 != 0) ++ rows.take(50)
    val partB = rows.filter(_._2.hashCode % 3 == 0) ++ rows.take(50)
    val k = 48
    val merged = Sketch.kmvMerge(
      Sketch.kmvMinima(partA.toDF("g", "v"), "g", "v", k),
      Sketch.kmvMinima(partB.toDF("g", "v"), "g", "v", k), "g", k)
    val estMerged = Sketch.kmvEstimate(merged, "g", k)
      .as[(String, Double)].collect().toMap
    val estWhole = Sketch.kmvDistinct(whole, "g", "v", k)
      .as[(String, Double)].collect().toMap
    assert(estMerged === estWhole) // exactly equal, not approximately
  }

  test("estimates are deterministic across runs and repartitionings") {
    val df = (0 until 500).map(i => (s"g${i % 2}", s"x$i")).toDF("g", "v")
    val a = Sketch.kmvDistinct(df, "g", "v", 32).collect().toSet
    val b = Sketch.kmvDistinct(df.repartition(13), "g", "v", 32)
      .collect().toSet
    assert(a === b) // order statistics don't care about partitioning
  }
}
