package graft

import graft.ops.HeavyHitters
import graft.ops.HeavyHitters.MgBuf

/** Two-pass Misra–Gries heavy hitters: sketch guarantees (no overcount,
  * n/(m+1) undercount, heavy-key superset) checked against exact local
  * counts, and the end-to-end result's exactness + partition invariance —
  * the property that makes the final answer trustworthy even though the
  * sketch itself varies with partitioning.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: a few hot keys, a medium tier, a long unique tail —
    * deterministic, and reshuffled deterministically so hot keys are not
    * adjacent (adjacency makes MG look artificially good). */
  private def zipfStream: Seq[String] = {
    val raw = Seq.fill(300)("hot_a") ++ Seq.fill(250)("hot_b") ++
      Seq.fill(200)("hot_c") ++
      (0 until 40).flatMap(i => Seq.fill(10)(s"mid_$i")) ++
      (0 until 850).map(i => s"cold_$i")
    raw.zipWithIndex.sortBy { case (k, i) => (i * 7919) % raw.length }
      .map(_._1)
  }

  private def sketchOf(xs: Seq[String], m: Int): MgBuf = {
    val agg = HeavyHitters.mgSketch(m)
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
  }

  test("MG never overcounts, undercounts at most n/(m+1), and carries exact n") {
    val xs = zipfStream
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (m <- Seq(8, 16, 64)) {
      val sk = sketchOf(xs, m)
      assert(sk.n === xs.length.toLong, "sketch must carry the exact total")
      val est = sk.counts
      assert(est.size <= m)
      est.foreach { case (k, e) =>
        assert(e <= truth(k), s"m=$m overcounted $k: $e > ${truth(k)}")
        assert(truth(k) - e <= xs.length.toLong / (m + 1),
          s"m=$m undercount bound broken for $k")
      }
    }
  }

  test("every key above n/(m+1) survives the sketch, across any merge tree") {
    val xs = zipfStream
    val n = xs.length
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = 16
    val heavies = truth.filter { case (_, c) => c > n.toLong / (m + 1) }.keySet
    assert(heavies.nonEmpty, "fixture must have true heavies")
    // single pass
    assert(heavies.subsetOf(sketchOf(xs, m).counts.keySet))
    // merged from uneven chunks, left fold and balanced pairs
    val agg = HeavyHitters.mgSketch(m)
    val chunks = xs.grouped(137).toSeq
      .map(c => c.foldLeft(agg.zero)(agg.reduce))
    val leftFold = agg.finish(chunks.reduceLeft(agg.merge))
    assert(leftFold.n === n.toLong, "merge must sum exact totals")
    assert(heavies.subsetOf(leftFold.counts.keySet),
      "left-fold merge lost a heavy")
    def tree(bs: Seq[MgBuf]): MgBuf =
      if (bs.size == 1) bs.head
      else tree(bs.grouped(2).map(_.reduce(agg.merge)).toSeq)
    assert(heavies.subsetOf(agg.finish(tree(chunks)).counts.keySet),
      "balanced-tree merge lost a heavy")
  }

  test("two-pass result is exact and partition-invariant") {
    val xs = zipfStream
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // n = 2000, threshold n/9 ≈ 222.2: hot_a (300) and hot_b (250)
    // qualify, hot_c (200) does not — two heavies plus a near-miss
    val k = 9
    val expect = truth.filter { case (_, c) => c > xs.length.toDouble / k }
    val results = Seq(1, 13).map { parts =>
      HeavyHitters.heavyHitters(
        xs.toDF("key").repartition(parts), "key", m = 16, k = k)
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    }
    assert(results(0) === results(1), "partitioning changed the answer")
    assert(results(0).map(t => t._1 -> t._2).toMap === expect)
    assert(expect.nonEmpty, "fixture must produce at least one heavy key")
  }

  test("empty input and the m >= K guard") {
    val empty = HeavyHitters.heavyHitters(
      Seq.empty[String].toDF("key"), "key", m = 8, k = 4)
    assert(empty.count() === 0)
    assertThrows[IllegalArgumentException] {
      HeavyHitters.heavyHitters(Seq("a").toDF("key"), "key", m = 3, k = 4)
    }
  }

  test("NULL keys are excluded from counts and from the total") {
    // 6 nulls + 4 "a" + 2 "b": with nulls excluded n=6, threshold n/3=2 —
    // "a" qualifies, "b" (=2, not >2) does not; counting nulls toward the
    // total (n=12, threshold 4) would wrongly drop "a" too
    val df = (Seq.fill(6)(null: String) ++ Seq.fill(4)("a") ++
      Seq.fill(2)("b")).toDF("key")
    val got = HeavyHitters.heavyHitters(df, "key", m = 8, k = 3)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("a", 4L, 0.666667)))
  }
}
