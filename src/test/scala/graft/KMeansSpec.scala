package graft

import org.apache.spark.sql.functions._
import graft.ops.{KMeans, Vectors}
import graft.expressions.FixedPointDot.scaledRound

/** The IVF coarse quantizer's contracts that the DuckDB oracle exercises
  * only end-to-end: deterministic training, bounded codebook, and
  * assignment == the driver-side argmin oracle. */
class KMeansSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def base = {
    val e = Tables.embeddings(spark, dir)
    e.select(col("vec_id"), Vectors.toDoubleArr(col("embedding")).as("v"))
  }

  test("training is deterministic and the codebook is bounded") {
    val cb1 = KMeans.train(base, k = 8, iters = 2)
    val cb2 = KMeans.train(base, k = 8, iters = 2)
    assert(cb1 === cb2, "two identical training runs diverged")
    assert(cb1.size <= 8 && cb1.nonEmpty)
    assert(cb1.map(_._1).distinct.size === cb1.size, "duplicate cell ids")
    assert(cb1.forall(_._2.size === 64), "centroid dimensionality")
  }

  test("iterations change the codebook from the raw seeds") {
    val seeds = KMeans.train(base, k = 8, iters = 0)
    val trained = KMeans.train(base, k = 8, iters = 2)
    assert(seeds !== trained, "Lloyd iterations were a no-op")
  }

  test("assignCell matches a driver-side fixed-point argmin oracle") {
    val cb = KMeans.train(base, k = 8, iters = 2)
    val got = base.withColumn("cell", KMeans.assignCell(col("v"), cb))
      .collect().map(r =>
        (r.getAs[Number]("vec_id").longValue, r.getSeq[Double](1), r.getInt(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, v, cell) =>
      val want = cb.map { case (cl, c) =>
        val dcc = c.map(x => scaledRound(x * x)).sum
        val dot = v.zip(c).map { case (a, b) => scaledRound(a * b) }.sum
        (dcc - 2 * dot, cl)
      }.min._2
      assert(cell === want, s"vec $id: engine cell $cell, oracle $want")
    }
  }

  test("sampled training is deterministic and assignment still covers all") {
    val cb1 = KMeans.train(base, k = 4, iters = 2, trainPermille = 500)
    val cb2 = KMeans.train(base, k = 4, iters = 2, trainPermille = 500)
    assert(cb1 === cb2 && cb1.nonEmpty && cb1.size <= 4)
    // the full corpus assigns against the sample-trained codebook
    val assigned = base.withColumn("cell", KMeans.assignCell(col("v"), cb1))
    assert(assigned.filter(col("cell").isNull).isEmpty)
    assert(assigned.count() === base.count())
  }

  test("codegen'd NearestCells kernel == struct-argmin formulation at 45 cells") {
    // the √n-cells production shape is where the struct formulation fell
    // out of codegen — pin the two argmins bit-equal at that scale, on a
    // codebook with holes (dropped cells) so the id tie-break contract is
    // exercised off the dense 0..k-1 path
    val cb = KMeans.train(base, k = 45, iters = 2)
    val both = base
      .withColumn("fast", KMeans.assignCell(col("v"), cb))
      .withColumn("slow", KMeans.assignCellStructs(col("v"), cb))
    assert(both.filter(col("fast") =!= col("slow")).isEmpty,
      "codegen'd kernel diverged from the struct argmin")
    // probe order too: nprobe=4 against a driver-side sorted oracle
    val got = base.withColumn("probes", KMeans.probeCells(col("v"), cb, 4))
      .collect().map(r => (r.getSeq[Double](1), r.getSeq[Int](2)))
    got.foreach { case (v, probes) =>
      val want = cb.map { case (cl, c) =>
        val dcc = c.map(x => scaledRound(x * x)).sum
        val dot = v.zip(c).map { case (a, b) => scaledRound(a * b) }.sum
        (dcc - 2 * dot, cl)
      }.sorted.take(4).map(_._2)
      assert(probes === want)
    }
  }

  test("probeCells returns nearest-first distinct cells, head == assignCell") {
    val cb = KMeans.train(base, k = 8, iters = 2)
    val rows = base
      .withColumn("probes", KMeans.probeCells(col("v"), cb, 3))
      .withColumn("cell", KMeans.assignCell(col("v"), cb))
      .collect().map(r => (r.getSeq[Int](2), r.getInt(3)))
    rows.foreach { case (probes, cell) =>
      assert(probes.size === 3)
      assert(probes.head === cell, "first probe must be the assigned cell")
      assert(probes.distinct.size === probes.size)
    }
  }
}
