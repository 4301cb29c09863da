package graft

import org.apache.spark.sql.functions._

/** The reweight-not-remove contract of q_soft_dedup: every corpus
  * document keeps exactly one row, and each duplicate cluster's total
  * weight telescopes to one document-equivalent (10⁶ in fixed point,
  * up to the per-member rounding of round(10⁶/size)).
  */
class SoftDedupSpec extends SparkSpec {
  private lazy val rows = Registry.byName("q_soft_dedup")
    .fn(spark, "/root/testdata/sf0.001").cache()

  test("every document is weighted exactly once; singletons weigh 1.0") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(rows.count() === docs.count())
    assert(rows.select("doc_id").distinct().count() === docs.count())
    assert(rows.filter(col("csize") === 1 && col("w6") =!= 1000000L).isEmpty,
      "a singleton's weight must be exactly 10^6")
  }

  test("per-cluster weight mass telescopes to ~one document-equivalent") {
    val mass = rows.groupBy("cluster_id")
      .agg(sum(col("w6")).as("m"), count(lit(1)).as("n"))
    // members all carry round(1e6/n), so |n·round(1e6/n) − 1e6| ≤ n/2
    assert(mass.filter(abs(col("m") - 1000000L) > col("n") / 2 + 1).isEmpty,
      "a cluster's weight mass drifted from one document-equivalent")
    // the fixture has real multi-doc clusters — the test must not pass
    // vacuously on singletons alone
    assert(mass.filter(col("n") >= 3).count() > 0)
  }
}
