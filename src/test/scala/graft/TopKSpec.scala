package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TopK

/** The custom TopKPerGroup operator vs the window formulation: identical
  * rows, and the custom plan actually appears in the physical plan. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def mkSample: DataFrame = (1 to 500).map { i =>
    (s"g${i % 7}", (i * 37) % 101, i.toLong)
  }.toDF("g", "score", "id")

  private def custom(df: DataFrame, k: Int): DataFrame =
    TopK.perGroup(df, Seq(df("g")),
      Seq(df("score") -> true, df("id") -> false), k)

  test("matches row_number window semantics exactly (with ties)") {
    val df = mkSample
    val got = custom(df, 5).select("g", "rk", "score", "id")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val expected = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select("g", "rk", "score", "id")
    assert(got.count() === expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("k larger than group size returns whole groups, ranked") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "v")
    val out = TopK.perGroup(df, Seq(df("g")), Seq(df("v") -> true), 10)
      .select("g", "rk", "v").as[(String, Int, Long)].collect().toSet
    assert(out === Set(("a", 1, 2L), ("a", 2, 1L), ("b", 1, 9L)))
  }

  test("physical plan uses the custom operator and shuffles pruned rows") {
    val plan = custom(mkSample, 3).queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK") && plan.contains("LocalTopK"))
    assert(plan.contains("Exchange hashpartitioning(g"))
  }

  test("empty grouping = global top-k (k rows total, not per partition)") {
    val df = mkSample.repartition(11)
    val out = TopK.perGroup(df, Seq.empty,
        Seq(df("score") -> true, df("id") -> false), 5)
      .select("rk", "score", "id").as[(Int, Int, Long)].collect()
      .sortBy(_._1).toSeq
    val expected = mkSample.orderBy(col("score").desc, col("id").asc)
      .limit(5).select("score", "id").as[(Int, Long)].collect()
      .zipWithIndex.map { case ((s, i), r) => (r + 1, s, i) }.toSeq
    assert(out === expected)
  }

  test("result is partition-count independent") {
    def run(parts: Int): Seq[(String, Int, Long)] =
      custom(mkSample.repartition(parts), 4)
        .select("g", "rk", "id").as[(String, Int, Long)]
        .collect().sorted.toSeq
    assert(run(1) === run(17))
  }
}
