package graft.queries

import org.apache.spark.sql.functions._

/** The composed ANN rung — IVF candidate cutting × SQ integer scoring —
  * against its float-scored twin: same candidate cells, so the two may
  * differ only where quantization flips a near-tie inside a cell. */
class AnnSqComposeSpec extends graft.SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("SQ-scored IVF tracks float-scored IVF: agreement and score error") {
    val fl = SimilarityQueries.annIvf(spark, dir, 2)
      .select(col("query_id"), col("nbr_id"), col("score").as("exact"))
    val sq = SimilarityQueries.annIvfSq(spark, dir, 2)
      .select(col("query_id"), col("nbr_id"), col("score").as("approx"))
    val nPos = fl.count()
    assert(nPos > 0)
    val agreed = fl.join(sq, Seq("query_id", "nbr_id"))
    val agreement = agreed.count().toDouble / nPos
    assert(agreement >= 0.8, s"composed-rung agreement $agreement below 0.8")
    val maxErr = agreed
      .agg(max(abs(col("approx") - col("exact")))).head().getDouble(0)
    assert(maxErr < 0.01, s"SQ-vs-float IVF score error $maxErr exceeds 0.01")
  }

  test("composed rung returns exactly top-3 per query, ranks contiguous") {
    val sq = SimilarityQueries.annIvfSq(spark, dir, 2)
    val byQ = sq.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("maxrk"),
        min(col("rk")).as("minrk"))
    assert(byQ.filter(col("n") =!= col("maxrk") || col("minrk") =!= 1).isEmpty,
      "ranks not contiguous from 1")
    assert(byQ.filter(col("n") > 3).isEmpty, "more than k=3 rows for a query")
  }
}
