package graft

import org.apache.spark.sql.functions._
import graft.ops.HashEmbed

/** q_rerank_model's engine-side checks (the gate oracle is the
  * cross-engine one): the trained mean-difference discriminant must
  * separate its own training classes IN AGGREGATE — a provable identity,
  * not a statistical hope — and the query featurizer must drop OOV terms
  * rather than invent weights for them. */
class RerankSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_rerank_model returns a rank-ordered top-10 drawn from the " +
      "shortlist") {
    val out = queries.RetrievalQueries.qRerankModel.fn(spark, dir).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Int]("rk")).toSeq == (1 to 10))
    val scores = out.map(_.getAs[Long]("score_fp")).toSeq
    assert(scores == scores.sorted.reverse, "reranked order must follow score")
    out.foreach { r =>
      assert(r.getAs[Int]("base_rk") >= 1, "every hit must carry its base rank")
      assert(Set(0L, 1L).contains(r.getAs[Long]("label_kw")))
    }
  }

  test("discriminant identity: nn*sum(pos scores) - np*sum(neg scores) >= 0 " +
      "over the FULL shortlist (every term w_k*raw_k is >= 0 by the floor " +
      "construction)") {
    val all = queries.RetrievalQueries.rerankScored(spark, dir).collect()
    val (pos, neg) = all.partition(_.getAs[Long]("label_kw") == 1L)
    assert(pos.nonEmpty && neg.nonEmpty,
      "both pseudo-label classes must be populated on the fixture")
    val np = pos.length.toLong
    val nn = neg.length.toLong
    val lhs = nn * pos.map(_.getAs[Long]("score_fp")).sum -
      np * neg.map(_.getAs[Long]("score_fp")).sum
    assert(lhs >= 0L,
      s"trained model fails to separate its training classes: $lhs")
    // and the model is not degenerate — somebody scored nonzero
    assert(all.exists(_.getAs[Long]("score_fp") != 0L))
  }

  test("queryVector drops OOV terms: adding a corpus-absent word changes " +
      "nothing") {
    val docs = Tables.documents(spark, dir)
    val idf = HashEmbed.idf3Frame(docs, "doc_id", "text")
    def vec(q: String): Map[Long, Long] =
      HashEmbed.queryVector(spark, idf, q).collect()
        .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("qval")).toMap
    val base = vec("vector join")
    assert(base.nonEmpty, "corpus-present terms must produce components")
    // zzqx is OOV as a unigram AND poisons its bigrams into OOV too, so
    // only the surviving original unigrams contribute
    val uni = vec("vector")
    val poisoned = vec("vector zzqxunseenword")
    assert(poisoned == uni,
      "an OOV word must contribute nothing beyond the surviving unigrams")
  }

  test("sparseWithIdf on a restricted frame keeps corpus-wide weights") {
    val docs = Tables.documents(spark, dir)
    val idf = HashEmbed.idf3Frame(docs, "doc_id", "text")
    val someIds = docs.select("doc_id").orderBy("doc_id").limit(5)
    val restricted = HashEmbed.sparseWithIdf(
      docs.join(broadcast(someIds), "doc_id"), "doc_id", "text", idf)
    val full = HashEmbed.sparse(docs, "doc_id", "text")
      .join(broadcast(someIds), "doc_id")
    val a = restricted.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("dim")) -> r.getAs[Long]("val"))
      .toMap
    val b = full.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("dim")) -> r.getAs[Long]("val"))
      .toMap
    assert(a == b, "restricting the featurized frame must not move df/idf")
  }
}
