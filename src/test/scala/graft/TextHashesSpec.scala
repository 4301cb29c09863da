package graft

import org.apache.spark.sql.functions._
import graft.ops.Shingles

/** The one-pass projection expressions must be bit-identical to the
  * explode+aggregate formulations they replace in the hot paths (the
  * aggregations remain the oracle's mirror, so this equality is what
  * carries the oracle guarantee over to the expression path). */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
  }

  test("MinHashSlicedExpr == shingle-explode + groupBy minima, doc for doc") {
    val viaAgg = Shingles.minhashSliced(
        Shingles.shingles3All(corpus, "doc_id", "text"), "doc_id")
      .select(col("doc_id"), array((0 until 8).map(i => col(s"h$i")): _*)
        .as("s8"))
    val wtok = split(trim(col("text")), "\\s+")
    val viaExpr = corpus
      .select(col("doc_id"), Shingles.minhashSlicedCol(wtok).as("s8"))
      .filter(col("s8").isNotNull)
    assert(viaAgg.count() === viaExpr.count())
    assert(viaAgg.except(viaExpr).isEmpty && viaExpr.except(viaAgg).isEmpty)
  }

  test("SimHash64Expr == 64-sum aggregation, doc for doc") {
    val viaAgg = Shingles.simhashChunks64(
        Shingles.tokens(corpus, "doc_id", "text"), "doc_id")
      .select(col("doc_id"),
        array(col("c0"), col("c1"), col("c2"), col("c3")).as("ch"))
    val wtok = split(trim(col("text")), "\\s+")
    val viaExpr = corpus
      .select(col("doc_id"), Shingles.simhash64Col(wtok).as("ch"))
    assert(viaAgg.count() === viaExpr.count())
    assert(viaAgg.except(viaExpr).isEmpty && viaExpr.except(viaAgg).isEmpty)
  }

  test("under-3-token docs get a null signature, not a garbage one") {
    val df = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val wtok = split(trim(col("text")), "\\s+")
    val out = df.select(col("doc_id"),
        Shingles.minhashSlicedCol(wtok).as("s8"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).exists(s => s.size == 8 && s.forall(_.length == 8)))
  }

  test("expression survives both codegen and interpreted evaluation") {
    val df = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val wtok = split(trim(col("text")), "\\s+")
    val withExpr = df.select(Shingles.minhashSlicedCol(wtok).as("s8"),
      Shingles.simhash64Col(wtok).as("ch"))
    val codegen = withExpr.collect()(0)
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = withExpr.collect()(0)
      assert(codegen.getSeq[String](0) === interp.getSeq[String](0))
      assert(codegen.getSeq[Long](1) === interp.getSeq[Long](1))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
