package graft

import org.apache.spark.sql.Row
import graft.queries.RetrievalQueries

/** BM25 scoring and RRF hybrid fusion vs in-memory models. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("spark", "join")

  /** Straight-line BM25 (BM25+ idf) over a token corpus — the model the
    * Spark plan must reproduce; k1/b come from RetrievalQueries so the
    * params have one source of truth. */
  private val k1 = RetrievalQueries.k1
  private val b = RetrievalQueries.b

  private def modelBm25(docs: Seq[(Long, String)]): Map[Long, Double] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
    }
    val n = docs.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfOf = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.map { case (id, ts) =>
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0 || dfOf(t) == 0) 0L
        else {
          val idf = math.log(1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
          val s = idf * tf * (k1 + 1) /
            (tf + k1 * ((1 - b) + b * ts.size / avgdl))
          math.round(s * 1e9)
        }
      }.sum / 1e9
      id -> (math.rint(score * 1e6) / 1e6)
    }.toMap
  }

  private val fixture = Seq(
    (0L, "spark join spark join spark"), // high tf, short
    (1L, "spark alpha beta gamma delta epsilon zeta eta theta iota"), // 1 hit, long
    (2L, "join spark other words here"),
    (3L, "nothing matches in this document at all"),
    (4L, "spark spark spark spark spark spark spark spark")) // saturating tf

  test("bm25Scored matches the in-memory model and ranks sanely") {
    val df = fixture.toDF("doc_id", "text")
    val got = RetrievalQueries.bm25Scored(df, "doc_id", "text", terms)
      .as[(Long, Double)].collect().toMap
    val want = modelBm25(fixture)
    // doc 3 has no query terms: absent from the scored frame entirely
    assert(!got.contains(3L))
    (want - 3L).foreach { case (id, s) =>
      assert(math.abs(got(id) - s) < 2e-6, s"doc $id: got ${got(id)} want $s")
    }
    // both-term docs beat the single-term long doc
    assert(got(0L) > got(1L) && got(2L) > got(1L))
    // tf saturation: 8 repeats must score < 8x a single occurrence's worth
    assert(got(4L) < 8 * got(1L))
  }

  test("property: bm25Scored equals the in-memory model on random corpora") {
    import org.scalacheck.{Gen, Prop}
    val word = Gen.oneOf("spark", "join", "alpha", "beta", "gamma", "delta")
    val doc = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    checkProp(Prop.forAllNoShrink(corpus) { docs =>
      val got = RetrievalQueries
        .bm25Scored(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
        .as[(Long, Double)].collect().toMap
      val want = modelBm25(docs).filter(_._2 != 0.0)
      got.keySet == want.keySet &&
        want.forall { case (id, s) => math.abs(got(id) - s) < 2e-6 }
    }, minTests = 15)
  }

  test("q_hybrid_rrf fuses ranks with 1/(60+r) and fills missing with 0") {
    val out = queries.RetrievalQueries.qHybridRrf
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val textRk = Option(r.getAs[Any]("text_rk")).map(_.toString.toInt)
      val vecRk = Option(r.getAs[Any]("vec_rk")).map(_.toString.toInt)
      val want = textRk.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
        vecRk.map(k => 1.0 / (60 + k)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - want) < 2e-6)
      assert(textRk.nonEmpty || vecRk.nonEmpty)
    }
    // output is rank-ordered by fused score desc
    val rrfs = out.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs == rrfs.sorted.reverse)
    // a document ranked by both modalities must outrank one ranked by a
    // single modality at an equal-or-worse position — RRF's defining
    // property; with 500 docs and top-50 lists overlap is guaranteed
    assert(out.exists(r => r.getAs[Any]("text_rk") != null &&
      r.getAs[Any]("vec_rk") != null))
  }
}
