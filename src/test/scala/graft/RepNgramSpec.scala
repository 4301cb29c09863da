package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Repeated-n-gram repetition scoring on crafted documents: hand-computed
  * ratios, the short-doc/empty/NULL degenerate shapes, tokenizer
  * normalization, and the keep/drop boundary landing on <= . */
class RepNgramSpec extends SparkSpec {
  import spark.implicits._

  private def score(rows: Seq[(Long, String)]) =
    TextQueries.repNgram(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("hand-computed ratios and verdicts") {
    val got = score(Seq(
      1L -> "a a a a",             // bi 2/3 rep, tri 1/2 rep -> drop
      2L -> "one two three four",  // all distinct -> keep
      3L -> "x",                   // too short for any n-gram
      4L -> "a b a b c d"))        // bi 1/5 = 0.2 boundary, tri 0 -> keep
    assert(got(1L) === ((4L, 0.666667, 0.5, "drop")))
    assert(got(2L) === ((4L, 0.0, 0.0, "keep")))
    assert(got(3L) === ((1L, 0.0, 0.0, "keep")))
    assert(got(4L) === ((6L, 0.2, 0.0, "keep")))
  }

  test("lowercasing and whitespace runs normalize before scoring") {
    // "The the\tTHE" tokenizes to three equal tokens: rep2 = 1/2
    val got = score(Seq(10L -> "The the\tTHE"))
    assert(got(10L) === ((3L, 0.5, 0.0, "drop")))
  }

  test("NULL and empty text score like a single empty token") {
    val got = score(Seq(20L -> null, 21L -> "", 22L -> "   "))
    for (id <- Seq(20L, 21L, 22L))
      assert(got(id) === ((1L, 0.0, 0.0, "keep")), s"doc $id")
  }

  test("no shuffle in the plan (pure projection over the scan)") {
    val df = TextQueries.repNgram(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
