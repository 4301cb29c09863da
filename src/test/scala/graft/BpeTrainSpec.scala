package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** The iterative BPE trainer's greedy-application contract, pinned on
  * corpora the shipped documents table does not exercise: overlapping
  * pair runs (where count ≠ application count) and merges of merged
  * tokens. The correctness gate (q_bpe_train vs the unrolled-CTE oracle)
  * checks engine≡oracle; these tests check both against the BPE
  * semantics themselves. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private val S1 = ""
  private val S2 = ""
  private val GL = ""

  private def corpusOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        concat(lit(S1),
          array_join(split(trim(lower(col("text"))), "\\s+"), S2 + S1),
          lit(S2)).as("s"))

  private def toksOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.orderBy("doc_id").select(TextQueries.bpeToks(col("s")))
      .collect().toIndexedSeq.map(_.getSeq[String](0))

  test("greedy left-to-right: overlapping runs merge non-overlapping") {
    // "a a a a a": pair (a,a) counts 4 (adjacent positions, overlaps
    // included — the standard BPE count), but greedy application merges
    // positions (1,2) and (3,4) only: [aa, aa, a]
    val (merges, out) = TextQueries.bpeTrain(corpusOf("a a a a a"), 1)
    assert(merges.map(m => (m.rk, m.pa, m.pb, m.cnt, m.toks_after)) ===
      Seq((1, "a", "a", 4L, 3L)))
    assert(toksOf(out) === Seq(Seq(s"a${GL}a", s"a${GL}a", "a")))
    out.unpersist()
  }

  test("merged tokens merge again; rules apply in later rounds' counts") {
    // round 1: (x,y) count 3 beats (y,x) count 2 -> [xy, xy, xy]
    // round 2: (xy,xy) count 2, greedy -> [xyxy, xy]
    val (merges, out) = TextQueries.bpeTrain(corpusOf("x y x y x y"), 2)
    assert(merges(0).pa === "x" && merges(0).pb === "y" &&
      merges(0).cnt === 3L && merges(0).toks_after === 3L)
    assert(merges(1).pa === s"x${GL}y" && merges(1).pb === s"x${GL}y" &&
      merges(1).cnt === 2L && merges(1).toks_after === 2L)
    assert(toksOf(out) === Seq(Seq(s"x${GL}y${GL}x${GL}y", s"x${GL}y")))
    out.unpersist()
  }

  test("tie-break: equal counts choose the lexicographically least pair") {
    // (b,c) and (a,b)... each pair appears once; (a,b) < (b,c)
    val (merges, out) = TextQueries.bpeTrain(corpusOf("a b", "b c"), 1)
    assert(merges.head.pa === "a" && merges.head.pb === "b")
    out.unpersist()
  }

  test("toks_after audits the application: drop == applications, not count") {
    val (merges, out) = TextQueries.bpeTrain(
      corpusOf("a a a", "a a a a"), 1)
    // counts: (a,a) appears 2 + 3 = 5 times; applications: 1 + 2 = 3;
    // tokens before = 7, after = 7 - 3 = 4
    assert(merges.head.cnt === 5L && merges.head.toks_after === 4L)
    out.unpersist()
  }

  test("shipped-corpus invariant: counts non-increasing, audit telescopes") {
    val (merges, out) = TextQueries.bpeTrain(
      TextQueries.bpeCorpus0(spark, "/root/testdata/sf0.001"), 4)
    assert(merges.map(_.cnt) === merges.map(_.cnt).sorted.reverse)
    val before = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(sum(size(split(trim(lower(coalesce(col("text"), lit("")))),
        "\\s+")))).head().getLong(0)
    // each round's toks_after = previous count minus that round's
    // APPLICATIONS; applications ≤ chosen-pair count always
    val afters = merges.map(_.toks_after)
    val drops = (before +: afters).sliding(2).map(w => w(0) - w(1)).toSeq
    assert(drops.zip(merges.map(_.cnt)).forall { case (d, c) =>
      d >= 1 && d <= c })
    out.unpersist()
  }

  test("subword trainer's 4M dictionary cap refuses loudly at the boundary") {
    TextQueries.requireSubwordDictCap(0)
    TextQueries.requireSubwordDictCap(TextQueries.subwordDictCap)
    val e = intercept[IllegalArgumentException] {
      TextQueries.requireSubwordDictCap(TextQueries.subwordDictCap + 1)
    }
    assert(e.getMessage.contains("4M driver-side training cap"))
  }
}
