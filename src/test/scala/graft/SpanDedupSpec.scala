package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Semantic pins for corpus-level span dedup (q_span_dedup) that the
  * oracle's hash-compare can't express directly: the dedup INVARIANTS on
  * a corpus built to exercise them. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 8-token blocks (TextQueries.spanLen); b1/b2 are shared boilerplate,
  // u* are unique filler. Block boundaries are position-aligned, so doc C
  // carrying b1 at a DIFFERENT block slot still matches A's copy — span
  // dedup is content-keyed, not offset-keyed.
  private val b1 = (1 to 8).map(i => s"nav$i").mkString(" ")
  private val b2 = (1 to 8).map(i => s"foot$i").mkString(" ")
  private def u(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")

  private lazy val docs = Seq(
    (1L, s"$b1 ${u("a")} $b2"),          // boilerplate head + foot
    (2L, s"${u("b")} $b1 $b2"),          // same blocks, other slots
    (3L, s"${u("c")} ${u("d")}"),        // fully unique
    (4L, b1),                            // nothing but boilerplate
    (5L, s"${u("e")}")                   // single unique block
  ).toDF("doc_id", "text")

  private lazy val out =
    TextQueries.spanDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("cross-document duplicate blocks are removed from every carrier") {
    assert(out(1L) === ((3L, 2L, u("a"))))
    assert(out(2L) === ((3L, 2L, u("b"))))
  }

  test("unique content is untouched; fully-boilerplate docs survive empty") {
    assert(out(3L) === ((2L, 0L, s"${u("c")} ${u("d")}")))
    assert(out(4L) === ((1L, 1L, "")))
    assert(out(5L) === ((1L, 0L, u("e"))))
  }

  test("no surviving block text occurs in two or more documents") {
    val kept = TextQueries.spanDedup(docs, "doc_id", "text")
      .select(col("doc_id"), explode(split(col("kept_text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // survivor tokens regroup into the original 8-token blocks only if
    // dedup kept whole blocks; check at token granularity: every kept
    // token family (prefix) appears in exactly one doc
    val fams = kept.withColumn("fam", regexp_replace(col("tok"), "\\d+$", ""))
      .groupBy("fam").agg(countDistinct(col("doc_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fams.values.forall(_ == 1L), s"shared family survived: $fams")
  }

  test("within-document repetition alone is NOT removed (needs 2+ docs)") {
    val solo = Seq((1L, s"$b1 $b1"), (2L, u("z"))).toDF("doc_id", "text")
    val r = TextQueries.spanDedup(solo, "doc_id", "text")
      .filter(col("doc_id") === 1L).collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 0L,
      "a block repeated only inside one document must survive")
  }

  test("differential fuzz: engine output equals the in-memory model") {
    import org.scalacheck.{Gen, Prop}
    // documents are sequences of aligned 8-token blocks: a small shared
    // pool (forces cross-document collisions) mixed with per-draw unique
    // fillers — the model computes dedup by definition, the engine must
    // match it exactly on every random corpus
    val pool = (0 until 5).map(i => (1 to 8).map(j => s"p${i}x$j").mkString(" "))
    var uid = 0
    val uniqueBlock = Gen.delay {
      uid += 1; Gen.const((1 to 8).map(j => s"u${uid}x$j").mkString(" "))
    }
    val genDoc = for {
      n <- Gen.choose(1, 5)
      blocks <- Gen.listOfN(n,
        Gen.frequency(3 -> Gen.oneOf(pool), 2 -> uniqueBlock))
    } yield blocks
    val genCorpus = Gen.choose(2, 10).flatMap(k => Gen.listOfN(k, genDoc))
    checkProp(Prop.forAllNoShrink(genCorpus) { corpus =>
      val dupSet = corpus.zipWithIndex
        .flatMap { case (bs, i) => bs.distinct.map(_ -> i) }
        .groupBy(_._1).collect { case (b, cs) if cs.size >= 2 => b }.toSet
      val expected = corpus.zipWithIndex.map { case (bs, i) =>
        i.toLong -> ((bs.size.toLong, bs.count(dupSet).toLong,
          bs.filterNot(dupSet).mkString(" ")))
      }.toMap
      val docs = corpus.zipWithIndex
        .map { case (bs, i) => (i.toLong, bs.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextQueries.spanDedup(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      got == expected
    }, minTests = 15)
  }
}
