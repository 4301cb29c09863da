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

  // The engine's content-defined cut predicate, re-derived locally so the
  // CDC tests can compute expected interior-chunk counts from first
  // principles instead of hardcoding magic numbers.
  private def isCut(tok: String): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(4), 16) % 8 == 0
  }
  // chunks strictly interior to a duplicated span survive any alignment:
  // between the first and last cut inside the span (exclusive of the
  // head chunk, whose text absorbs whatever precedes the span, and the
  // tail chunk, which absorbs whatever follows)
  private def interiorChunks(tokens: Seq[String]): Int = {
    val cuts = tokens.init.zipWithIndex.collect { case (t, i) if isCut(t) => i }
    math.max(0, cuts.size - 1)
  }

  test("MEASURED: fixed blocks miss a misaligned duplicated span that " +
      "content-defined chunks catch (VERDICT r11 #7)") {
    // A 40-token span duplicated in two docs at different offsets
    // (0 vs 3 tokens mod 8). Fixed 8-token grids cut it at different
    // internal alignments, so NO block text matches across the docs —
    // the miss is structural, not a tuning issue. Content-defined
    // boundaries travel with the tokens, so the span's interior chunks
    // are identical in both carriers and get removed.
    val spanToks = (1 to 40).map(i => s"dup$i")
    val nInterior = interiorChunks(spanToks)
    assert(nInterior >= 2, s"fixture too weak: $nInterior interior chunks")
    val span = spanToks.mkString(" ")
    val pair = Seq(
      (1L, s"$span ${u("p")}"),                      // span at offset 0
      (2L, s"pre1 pre2 pre3 $span ${u("q")}"))       // span at offset 3
      .toDF("doc_id", "text")
    val block = TextQueries.spanDedup(pair, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the recorded negative result: block granularity removes NOTHING
    assert(block === Map(1L -> 0L, 2L -> 0L),
      s"fixed blocks unexpectedly caught the misaligned span: $block")
    val cdc = TextQueries.spanDedupCdc(pair, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cdc.values.forall(_ >= nInterior),
      s"CDC chunks must catch the span's $nInterior interior chunks in " +
        s"both carriers: $cdc")
    // and CDC keeps unique content: the per-doc fillers survive
    val keptTexts = TextQueries.spanDedupCdc(pair, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(keptTexts(1L).contains("p1") && keptTexts(2L).contains("q1"))
  }

  test("CDC dedup detects a span's interior chunks at EVERY alignment " +
      "of the other carrier") {
    val spanToks = (1 to 32).map(i => s"sh$i")
    val nInterior = interiorChunks(spanToks)
    assert(nInterior >= 2, s"fixture too weak: $nInterior interior chunks")
    val span = spanToks.mkString(" ")
    def corpusWithOffset(off: Int) = Seq(
      (1L, s"$span ${u("p")}"),
      (2L, ((1 to off).map(i => s"x$i") :+ span).mkString(" ") +
        s" ${u("q")}")).toDF("doc_id", "text")
    val removedPerOffset = (0 to 7).map { off =>
      TextQueries.spanDedupCdc(corpusWithOffset(off), "doc_id", "text")
        .filter(col("doc_id") === 1L)
        .collect().head.getLong(2)
    }
    // doc 1 never moves: its interior span chunks are removed whatever
    // doc 2's alignment is. The HEAD chunk may additionally match when
    // doc 2's prefix happens to end on a content-defined boundary — that
    // is correct CDC behavior (the head chunk's text genuinely recurs),
    // so the pin is interior ≤ removed ≤ interior + 1, with the lower
    // bound the alignment-robustness claim itself.
    assert(removedPerOffset.forall(r => r >= nInterior && r <= nInterior + 1),
      s"expected $nInterior(+1) removed at every offset: $removedPerOffset")
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
