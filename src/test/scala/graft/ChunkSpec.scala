package graft

import org.scalacheck.{Gen, Prop}
import graft.ops.Chunk

/** V1/V4 chunker: offset contract, overlap, coverage property. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, maxLen: Int, overlap: Int): Seq[(Long, String)] =
    Chunk.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      maxLen, overlap)
      .select("chunk_idx", "chunk").as[(Long, String)].collect().toSeq
      .sortBy(_._1)

  test("short text yields a single whole-text chunk") {
    assert(chunksOf("hello", 120, 30) === Seq((0L, "hello")))
  }

  test("empty text yields one empty chunk") {
    assert(chunksOf("", 120, 30) === Seq((0L, "")))
  }

  test("overlapping chunks: stride maxLen-overlap, shared tail/head") {
    val text = "a" * 100 + "b" * 100
    val out = chunksOf(text, 120, 30) // stride 90
    assert(out === Seq((0L, text.substring(0, 120)), (1L, text.substring(90))))
    assert(out(0)._2.takeRight(30) === out(1)._2.take(30))
  }

  test("redundant tail already covered by previous chunk is not emitted") {
    // len 200, stride 90: offset 180 satisfies 180 >= 200-30 → dropped
    val out = chunksOf("x" * 200, 120, 30)
    assert(out.map(_._1) === Seq(0L, 1L))
  }

  test("property: chunks concatenated with overlap removed rebuild the text") {
    val gen = for {
      n <- Gen.choose(0, 400)
      s <- Gen.stringOfN(n, Gen.alphaNumChar)
    } yield s
    checkProp(Prop.forAllNoShrink(gen) { text =>
      val out = chunksOf(text, 120, 30)
      val rebuilt = out.zipWithIndex.map { case ((_, c), i) =>
        if (i == 0) c else c.drop(30)
      }.mkString
      // every chunk except possibly the last is exactly maxLen
      rebuilt == text && out.dropRight(1).forall(_._2.length == 120)
    }, minTests = 10)
  }
}
