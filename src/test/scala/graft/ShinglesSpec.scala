package graft

import graft.ops.Shingles

/** Shingling / MinHash / SimHash building blocks. */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("shingles3: n-2 distinct 3-grams, <3 tokens yields none") {
    val df = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val out = Shingles.shingles3(df, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a b c"), (1L, "b c d"), (1L, "c d e")))
  }

  test("shingles3 deduplicates repeated shingles") {
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = Shingles.shingles3(df, "doc_id", "text").count()
    assert(out === 2) // "a b a" and "b a b"
  }

  test("identical docs share the full MinHash signature") {
    val df = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text")
    val m = Shingles.minhash(Shingles.shingles3(df, "doc_id", "text"),
      "doc_id", 8).drop("doc_id").distinct()
    assert(m.count() === 1)
  }

  test("bands4x2 emits 4 bands whose signatures pair adjacent hashes") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bands = Shingles.bands4x2(
      Shingles.minhash(Shingles.shingles3(df, "doc_id", "text"), "doc_id", 8),
      "doc_id")
    val rows = bands.as[(Long, Int, String)].collect()
    assert(rows.map(_._2).sorted === Array(0, 1, 2, 3))
    assert(rows.forall(_._3.length === 64)) // two 32-char md5 hex strings
  }

  test("simhash16: in [0, 65536), identical docs identical hash") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val out = Shingles.simhash16(Shingles.tokens(df, "doc_id", "text"),
      "doc_id").as[(Long, Long)].collect().toMap
    assert(out(1L) === out(2L))
    assert(out.values.forall(h => h >= 0 && h < 65536))
  }
}
