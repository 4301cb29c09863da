package graft

import org.apache.spark.sql.functions.col

/** q_html_extract's contract on the constructs that break naive
  * strippers — the DuckDB oracle proves engine parity; this spec pins
  * WHAT the extraction means on a known row. */
class HtmlExtractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("script/style/comment-aware strip: embedded tag-literals survive " +
      "their containers, entities decode once, counts are exact") {
    val row = graft.queries.TextQueries.qHtmlExtract.fn(spark, dir)
      .filter(col("doc_id") === 7).head()
    val clean = row.getAs[String]("text_clean")
    // the <style> body contains the STRING "</p>" — a greedy (or
    // dotall-less) style strip would either cut the document at that
    // point or leak css into the text
    assert(!clean.contains("content:"), s"style body leaked: $clean")
    assert(!clean.contains("track("), s"script body leaked: $clean")
    // the comment hides a tag-shaped <hidden> token — comment removal
    // must take it, not the tag stripper (which would leave "crawl id")
    assert(!clean.contains("crawl id"), s"comment leaked: $clean")
    // the <title>'s text survives (it is content, not markup), then the
    // h1 with its entity decoded exactly once (amp last)
    assert(clean.startsWith("Doc 7 Doc & 7"), clean.take(30))
    assert(clean.endsWith("more <info>"), clean.takeRight(30))
    // the document's own text rides between header and link
    assert(clean.contains(
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") === 7).head().getAs[String]("text")
        .trim.replaceAll("\\s+", " ").take(40)))
    assert(row.getAs[Long]("n_links") === 1L)
    // remaining tags after script/style/comment removal: html, head,
    // title, /title, /head, body, h1, /h1, p, /p, br/, a, /a, /body,
    // /html = 15
    assert(row.getAs[Long]("n_tags") === 15L)
  }
}
