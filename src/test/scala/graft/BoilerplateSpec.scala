package graft

import org.apache.spark.sql.functions._

/** q_boilerplate's contract: the corpus-frequent paragraphs (the
  * per-source header, the global footer) drop; each document's own body
  * survives and reassembles in original order. */
class BoilerplateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("headers and footer drop, bodies survive, order is preserved") {
    val out = graft.queries.CurationQueries.qBoilerplate.fn(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val joined = out.join(docs, "doc_id").collect()
    assert(joined.length === docs.count())
    for (r <- joined) {
      val kept = r.getAs[String]("text_kept")
      assert(!kept.contains("all rights reserved"),
        s"doc ${r.getAs[Long]("doc_id")}: header survived")
      assert(!kept.contains("terms of service"),
        s"doc ${r.getAs[Long]("doc_id")}: footer survived")
      // header + footer are always boilerplate at this corpus's source
      // counts; the body drops too ONLY for a >=threshold dup family
      assert(r.getAs[Long]("n_dropped") >= 2L)
      if (r.getAs[Long]("n_dropped") == 2L)
        assert(kept === r.getAs[String]("text"),
          s"doc ${r.getAs[Long]("doc_id")}: body mangled")
    }
    // the corpus's biggest exact-dup family sits under the threshold, so
    // at sf0.001 every body must survive — if this ever flips, the
    // fixture changed, not the operator
    assert(joined.forall(_.getAs[Long]("n_dropped") == 2L),
      "a body paragraph crossed the boilerplate threshold at sf0.001")
  }
}
