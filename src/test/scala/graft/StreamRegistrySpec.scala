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
}
