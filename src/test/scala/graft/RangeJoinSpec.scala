package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bucketed range join: hand-checked containment semantics (inclusive
  * endpoints, exactly-once pairing across bucket boundaries), a
  * differential check against the naive inequality join on a random
  * frame, and the plan guarantee (equi-join, no BNLJ/cartesian). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pairs each point once with every containing interval, inclusive ends") {
    val points = Seq((1L, 100L, 10L), (1L, 500L, 11L), (1L, 1000L, 12L),
      (2L, 100L, 13L))
      .toDF("k", "t", "pid")
    // intervals: [100,1000] spans many buckets; [400,600] nested
    val ivs = Seq((1L, 100L, 1000L, 20L), (1L, 400L, 600L, 21L))
      .toDF("k", "s", "e", "iid")
    val got = RangeJoin.joinPointInInterval(points, ivs, "k", "t", "s", "e",
        bucketUs = 128L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 20L),            // t=100 == interval start (inclusive)
      (11L, 20L), (11L, 21L), // nested membership, exactly once each
      (12L, 20L)))           // t=1000 == interval end (inclusive)
  }

  test("bucketed range join equals naive inequality join on a random frame") {
    val n = 3000
    val points = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(23)).as("k"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("t"),
      col("id").as("pid"))
    val ivs = spark.range(500).select(
      pmod(xxhash64(col("id"), lit(2)), lit(23)).as("k"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000000L)).as("s"),
      col("id").as("iid"))
      .withColumn("e", col("s") + pmod(xxhash64(col("iid")), lit(50000L)))
    val got = RangeJoin.joinPointInInterval(points, ivs, "k", "t", "s", "e",
        bucketUs = 10000L)
      .select("pid", "iid")
    val naive = points.join(ivs, Seq("k"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid")
    assert(naive.except(got).isEmpty && got.except(naive).isEmpty)
    assert(got.count() === naive.count()) // no duplicate pairings either
  }

  test("range join plans an equi-join, not BNLJ/cartesian") {
    val points = spark.range(100).select(col("id").as("k"),
      col("id").as("t"), col("id").as("pid"))
    val ivs = spark.range(100).select(col("id").as("k"),
      col("id").as("s"), (col("id") + 10).as("e"), col("id").as("iid"))
    val out = RangeJoin.joinPointInInterval(points, ivs, "k", "t", "s", "e",
      bucketUs = 7L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
