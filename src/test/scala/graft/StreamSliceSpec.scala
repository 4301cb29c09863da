package graft

import org.apache.spark.sql.functions._

/** The stream-slice fixture's load-bearing invariants: the gate's
  * multi-micro-batch streaming runs are only correct if the slices carry
  * EXACTLY the events table (no row lost or duplicated at the quartile
  * cuts) in REPLAY order that is time order (ascending mtimes, slices
  * time-disjoint) — the contract that lets the no-timeout sessionizer's
  * gap logic see each user's events in order across batches. */
class StreamSliceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val sliced = queries.StreamQueries.slicedEventsDir(spark, dir)

  test("slices carry exactly the events table (multiset equality)") {
    val ev = Tables.events(spark, dir)
    val sl = spark.read.parquet(sliced)
    assert(sl.count() === ev.count())
    assert(ev.select("event_id").except(sl.select("event_id")).isEmpty)
    assert(sl.groupBy("event_id").count().filter(col("count") > 1).isEmpty,
      "a cut boundary duplicated rows")
  }

  test("slices are time-disjoint and mtime order is time order") {
    val files = new java.io.File(sliced).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
    assert(files.length === 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"slices overlap in time: $hi >= $lo2")
    }
  }
}
