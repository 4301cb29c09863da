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

  test("2-slice variants hold the same invariants (the r12 gate dirs)") {
    // q_stream_sessionize/hourly stream the 2-part dir; sess_win/join/
    // dedup the 2-on-time late dir — same multiset/disjoint/order
    // contract as the 4-part fixtures
    val ev = Tables.events(spark, dir)
    val two = spark.read.parquet(
      queries.StreamQueries.slicedEventsDir(spark, dir, parts = 2))
    assert(two.count() === ev.count())
    assert(ev.select("event_id").except(two.select("event_id")).isEmpty)
    val lateDir = queries.StreamQueries
      .lateSlicedEventsDir(spark, dir, onParts = 2)
    val files = new java.io.File(lateDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
    assert(files.length === 3)
    val all = spark.read.parquet(lateDir)
    assert(all.count() === ev.count())
    assert(ev.select("event_id").except(all.select("event_id")).isEmpty)
    // the last slice is still exactly the late set
    val t0 = ev.agg(min(unix_micros(col("ts")))).head().getLong(0)
    val expectedLate = ev.filter((col("event_id") % 10 === 7) &&
      (unix_micros(col("ts")) < t0 + 86400000000L))
    val last = spark.read.parquet(files.last.getAbsolutePath)
    assert(last.count() === expectedLate.count() && last.count() > 0)
    assert(expectedLate.select("event_id").except(last.select("event_id"))
      .isEmpty)
  }

  test("late fixture: last slice is exactly the day-one late set, " +
    "arriving after all on-time data") {
    val lateDir = queries.StreamQueries.lateSlicedEventsDir(spark, dir)
    val files = new java.io.File(lateDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
    assert(files.length === 4)
    val ev = Tables.events(spark, dir)
    val t0 = ev.agg(min(unix_micros(col("ts")))).head().getLong(0)
    val isLate = (col("event_id") % 10 === 7) &&
      (unix_micros(col("ts")) < t0 + 86400000000L)
    // union of slices == events table, and the LAST slice == the late set
    val all = spark.read.parquet(lateDir)
    assert(all.count() === ev.count())
    assert(ev.select("event_id").except(all.select("event_id")).isEmpty)
    val last = spark.read.parquet(files.last.getAbsolutePath)
    val expectedLate = ev.filter(isLate)
    assert(last.count() === expectedLate.count() && last.count() > 0,
      "late set must be non-empty or the Append gate query is vacuous")
    assert(expectedLate.select("event_id").except(last.select("event_id"))
      .isEmpty)
    // on-time slices are time-ordered among themselves and the late
    // slice's events all PRECEDE the watermark its arrival sees
    val onRanges = files.init.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    onRanges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2)
    }
    val lateMax = last.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val onMax = onRanges.last._2
    assert(lateMax < onMax - 7200L * 1000000L,
      "late rows must sit beyond the 2h watermark delay when they arrive")
  }
}
