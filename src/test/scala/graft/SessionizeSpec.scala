package graft

import org.apache.spark.sql.functions._
import graft.ops.Sessionize
import graft.queries.StreamQueries

/** The typed flatMapGroups sessionizer and the window/lag plan implement
  * the same semantics — asserted on the real events table. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("typed sessions equal the window-based q_sessionize result") {
    val dir = "/root/testdata/sf0.001"
    val typed = Sessionize.sessions(Tables.events(spark, dir))
      .toDF()
      .select(col("user_id"), col("session_id"), col("n_events"),
        date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"))
    val window = StreamQueries.qSessionize.fn(spark, dir)
    assert(typed.count() === window.count())
    assert(typed.except(window).isEmpty && window.except(typed).isEmpty)
  }

  test("gap boundary: exactly 30 minutes does not split, 30m+1us does") {
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def at(min: Int, us: Int = 0) =
      new java.sql.Timestamp(base.getTime + min * 60000L + us / 1000)
    val df = Seq(
      (1L, base, 1L), (1L, at(30), 2L),          // same session (gap == 30m)
      (2L, base, 3L), (2L, at(30, 1000), 4L)     // split (gap > 30m)
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.sessions(df).collect()
      .map(s => (s.user_id, s.session_id, s.n_events)).sorted
    assert(out === Array((1L, 1L, 2L), (2L, 1L, 1L), (2L, 2L, 1L)))
  }
}
