package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

/** Semantic pins for the product-analytics cores on crafted frames —
  * the orderings the oracle's organic data may never exercise. Calls the
  * SAME functions q_funnel/q_cohort run, not a reimplementation. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("funnel counts only stages strictly after the previous stage") {
    // u1: proper view→click→purchase; u2: purchase BEFORE click (must
    // not reach stage 3); u3: click before any view (must not reach
    // stage 2); u4: view only; u5: click at the SAME instant as the
    // view (strict > excludes it)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(0)), (2L, "purchase", ts(1)), (2L, "click", ts(2)),
      (3L, "click", ts(0)), (3L, "view", ts(1)),
      (4L, "view", ts(0)),
      (5L, "view", ts(3)), (5L, "click", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val funnel = AnalyticsQueries
      .funnelStages(ev, Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(funnel == Map("1_view" -> 5L, "2_click" -> 2L, "3_purchase" -> 1L))
    // u2's click AFTER its purchase still counts for stage 2 (funnel
    // order is view→click), but nothing follows it → no stage 3
  }

  test("cohort assigns by FIRST day and counts each user once per offset") {
    val day0 = "2024-03-01"
    val ev = Seq(
      // u1 first seen day0, active day0 (twice: must count once) + day2
      (1L, Timestamp.valueOf(s"$day0 08:00:00")),
      (1L, Timestamp.valueOf(s"$day0 20:00:00")),
      (1L, Timestamp.valueOf("2024-03-03 09:00:00")),
      // u2 first seen day1, active day1 only
      (2L, Timestamp.valueOf("2024-03-02 10:00:00")),
      // u3 first seen day0, returns day 5 (beyond k<=3: excluded)
      (3L, Timestamp.valueOf(s"$day0 12:00:00")),
      (3L, Timestamp.valueOf("2024-03-06 12:00:00"))
    ).toDF("user_id", "ts")
    val rows = AnalyticsQueries.cohortRetention(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // day0 cohort: u1+u3 at d0, nobody d1, u1 at d2, nobody d3 (u3's
    // day-5 return is out of range)
    assert(rows(day0) == ((2L, 0L, 1L, 0L)))
    assert(rows("2024-03-02") == ((1L, 0L, 0L, 0L)))
  }
}
