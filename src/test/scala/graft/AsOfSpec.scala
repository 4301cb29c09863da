package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** As-of join: hand-checked semantics (inclusive ts, null when nothing
  * precedes, per-key isolation) plus a differential check against the
  * naive range-join-then-argmax formulation on a random frame, and the
  * plan-shape guarantee that motivates the operator. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("as-of picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 15L, 102L),
      (3L, 5L, 103L))
      .map { case (k, t, id) => (k, ts(t * 1000000), id) }
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, 10L, 900L), (1L, 12L, 901L), (2L, 99L, 902L))
      .map { case (k, t, id) => (k, ts(t * 1000000), id) }
      .toDF("user_id", "ts", "event_id")
    val got = AsOf.joinAsOf(left, right, "user_id", "ts", col("event_id"))
      .select(col("l.event_id"), col("r.event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      100L -> Some(900L), // equal ts counts as prior (inclusive)
      101L -> Some(901L), // latest of the two preceding rights
      102L -> None,       // right exists for key but only later
      103L -> None))      // no right rows for key at all
  }

  test("as-of equals the naive range-join argmax on a random frame") {
    val n = 2000
    val left = spark.range(n).select(
      (pmod(xxhash64(col("id")), lit(37))).as("user_id"),
      timestamp_micros(pmod(xxhash64(col("id"), lit(1)), lit(100000L)))
        .as("ts"),
      col("id").as("event_id"))
    val right = AsOf.latestPerKeyTs(
      spark.range(n).select(
        (pmod(xxhash64(col("id"), lit(2)), lit(37))).as("user_id"),
        timestamp_micros(pmod(xxhash64(col("id"), lit(3)), lit(100000L)))
          .as("ts"),
        (col("id") + 10000).as("event_id")),
      "user_id", "ts", "event_id")

    val got = AsOf.joinAsOf(left, right, "user_id", "ts", col("event_id"))
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))

    // naive: range join within key, then keep the max-(ts, id) right row
    val naive = left.as("l")
      .join(right.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.ts") >= col("r.ts"),
        "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.event_id"))
          .orderBy(col("r.ts").desc_nulls_last, col("r.event_id").desc)))
      .filter(col("rk") === 1)
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))

    assert(got.count() === n)
    assert(naive.except(got).isEmpty && got.except(naive).isEmpty)
  }

  test("property: as-of invariants on random frames (vs in-memory oracle)") {
    import org.scalacheck.{Gen, Prop}
    // collision-rich: 3 keys, 20 time values — ties and empty keys abound
    val rowGen = Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 19L))
    val gen = Gen.zip(Gen.listOfN(15, rowGen), Gen.listOfN(15, rowGen))
    checkProp(Prop.forAllNoShrink(gen) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t * 1000000), i.toLong) }
        .toDF("user_id", "ts", "event_id")
      val right = AsOf.latestPerKeyTs(
        rRows.zipWithIndex
          .map { case ((k, t), i) => (k, ts(t * 1000000), 100L + i) }
          .toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id")
      val got = AsOf.joinAsOf(left, right, "user_id", "ts", col("event_id"))
        .select(col("l.event_id"), col("r.event_id"))
        .as[(Long, Option[Long])].collect().toMap
      // in-memory oracle: unique right per (key, ts) keeping max id, then
      // per left row the max-(ts, id) right at or before it
      val rUniq = rRows.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) }
        .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val expect = lRows.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> rUniq.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      }.toMap
      got == expect
    }, minTests = 10)
  }

  test("broadcast as-of == window as-of, and its left side never shuffles") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val c = AsOf.latestPerKeyTs(
      ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us")),
      "user_id", "ts_us", "event_id")
    val viaWindow = AsOf.joinAsOf(p, c, "user_id", "ts_us", col("event_id"))
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))
    val viaBcast = AsOf.joinAsOfBroadcast(p, c, "user_id", "ts_us")
      .select(col("l.event_id").as("l_id"), col("r.event_id").as("r_id"))
    assert(viaBcast.count() === viaWindow.count())
    assert(viaWindow.except(viaBcast).isEmpty && viaBcast.except(viaWindow).isEmpty)
    // the broadcast formulation's whole plan is shuffle-free: the right
    // side was built driver-side, the left side maps in place
    assert(!viaBcast.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("broadcast as-of refuses a right side over the row cap, fast") {
    val left = Seq((1L, 10L, 100L)).toDF("user_id", "ts", "event_id")
    val right = spark.range(500).select(
      col("id").as("user_id"), col("id").as("ts"))
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinAsOfBroadcast(left, right, "user_id", "ts",
        maxRightRows = 100L)
    }
    assert(ex.getMessage.contains("maxRightRows"))
    // at/under the cap still works
    val small = right.limit(50)
    assert(AsOf.joinAsOfBroadcast(left, small, "user_id", "ts",
      maxRightRows = 100L).count() === 1)
  }

  test("as-of join plans no cartesian/range explosion and <= 2 shuffles") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val c = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val out = AsOf.joinAsOf(p, c, "user_id", "ts", col("event_id"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"expected <=2 shuffles, got $shuffles:\n$plan")
  }
}
