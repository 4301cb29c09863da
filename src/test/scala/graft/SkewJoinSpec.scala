package graft

import org.apache.spark.sql.functions._

/** AQE skew handling — the engine's documented escape hatch for skewed
  * join keys (Sessions enables spark.sql.adaptive.skewJoin): a join with
  * one dominant key must show skew-split partitions in the final
  * adaptive plan instead of serializing the hot key in one task. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // shrink thresholds so the test-sized hot key counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val left = spark.range(0, 200000)
        .select((when(col("id") % 10 === 0, 0L).otherwise(col("id")))
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS dataset's adaptive plan executes
      // and finalizes; count() would run a different aggregate plan tree
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split partition in the adaptive plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
