package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both fact tables bucketed on the
  * join key lets the sort-merge join run with ZERO exchanges — the
  * pre-partitioning strategy for repeated large-fact joins at 100 TB
  * (shuffle once at write time, never again per query). */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    Tables.lineitem(spark, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bucketed")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("orders_bucketed")
          .join(spark.table("lineitem_bucketed"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange hashpartitioning(o_orderkey"))
        assert(!plan.contains("Exchange hashpartitioning(l_orderkey"))
        assert(joined.count() > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
