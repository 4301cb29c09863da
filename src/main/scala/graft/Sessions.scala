package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session tuning so Verify, Bench and tests agree.
  *
  * Scale posture: AQE owns runtime re-planning (partition coalescing, skew
  * split, dynamic broadcast) — on a 1000-executor cluster the same settings
  * apply, only shuffle.partitions is sized to the cluster instead of the
  * local core count.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // events.parquet stores INT64 TIMESTAMP(NANOS); read as long and let
      // Tables.events convert (Spark has no nanos timestamp type).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
