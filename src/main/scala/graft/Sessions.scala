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
      // Long-lived driver hygiene: ContextCleaner frees shuffle files,
      // broadcast blocks and checkpoint dirs only when the JVM garbage-
      // collects their references — with a large heap that can lag by
      // hours while driver/storage state from thousands of stages piles
      // up (observed as UNABLE_TO_ACQUIRE_MEMORY after ~7k stages in one
      // session). The default periodic-GC interval is 30min; 2min keeps
      // reclamation ahead of accumulation for iterative workloads at a
      // negligible cost.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // The app-status store tracks jobs/stages/SQL executions (with
      // metric and plan-graph payloads) even with the UI disabled; at
      // default retention (1000 executions / 1000 stages) a session that
      // runs thousands of short queries — Verify, Bench, the test
      // suite — keeps hundreds of MB of dead metadata live on the
      // driver heap. Cap retention at what a human would ever look at.
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      // Every action renders a plan DESCRIPTION string for the SQL
      // listener event; the default length cap is ~Int.MaxValue, so a
      // pathological plan (e.g. an iterative loop that forgot to
      // truncate lineage) can OOM the DRIVER building diagnostic text
      // before any real limit is hit (observed: heap death inside
      // explainString on a deep connected-components chain). 1 MiB is
      // more plan text than anyone reads; past it, truncate.
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
