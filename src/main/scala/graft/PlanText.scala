package graft

/** Dev main (the [[PlanDump]] sibling): print a registry query's FULL
  * `explain("formatted")` physical plan — the artifact the optimization
  * rounds commit under plans/rNN/<query>_{before,after}.txt so plan
  * claims are checkable without running Spark.
  *
  * Usage: runMain graft.PlanText <queryName> <sfDir>
  */
object PlanText {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    // stdout, between markers, so callers can slice it out of sbt noise
    println("===PLAN_BEGIN===")
    df.explain("formatted")
    println("===PLAN_END===")
    spark.stop()
  }
}
