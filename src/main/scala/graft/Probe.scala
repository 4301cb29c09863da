package graft
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Dev utility: time ONE registered query (warmup + N cache-cleared runs)
  * at a given SF dir — the single-query view of [[Bench]]'s harness, for
  * iterating on a hot query without re-running the whole suite.
  * Usage: runMain graft.Probe <queryName> [sfDir] [runs]. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.local()
    def mat(): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    }
    mat()
    for (i <- 1 to runs) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); mat()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
