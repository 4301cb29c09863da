package graft

/** Dev main (the [[Probe]] sibling): print a registry query's physical
  * plan OPERATOR CENSUS — ReusedExchange/Exchange/HashAggregate/Generate/
  * FileScan/BroadcastExchange counts plus the exchange/scan lines — the
  * quick read for "did Catalyst reuse that subtree or recompute it".
  * Found the r14 featurizer finding (ReusedExchange=0 on q_knn_hash:
  * four full tokenize subtrees in one plan, see `ops/HashEmbed.sparse`).
  *
  * Usage: runMain graft.PlanDump <queryName> <sfDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    val s = df.queryExecution.executedPlan.toString
    val counts = Seq("ReusedExchange", "Exchange", "HashAggregate",
      "Generate", "FileScan", "BroadcastExchange")
      .map(k => k -> ("(?m)^\\s*[+:\\-\\*\\s]*" + k).r.findAllIn(s).length)
    println(counts.map { case (k, v) => s"$k=$v" }.mkString(" "))
    println(s.linesIterator.filter(l => l.contains("Exchange") ||
      l.contains("Scan parquet") || l.contains("Generate"))
      .take(40).mkString("\n"))
  }
}
