package graft.ops

import org.apache.spark.sql.DataFrame

/** Size-targeted parquet sink — the small-files guard. A 100 TB pipeline
  * that writes one file per task inherits the upstream partition count
  * (thousands of tiny files after a selective filter, or too-few huge
  * files after a coalesce); both poison downstream scan parallelism and
  * metadata load. This sink repartitions to hit a target bytes-per-file
  * before writing — the write-side half of the partitioning story
  * (`spark.sql.files.maxPartitionBytes` being the read side).
  */
object Sink {

  /** Partition count that lands output files near `targetBytes`, from
    * the optimizer's size estimate. The estimate is the in-memory row
    * size (parquet compresses further), so real files land somewhat
    * under target — the safe side of the small-files/huge-files
    * trade. */
  def compactionPartitions(df: DataFrame, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    (bytes / BigInt(targetBytes)).toInt.max(0).min(100000) + 1
  }

  /** Writes `df` as parquet with ~`targetBytes`-sized files; returns the
    * file count written. */
  def writeCompacted(df: DataFrame, path: String,
                     targetBytes: Long = 128L << 20): Int = {
    val n = compactionPartitions(df, targetBytes)
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
