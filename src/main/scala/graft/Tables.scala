package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All operators take their inputs through here so that the scan layer is
  * one place: Parquet with Catalyst filter/column pushdown. At 100 TB the
  * same call sites point at a partitioned table (e.g. partitioned by date
  * or source) and partition pruning applies transparently — nothing in the
  * operator layer assumes single-file inputs.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped two physical encodings of `ts` across
    * testdata regenerations, and this loader normalizes both to a plain
    * session-zone TIMESTAMP so every downstream operator (windows, as-of
    * joins, `withWatermark`) sees one type:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's reader rejects it; sessions set
    *    spark.sql.legacy.parquet.nanosAsLong=true (see [[Sessions.tune]])
    *    and we convert nanos → microsecond timestamp with integer
    *    division (epoch nanos exceed double's 2^53 mantissa, so a double
    *    roundtrip would corrupt them).
    *  - timestamp[us] with no timezone: Spark reads TIMESTAMP_NTZ, which
    *    `withWatermark`/`unix_micros` reject. The session zone is pinned
    *    UTC ([[Sessions]]), so casting to TIMESTAMP preserves the instant
    *    exactly.
    *
    * [[SchemaContractSpec]] pins the normalized output types so the next
    * testdata drift fails in one named test, not 14 scattered ones. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
