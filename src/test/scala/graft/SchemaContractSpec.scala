package graft

import org.apache.spark.sql.types._

/** Pins the Spark-side type of every column each [[Tables]] loader yields.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed a physical encoding once (events.ts: INT64 TIMESTAMP(NANOS) →
  * timestamp[us] TIMESTAMP_NTZ), which silently broke every watermark and
  * as-of query while the loaders stayed "green". This spec makes the NEXT
  * drift fail in one named test with the offending column in the message,
  * instead of as a dozen scattered AnalysisExceptions.
  *
  * Two deliberate pins:
  *  - events.ts must be TimestampType (session-zone) — `withWatermark`,
  *    `unix_micros`, and the as-of family reject TIMESTAMP_NTZ, so the
  *    loader normalizes whatever the parquet carries ([[Tables.events]]).
  *  - lineitem/orders date columns are accepted as TimestampNTZType:
  *    nothing downstream needs an instant there (date arithmetic and
  *    literal comparisons are NTZ-safe, and DuckDB oracles agree), so the
  *    raw physical type passes through. If the pin fails but all queries
  *    stay green, update the pin — it records reality, not preference.
  */
class SchemaContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assertTypes(name: String,
      df: org.apache.spark.sql.DataFrame, want: Map[String, DataType]): Unit = {
    val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
    want.foreach { case (c, t) =>
      assert(got.contains(c), s"$name: column '$c' missing (drift!)")
      assert(got(c) == t,
        s"$name.$c: expected $t, loader yields ${got(c)} — testdata " +
          "encoding drifted; normalize it in Tables or re-pin here")
    }
  }

  test("events loader normalizes ts to session-zone TimestampType") {
    assertTypes("events", Tables.events(spark, dir), Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))
  }

  test("embeddings loader yields float-array vectors") {
    assertTypes("embeddings", Tables.embeddings(spark, dir), Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
  }

  test("documents loader yields the text-pipeline contract") {
    assertTypes("documents", Tables.documents(spark, dir), Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
  }

  test("tpch loaders: keys, money, and date encodings") {
    assertTypes("lineitem", Tables.lineitem(spark, dir), Map(
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_shipdate" -> TimestampNTZType))
    assertTypes("orders", Tables.orders(spark, dir), Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType))
    assertTypes("customer", Tables.customer(spark, dir), Map(
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType))
    assertTypes("region", Tables.region(spark, dir), Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
  }
}
