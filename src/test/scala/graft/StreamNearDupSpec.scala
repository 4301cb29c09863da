package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The streaming near-dup gate's two load-bearing contracts:
  *
  *  - batch ≡ stream: the GroupState sliding-window dedup must equal an
  *    independent BATCH formulation of the same window semantics (lag
  *    over (band, sig)) on the same banding projection — the
  *    StatefulStreamSpec discipline, applied to LSH dedup;
  *  - fixture: the slice cuts are pinned BETWEEN an original and its
  *    +7-minute variant, so a dup chain provably straddles a micro-batch
  *    boundary (the cross-batch state fold is exercised by construction).
  */
class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpusWithTs = queries.SimilarityQueries.docCorpus(spark, dir)
    .withColumn("ts", expr("timestampadd(MINUTE, " +
      "cast((doc_id % 1000000) * 10 + (doc_id div 1000000) * 7 as int), " +
      "timestamp'2025-01-01 00:00:00')"))

  test("stream verdicts equal the batch lag-window formulation exactly") {
    val streamed = Registry.byName("q_stream_neardup").fn(spark, dir)
      .select("doc_id", "n_bands", "n_dup_bands", "is_dup")
    val gapUs = 8L * 60L * 1000000L
    val w = Window.partitionBy(col("bkey")).orderBy(col("us"))
    val batch = queries.StreamQueries.neardupBandRows(corpusWithTs)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("dup",
        when(col("prev").isNotNull && col("us") - col("prev") <= gapUs, 1L)
          .otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bands"), sum(col("dup")).as("n_dup_bands"),
        max(col("dup")).as("is_dup"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "stream GroupState and batch lag-window dedup diverged")
    // the fixture exercises BOTH verdicts: some dups, some evicted copies
    val classes = streamed
      .groupBy((col("doc_id") / 1000000).cast("int").as("cls"))
      .agg(max(col("is_dup")).as("anyDup"), min(col("is_dup")).as("allDup"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(classes(0) === ((0L, 0L)), "originals must all be new")
    assert(classes(1)._1 === 1L, "+7min variants must be caught")
    assert(classes(2) === ((0L, 0L)),
      "+14min exact copies must re-enter as new (state idled past window)")
  }

  test("slice cuts straddle a dup chain across a micro-batch boundary") {
    val sliced = queries.StreamQueries.neardupSliceDir(spark, dir)
    val files = new java.io.File(sliced).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
    assert(files.length === 3)
    // multiset equality with the corpus
    val all = spark.read.parquet(sliced)
    val corpus = corpusWithTs
    assert(all.count() === corpus.count())
    assert(corpus.select("doc_id").except(all.select("doc_id")).isEmpty)
    // time-disjoint, ascending
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, "slices overlap in time")
    }
    // each interior boundary splits an (original d, variant d+1e6) pair:
    // the original is in slice k and its +7min variant in slice k+1
    (0 until 2).foreach { k =>
      val left = spark.read.parquet(files(k).getAbsolutePath)
        .select("doc_id").as[Long].collect().toSet
      val right = spark.read.parquet(files(k + 1).getAbsolutePath)
        .select("doc_id").as[Long].collect().toSet
      val straddle = left.filter(d => d < 1000000L && right(d + 1000000L))
      assert(straddle.nonEmpty,
        s"no dup chain straddles the slice $k/${k + 1} boundary")
    }
  }
}
