package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Sketch
import graft.streaming.Streams

/** Streaming KMV cardinality: the k-minima state must carry across
  * micro-batches AND query restarts (state-store recovery from the
  * checkpoint), and at each stage the streamed estimate must equal the
  * one-shot batch sketch of the data seen so far EXACTLY — same hashes,
  * same order statistic, same finisher arithmetic. */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streamed estimates equal the batch sketch at each stage, across a restart") {
    val dir = Files.createTempDirectory("graft-kmv").toFile
    dir.deleteOnExit()
    val src = s"${dir.getAbsolutePath}/docs"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"
    val k = 48

    // split by doc_id RANGE (not parity — source is doc_id mod 20, so a
    // parity split would give each half disjoint groups): both halves
    // contain every source, so the k-minima state must hand off for
    // every group
    val whole = Tables.documents(spark, "/root/testdata/sf0.001")
    val half1 = whole.filter(col("doc_id") < 250).select("source", "text")
    val half2 = whole.filter(col("doc_id") >= 250).select("source", "text")

    // foreachBatch (unlike the memory sink) supports checkpoint
    // recovery, which stage 2 depends on
    def runOnce(): Map[String, Double] = {
      val got = scala.collection.mutable.Map[String, Double]()
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = Streams.kmvDistinctStream(stream, "source", "text", k)
        .toDF("source", "kmv_est")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(String, Double)].collect()
            .foreach { case (g, e) => got.synchronized { got(g) = e } }
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not finish in 120 s")
      got.toMap
    }

    // stage 1: only the first half exists → estimates of half 1
    half1.coalesce(1).write.parquet(src)
    val stage1 = runOnce()
    val batch1 = Sketch.kmvDistinct(half1, "source", "text", k)
      .as[(String, Double)].collect().toMap
    assert(stage1 === batch1, "stage-1 stream != batch sketch of half 1")

    // stage 2: second half lands; a NEW query run recovers the k-minima
    // from the checkpointed state store and folds the new batch in
    half2.coalesce(1).write.mode("append").parquet(src)
    val stage2 = runOnce()
    val batchAll = Sketch.kmvDistinct(whole.select("source", "text"),
        "source", "text", k)
      .as[(String, Double)].collect().toMap
    assert(stage2.keySet == batchAll.keySet)
    stage2.foreach { case (g, est) =>
      assert(est === batchAll(g), s"group $g: streamed $est != ${batchAll(g)}")
    }
    // the second batch genuinely changed estimates (more distincts seen)
    assert(stage2.exists { case (g, est) => est != stage1(g) })
  }
}
