package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Batch/stream unification proof: the exact q_events_hourly plan
  * ([[Streams.hourlyCounts]]) run under readStream + watermark over a file
  * source produces the same result as the batch run on the same input. */
class StreamingSpec extends SparkSpec {

  test("hourlyCounts: readStream result equals batch result") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    dir.deleteOnExit()
    val src = s"${dir.getAbsolutePath}/events"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    val events = Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    val batch = Streams.hourlyCounts(spark.read.parquet(src))

    val stream = Streams.hourlyCounts(
      spark.readStream.schema(schema).parquet(src))
    val q = stream.writeStream
      .format("memory").queryName("hourly_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream")
    assert(streamed.count() === batch.count())
    assert(batch.except(streamed).isEmpty)
    assert(streamed.except(batch).isEmpty)
  }
}
