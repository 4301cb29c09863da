package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support (north star): media as opaque `binary`
  * columns with a typed metadata struct, plus frame sampling and batch
  * feature extraction.
  *
  * Decode posture, two tiers: where the codec is implementable from the
  * JDK alone the engine performs REAL decode — [[MediaCodec.decodeWav]]
  * (RIFF/PCM16), [[MediaCodec.decodeBmp]] (24bpp DIB), and since r12
  * [[MediaCodec.decodePng]] (a genuinely COMPRESSED format: zlib inflate
  * via `java.util.zip.Inflater` + all five PNG filter types), each
  * oracle-checked byte-for-byte. For the remaining compressed codecs
  * (JPEG/MP3/H.264), whose entropy coders have no JDK implementation and
  * whose libraries are absent from this sandbox, the paths below substitute
  * deterministic byte-level statistics in the decode slot — everything
  * around that substitution is the same real Spark plumbing both tiers
  * share: BinaryType content, nested StructType metadata, codegen'd
  * binary slicing for frame sampling, and a typed `mapPartitions` pass
  * (the JVM analog of a vectorized batch-UDF decode: one iterator per
  * partition, so codec init amortizes per partition, not per row).
  *
  * Scale: content stays opaque until the last step — predicates and
  * metadata projections never touch the bytes, so column pruning keeps
  * scans narrow; frame sampling is a bounded explode (≤ maxFrames rows per
  * asset); feature extraction is embarrassingly parallel.
  */
object Multimodal {

  /** One extracted feature row per media asset ([[extractFeatures]]). */
  final case class MediaFeature(doc_id: Long, modality: String,
                                n_bytes: Int, checksum: Long,
                                peak_byte: Int)

  /** Bounded frame sampling: up to `maxFrames` frames of `frameBytes`
    * each, sliced out of the binary content (codegen'd `substr` on
    * BinaryType — no UDF). Adds (frame_idx, frame). */
  def sampleFrames(df: DataFrame, contentCol: String,
                   frameBytes: Int = 256, maxFrames: Int = 4): DataFrame = {
    val nFrames = least(lit(maxFrames),
      ceil(length(col(contentCol)).cast("double") / frameBytes).cast("long"))
    df.withColumn("frame_idx",
        explode(sequence(lit(0L), greatest(nFrames - 1, lit(0L)))))
      .withColumn("frame",
        expr(s"substr($contentCol, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
  }

  /** One resized-asset row per media asset ([[resize]]). */
  final case class MediaResize(doc_id: Long, modality: String,
                               in_bytes: Int, out_bytes: Int,
                               resized_md5: String)

  /** Stubbed resize/downsample: stride decimation keeps every
    * (n/target)-th byte up to `targetBytes` samples — the deterministic
    * stand-in for pixel resampling (a real pipeline would decode,
    * interpolate, re-encode in this exact partition-iterator slot). The
    * sampling contract (0-based positions i·stride for i < target,
    * stride = max(n div target, 1)) is reproduced verbatim by the DuckDB
    * oracle, so even the imperative path is hash-checked. */
  def resize(df: DataFrame, targetBytes: Int = 64): Dataset[MediaResize] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, modality, bytes) =>
          val n = bytes.length
          val stride = math.max(n / targetBytes, 1)
          val out = (0 until targetBytes).iterator.map(_ * stride)
            .takeWhile(_ < n).map(bytes(_)).toArray
          md.reset()
          val hex = md.digest(out).map("%02x".format(_)).mkString
          MediaResize(id, modality, n, out.length, hex)
        }
      }
  }

  /** Batch feature extraction over (doc_id, modality, content) — the
    * stubbed decode. Deterministic byte statistics replace codec output;
    * the partition-iterator shape is what a real decoder would use. The
    * checksum is the position-weighted byte sum Σ (i+1)·bᵢ — order-
    * sensitive (detects byte swaps) yet expressible as a commutative SQL
    * aggregate, which is what lets q_media_features be oracle-checked. */
  def extractFeatures(df: DataFrame): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec/model load)
        it.map { case (id, modality, bytes) =>
          val hist = new Array[Int](256)
          var sum = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            hist(b) += 1
            sum += (i + 1).toLong * b
            i += 1
          }
          val peak = if (bytes.isEmpty) -1 else hist.indexOf(hist.max)
          MediaFeature(id, modality, bytes.length, sum, peak)
        }
      }
  }
}
