package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** S10 executed — the per-row document SINK: one file per surviving row,
  * named by the (file_name, doc_text) projection that [[Render]] builds.
  * The engine counterpart of the reference's upload loop
  * (commercial_rfp_content_doc_library_creation.py:103-131), which writes
  * each rendered .docx to the content library one blob at a time.
  *
  * Spark-first shape: `foreachPartition`, so each executor streams its
  * partition's documents straight to the target — no collect, no driver
  * bottleneck, parallelism = partition count (exactly the ThreadPoolExecutor
  * fan-out of the reference's `1/` variant, but sized by the cluster).
  * `outDir` must be a path every executor can reach (a shared/object-store
  * mount at cluster scale; any local dir under local[*]). Writes are
  * idempotent per name — rerunning overwrites, matching the reference's
  * upsert upload semantics.
  *
  * [[writeDocs]] writes the rendered text verbatim (UTF-8, the
  * inspectable-artifact variant); [[Docx.writeDocx]] is the same contract
  * emitting REAL binary OOXML .docx bytes — the reference's actual output
  * format — and is the full-honesty S10 path since round 12.
  */
object RenderSink {

  /** Writes one UTF-8 file per row. Names must be relative and flat —
    * a separator or traversal in a document name is a corrupt key, not a
    * path, and fails fast. Null text writes an empty document (the
    * reference renders blank-field docs too). */
  def writeDocs(df: DataFrame, nameCol: String, textCol: String,
                outDir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    df.select(col(nameCol).cast("string"), col(textCol).cast("string"))
      .foreachPartition { (it: Iterator[Row]) =>
        val base = java.nio.file.Paths.get(outDir)
        it.foreach { r =>
          val name = r.getString(0)
          require(name != null && name.nonEmpty && !name.contains('/') &&
            !name.contains('\\') && !name.startsWith("."),
            s"unsafe document name: $name")
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          java.nio.file.Files.write(base.resolve(name),
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
  }
}
