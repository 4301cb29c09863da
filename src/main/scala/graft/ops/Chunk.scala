package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1/V4 — fixed-size overlapping text chunker with parent/child rows,
  * re-expressing the reference's SplitSkill(text_split_mode="pages",
  * maximum_page_length=2000, page_overlap_length=500) + index projection
  * (commercial_rfp_indexer.py:164-176,192-209) as a pure narrow Spark
  * projection: offsets via `sequence`, one row per chunk via `explode`.
  *
  * Contract (identical in the DuckDB oracle): chunk offsets are
  * 0, stride, 2*stride, ... with stride = maxLen - overlap; an offset past
  * the first is kept only while `offset < length - overlap`, so a tail that
  * the previous chunk already fully covers is not re-emitted. Empty text
  * yields one empty chunk (offset 0).
  *
  * Scale: no shuffle at all — chunking is embarrassingly parallel and stays
  * inside WholeStageCodegen; output rows ≈ input_bytes / stride, so the
  * 100 TB story is purely a function of the scan partitioning.
  */
object Chunk {
  /** Reference SplitSkill parameters (commercial_rfp_indexer.py:168-169). */
  val refMaxLen = 2000
  val refOverlap = 500

  /** Offsets array for one text value. */
  def offsets(text: Column, maxLen: Int, overlap: Int): Column = {
    require(maxLen > 0 && overlap >= 0 && overlap < maxLen,
      s"need 0 <= overlap < maxLen, got maxLen=$maxLen overlap=$overlap")
    val stride = maxLen - overlap
    filter(
      sequence(lit(0), greatest(length(text) - 1, lit(0)), lit(stride)),
      o => o === 0 || o < length(text) - overlap)
  }

  /** Explodes `df` into parent/child chunk rows:
    * (parent_id, chunk_id, chunk_idx, chunk). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                maxLen: Int = refMaxLen, overlap: Int = refOverlap): DataFrame = {
    val stride = maxLen - overlap
    df.select(col(idCol).as("parent_id"), col(textCol).as("__text"),
        explode(offsets(col(textCol), maxLen, overlap)).as("off"))
      .select(
        col("parent_id"),
        concat(col("parent_id").cast("string"), lit("_"),
          expr(s"off div $stride").cast("string")).as("chunk_id"),
        expr(s"off div $stride").as("chunk_idx"),
        expr(s"substring(__text, off + 1, $maxLen)").as("chunk"))
  }
}
