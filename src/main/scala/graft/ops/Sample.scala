package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the curation primitive for downsampling
  * a corpus (or rebalancing strata) reproducibly: membership depends only
  * on the row's id, never on partitioning, run order, or a seed stream,
  * so a rerun (or the DuckDB oracle) selects the identical rows.
  *
  * The hash is the first 4 hex digits of md5(id) — uniform on [0, 65536)
  * and computable verbatim in both engines. Pure projection; sampling
  * 100 TB costs one scan, and the filter prunes before any shuffle.
  */
object Sample {

  /** Uniform 16-bit md5 bucket of an id: [0, 65536). */
  def bucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long")

  private def threshold(permille: Int): Long = {
    require(permille >= 0 && permille <= 1000,
      s"permille out of range: $permille")
    permille * 65536L / 1000L
  }

  /** Keep predicate for a uniform `permille`/1000 sample. */
  def keep(id: Column, permille: Int): Column =
    bucket16(id) < lit(threshold(permille))

  /** Per-stratum sampling rates (permille) with a default — the curation
    * move that rebalances an over-represented stratum (e.g. keep 10% of
    * English docs, 50% of every other language). */
  def stratifiedKeep(id: Column, stratum: Column,
                     rates: Seq[(String, Int)],
                     defaultPermille: Int): Column = {
    val t = rates.foldLeft(when(lit(false), lit(0L))) {
      case (c, (s, p)) => c.when(stratum === s, lit(threshold(p)))
    }.otherwise(lit(threshold(defaultPermille)))
    bucket16(id) < t
  }
}
