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

  /** Leak-free split assignment: the split label is a function of the
    * GROUP id's md5 bucket — hand it a duplicate-cluster representative
    * and every near-duplicate lands on the same side, the contamination
    * guard a per-row split cannot give (a per-row hash would strand one
    * copy of a near-dup pair in train and its twin in eval). `cuts` are
    * (label, cumulative permille upper bound) pairs ending at 1000, e.g.
    * Seq("train" -> 900, "eval" -> 1000) for a 90/10 split. Pure
    * projection like [[keep]]: deterministic, partition-invariant, and
    * at 100 TB it costs nothing beyond the group labeling it consumes. */
  def splitByGroup(groupId: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 1000,
      s"cuts must end at 1000 permille: $cuts")
    val bounds = cuts.map(_._2)
    require(bounds == bounds.sorted && bounds.distinct == bounds,
      s"cut bounds must be strictly increasing: $bounds")
    val b = bucket16(groupId)
    cuts.init.reverse.foldLeft(lit(cuts.last._1)) {
      case (rest, (label, ub)) => when(b < threshold(ub), label).otherwise(rest)
    }
  }

  /** EXACTLY-k-per-stratum deterministic uniform sample (the eval-set
    * carve: "give me 1000 docs per language, reproducibly"): the k rows
    * with the smallest md5(id) per stratum, with a 1-based `rk`. Hash
    * order is uniform and depends only on ids — partition- and
    * rerun-invariant like [[keep]], but with an exact count a rate can't
    * promise. Rides the custom TopK operator: bounded map-side heaps, so
    * only k·|strata| rows shuffle — a `row_number` window formulation
    * would shuffle and sort the entire corpus. Ids must be unique (the
    * id is the tiebreak, so sampling is total-ordered regardless). */
  def sampleK(df: org.apache.spark.sql.DataFrame, stratumCol: String,
              idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val withH = df.withColumn("__h", md5(col(idCol).cast("string")))
    graft.ops.TopK.perGroup(withH, Seq(withH(stratumCol)),
        Seq(withH("__h") -> false, withH(idCol) -> false), k)
      .drop("__h")
  }
}
