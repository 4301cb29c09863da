package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget data selection: documents taken in (quality DESC,
  * doc_id ASC) priority order while the running token total stays ≤ the
  * budget (monotone running sum → the selection is an exact prefix).
  * This is the "fill the training budget with the best data first" step
  * that follows quality scoring in a pretraining pipeline.
  *
  * THE POINT IS THE PLAN. The naive formulation is a running sum over ONE
  * global ordering — a single-partition window over the whole corpus, the
  * classic scale-killer (the q_budget_select DuckDB oracle runs exactly
  * that formulation, making the cross-engine check a two-algorithm
  * proof; BudgetSelectSpec re-proves the equivalence in-engine on
  * adversarial synthetic corpora). [[selected]] computes the same prefix
  * hierarchically instead:
  *
  *   1. per-quality-tier token totals (grid-bounded, ≤5 rows on the
  *      heuristic scorer) locate the BOUNDARY tier via a cumulative
  *      window over tiers; full tiers are taken by broadcast semi-join
  *      without ever ordering their members;
  *   2. inside the one boundary tier, fixed-width doc_id ranges
  *      (div 1024) locate the boundary RANGE the same way;
  *   3. only the ≤1024-row boundary range pays a per-document running
  *      sum, partitioned by its range key.
  *
  * Every window runs over a bounded or corpus/1024-sized frame. At
  * 100 TB the middle level grows as n/1024 — add one div level per ~3
  * orders of magnitude (log-depth prefix decomposition); two levels are
  * shown because they cover the tested scales.
  *
  * Boundary conventions (disjoint + exhaustive, pinned by the spec's
  * exact-equivalence property): full tier = prev+bt ≤ B; boundary tier =
  * prev ≤ B < prev+bt (at most one — cumulative intervals are disjoint);
  * a bt=0 tier sitting exactly at prev=B is a FULL tier (its zero-token
  * docs have cum=B ≤ B, and the boundary predicate correctly rejects
  * it). Zero-token documents elsewhere are selected whenever their
  * prefix position allows — callers must coalesce NULL token counts
  * to 0 on both engines.
  */
object BudgetSelect {

  /** The selected prefix of `scored(doc_id, quality, toks)` under
    * `budget` (a broadcast single-row frame with column `b`). Returns the
    * selected rows (doc_id, quality, toks). */
  def selected(scored: DataFrame, budget: DataFrame): DataFrame = {
    val tierW = Window.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val c1 = scored.groupBy("quality").agg(sum(col("toks")).as("bt"))
      .withColumn("prev1", coalesce(sum(col("bt")).over(tierW), lit(0L)))
      .crossJoin(broadcast(budget))
    val full1 = c1.filter(col("prev1") + col("bt") <= col("b"))
      .select("quality")
    val bnd1 = c1.filter(col("prev1") <= col("b") &&
        col("prev1") + col("bt") > col("b"))
      .select(col("quality").as("bq"), (col("b") - col("prev1")).as("rem"))
    val sel1 = scored.join(broadcast(full1), Seq("quality"))
    val inB = scored.join(broadcast(bnd1), col("quality") === col("bq"))
      .withColumn("sub", expr("doc_id div 1024"))
    val subW = Window.orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c2 = inB.groupBy("sub", "rem").agg(sum(col("toks")).as("st"))
      .withColumn("prev2", coalesce(sum(col("st")).over(subW), lit(0L)))
    val full2 = c2.filter(col("prev2") + col("st") <= col("rem"))
      .select("sub")
    val bnd2 = c2.filter(col("prev2") <= col("rem") &&
        col("prev2") + col("st") > col("rem"))
      .select(col("sub").as("bsub"), (col("rem") - col("prev2")).as("rem2"))
    val sel2 = inB.join(broadcast(full2), Seq("sub"))
    val sel3 = inB.join(broadcast(bnd2), col("sub") === col("bsub"))
      .withColumn("cum", sum(col("toks")).over(
        Window.partitionBy(col("sub")).orderBy(col("doc_id"))))
      .filter(col("cum") <= col("rem2"))
    sel1.select("doc_id", "quality", "toks")
      .unionByName(sel2.select("doc_id", "quality", "toks"))
      .unionByName(sel3.select("doc_id", "quality", "toks"))
  }

  /** Per-tier summary of [[selected]]: (quality, n_docs, toks_all, n_sel,
    * toks_sel) — one row per tier present in `scored`, zeros for tiers
    * the budget never reaches. */
  def summary(scored: DataFrame, budget: DataFrame): DataFrame = {
    val bkt = scored.groupBy("quality")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("toks_all"))
    val selAgg = selected(scored, budget).groupBy("quality")
      .agg(count(lit(1)).as("n_sel"), sum(col("toks")).as("toks_sel"))
    bkt.join(selAgg, Seq("quality"), "left")
      .select(col("quality"), col("n_docs"), col("toks_all"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        coalesce(col("toks_sel"), lit(0L)).as("toks_sel"))
  }

  /** The standing budget: total corpus tokens div 4, as a one-row frame. */
  def quarterBudget(scored: DataFrame): DataFrame =
    scored.agg(sum(col("toks")).as("tot")).select(expr("tot div 4").as("b"))
}
