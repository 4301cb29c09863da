package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing — assigning ordered documents/chunks to
  * fixed-budget bins (sequence packing for LLM training batches): within
  * each group, items are taken in a deterministic order and a new bin
  * starts once the running weight (token count) reaches the budget.
  *
  * Semantics (identical in the DuckDB oracle): `pack_id =
  * floor(exclusive_running_sum(weight) / budget)` — contiguous running-
  * total binning. An item that crosses a budget boundary stays in the bin
  * it started in (bins may overflow by at most one item's weight; no item
  * is split). This is the standard streaming approximation of bin
  * packing: exact first-fit-decreasing needs global state, running-total
  * binning needs one window — and only the latter scales.
  *
  * Scale: one shuffle (the group-partitioned window). Packing is
  * inherently sequential per group, so the group key chooses the
  * parallelism unit; a skewed group salts exactly like the Dedup windows.
  */
object Pack {

  /** Adds `pack_id` within `group`, ordering items by `order`. */
  def packByBudget(df: DataFrame, group: Column, order: Column,
                   weight: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prior", coalesce(sum(weight).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__prior") / budget).cast("long"))
      .drop("__prior")
  }
}
