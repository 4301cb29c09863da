package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import graft.plans.TopKPerGroupNode

/** User-facing entry to the [[graft.plans.TopKPerGroupNode]] operator:
  * top-k rows per group with an appended 1-based `rk` column, planned by
  * the custom strategy into a map-side-pruned two-phase physical plan
  * (see the node's scaladoc for why this beats the window formulation at
  * scale).
  *
  * Pass df-bound columns (`df("c")`) so expressions arrive resolved; sort
  * direction is an explicit flag because the public `Column.desc` wraps
  * an internal sort node rather than a catalyst SortOrder. */
object TopK {
  /** orderCols: (column, descending?) pairs, highest-priority first. */
  def perGroup(df: DataFrame, groupCols: Seq[Column],
               orderCols: Seq[(Column, Boolean)], k: Int): DataFrame = {
    val order = orderCols.map { case (c, desc) =>
      SortOrder(GraftSqlBridge.expression(c),
        if (desc) Descending else Ascending)
    }
    GraftSqlBridge.dataFrame(df.sparkSession,
      TopKPerGroupNode(groupCols.map(GraftSqlBridge.expression), order, k,
        df.queryExecution.analyzed))
  }
}
