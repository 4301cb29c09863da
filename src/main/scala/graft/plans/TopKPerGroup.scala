package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** TopKPerGroup — a whole-operator Catalyst extension (the (c) tier of
  * the custom-operator ladder: LogicalPlan + Strategy + SparkPlan,
  * registered through [[graft.GraftExtensions]]).
  *
  * Why it exists: the built-in formulation of "top k rows per group" is
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k`, which
  * shuffles EVERY row to its group's partition and fully sorts each
  * group. This operator keeps a bounded k-row heap per group on the map
  * side, shuffles only the ≤ k·|groups| local winners, and re-heaps +
  * ranks after the exchange — the aggregation-style partial/final split
  * applied to ranking. At 100 TB with small k the shuffle shrinks by
  * orders of magnitude; memory is O(groups·k) per task by construction.
  *
  * Semantics: exactly the window formulation's — deterministic given a
  * total order (same contract as every dedup in this engine), rank
  * column appended as `rk` (1-based). TopKSpec asserts row-identity with
  * the window plan; q_topk_native shares q_topk_per_group's oracle.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int,
                            child: LogicalPlan,
                            // constructor field (NOT a body val): tree
                            // copies must preserve the exprId or every
                            // downstream reference to `rk` unbinds
                            rankAttr: AttributeReference =
                              AttributeReference("rk", IntegerType,
                                nullable = false)()) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      FinalTopKExec(n.groupExprs, n.order, n.k, n.rankAttr,
        LocalTopKExec(n.groupExprs, n.order, n.k, planLater(n.child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pruning: retain the k first rows (per group) in
  * `order`'s sequence, from an arbitrarily-ordered iterator. */
private[plans] object TopKHeaps {
  def prune(it: Iterator[InternalRow], groupExprs: Seq[Expression],
            order: Seq[SortOrder], k: Int, input: Seq[Attribute])
      : Iterator[(UnsafeRow, java.util.PriorityQueue[UnsafeRow])] = {
    val keyProj = UnsafeProjection.create(groupExprs, input)
    val rowProj = UnsafeProjection.create(input.map(a => a: Expression), input)
    val ord = RowOrdering.create(order, input)
    // heap head = worst retained row (reverse order)
    val heaps = new java.util.LinkedHashMap[UnsafeRow,
      java.util.PriorityQueue[UnsafeRow]]()
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](k,
          ord.reversed().asInstanceOf[java.util.Comparator[UnsafeRow]])
        heaps.put(key.copy(), heap)
      }
      if (heap.size() < k) heap.add(rowProj(row).copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(rowProj(row).copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
  }
}

/** Map-side pruning: emits each partition's ≤ k-per-group winners. */
case class LocalTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { it =>
      TopKHeaps.prune(it, groupExprs, order, k, child.output)
        .flatMap { case (_, heap) =>
          import scala.jdk.CollectionConverters._
          heap.iterator().asScala
        }
    }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Reduce side: re-prunes the shuffled survivors per group, sorts each
  * ≤k-row group, appends the 1-based rank. */
case class FinalTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, rankAttr: AttributeReference,
                         child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  // empty grouping = global top-k: ALL local winners must meet in one
  // place (UnspecifiedDistribution would emit k rows per partition)
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { it =>
      val ord = RowOrdering.create(order, child.output)
      val outProj = UnsafeProjection.create(output.map(a => a: Expression),
        child.output :+ rankAttr)
      TopKHeaps.prune(it, groupExprs, order, k, child.output)
        .flatMap { case (_, heap) =>
          val rows = new Array[UnsafeRow](heap.size())
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // heap pops worst-first
          val joined = new JoinedRow
          rows.iterator.zipWithIndex.map { case (r, idx) =>
            outProj(joined(r, new GenericInternalRow(Array[Any](idx + 1))))
          }
        }
    }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}
