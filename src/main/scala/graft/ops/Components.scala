package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the step every dedup
  * pipeline runs AFTER candidate-pair generation: near-dup pairs only
  * relate documents two at a time, but retention decisions need the
  * transitive duplicate CLUSTER (if a~b and b~c, keeping a and c is
  * still a leak). The north-star extension of the reference's pairwise
  * exact dedup (commercial_rfp_raw_data_ingestion_and_cleaning.py:251).
  *
  * Algorithm: iterative min-label propagation — every node starts
  * labeled with itself; each round, a node adopts the minimum label in
  * its closed neighborhood; stop at fixpoint. This is the standard
  * shuffle-based connected components used for web-scale dedup: each
  * round is one join + one aggregation (both on the node key), rounds ≤
  * the largest cluster's diameter — small by construction for near-dup
  * clusters (capBuckets bounds bucket size upstream, and dup clusters
  * are dense). The result is the fixpoint min-reachable-id labeling, so
  * it is deterministic regardless of execution order.
  *
  * The driver-side convergence loop holds only a changed-row COUNT per
  * round — no data is collected.
  */
object Components {

  /** (node, cluster_id) for every node in `edges` (columns `a`, `b`);
    * cluster_id = the minimum node id reachable from the node. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    var changed = 1L
    var i = 0
    var prev: DataFrame = null
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.toDF("src", "dst")
        .join(labels, col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(min(col("label")).as("nbr_label"))
      // plain one-hop propagation: rounds = cluster diameter. The
      // pointer-jumping shortcut (adopt the label OF the label, O(log d)
      // rounds) was measured SLOWER here — its extra per-round self-join
      // shuffle outweighs the saved rounds for the small-diameter
      // clusters near-dup pipelines produce; reach for it only if
      // cluster diameters grow past ~tens.
      val next = labels.join(nbrMin, col("node") === col("src"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("next_label"))
      // one action per round: count the not-yet-converged rows; persist
      // so the count and the next round's input share the computation,
      // and drop the previous round's cache once this one materialized
      val persisted = next.persist()
      changed = persisted.filter(col("next_label") =!= col("label")).count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = persisted
      labels = persisted.select(col("node"), col("next_label").as("label"))
      i += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
