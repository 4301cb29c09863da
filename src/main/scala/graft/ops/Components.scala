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
    * cluster_id = the minimum node id reachable from the node.
    *
    * Resource contract: returns with NO blocks left in the cache. Each
    * round's intermediate is persisted only until the next round
    * materializes, and the final labeling is checkpointed (lineage
    * truncated) before the last cache is dropped — unpersisting alone
    * would leave the caller a plan that re-runs every round, with each
    * round referencing its input twice (exponential recompute). Uses the
    * session checkpoint dir; if none is configured, a local temp dir is
    * set (single-JVM convenience — on a real cluster set
    * `sc.setCheckpointDir` to shared storage first). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
    // one propagation hop: each node adopts the min label in its closed
    // neighborhood. Plain one-hop propagation: rounds = cluster
    // diameter. The pointer-jumping shortcut (adopt the label OF the
    // label, O(log d) rounds) was measured SLOWER here — its extra
    // per-round self-join shuffle outweighs the saved rounds for the
    // small-diameter clusters near-dup pipelines produce; reach for it
    // only if cluster diameters grow past ~tens.
    def hop(cur: DataFrame): DataFrame = {
      val nbrMin = sym.toDF("src", "dst")
        .join(cur.select(col("node"), col("label")),
          col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(min(col("label")).as("nbr_label"))
      cur.join(nbrMin, col("node") === col("src"), "left")
        .select(
          cur.columns.filter(_ != "label").map(col).toIndexedSeq :+
            least(col("label"), coalesce(col("nbr_label"), col("label")))
              .as("label"): _*)
    }
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    var changed = 1L
    var rounds = 0
    var prev: DataFrame = null
    while (changed > 0 && rounds < maxIter) {
      // TWO hops per action: labels only ever decrease, so "no change
      // across a double-hop" implies neither hop changed anything — the
      // convergence check stays exact while the count actions (and
      // persist materializations) halve. `label0` carries the
      // pre-double-hop label through both hops for the changed filter.
      val next = hop(hop(labels.withColumn("label0", col("label"))))
      val persisted = next.persist()
      changed = persisted.filter(col("label") =!= col("label0")).count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = persisted
      labels = persisted.select(col("node"), col("label"))
      rounds += 2
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds")
    // checkpoint (eager) cuts the plan free of the cached iteration
    // chain, so the final unpersist leaves the session cache-clean
    val out = labels.select(col("node"), col("label").as("cluster_id"))
      .checkpoint(eager = true)
    if (prev != null) prev.unpersist(blocking = false)
    out
  }
}
