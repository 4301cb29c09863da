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
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          ckptEvery: Int = 4): DataFrame = {
    require(ckptEvery >= 1, s"ckptEvery must be >= 1: $ckptEvery")
    val sc = edges.sparkSession.sparkContext
    Checkpoints.ensureDir(sc)
    // the symmetrized edge list is joined EVERY round: checkpoint it
    // once so (a) an expensive upstream edge plan — e.g. the FastSS
    // variant join feeding q_entity_canon — executes once, not
    // once per round, and (b) the per-round logical plan embeds a
    // constant-size scan instead of the whole upstream tree (observed:
    // multi-MB plan strings per action on the depth-2 match graph,
    // re-rendered every round, before this truncation)
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .checkpoint(eager = true)
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
      // one hop per action; `label0` carries the pre-hop label for the
      // changed filter. (A double-hop-per-action variant — exact because
      // labels only decrease — halves the count actions but serializes
      // two joins into every job; measured 4.6 s vs 2.8 s on
      // q_dup_clusters at sf0.1, so the extra action is the cheaper
      // side of the trade here.)
      val next = hop(labels.withColumn("label0", col("label")))
      val persisted = next.persist()
      changed = persisted.filter(col("label") =!= col("label0")).count()
      // blocking: with async unpersist, removal lags job submission and
      // a fast convergence loop can hold every round's blocks at once
      if (prev != null) prev.unpersist(blocking = true)
      rounds += 1
      if (changed > 0 && rounds % ckptEvery == 0) {
        // periodic lineage truncation: persist keeps EXECUTION linear but
        // the LOGICAL plan still doubles per round (hop references its
        // input twice), so a long-diameter graph grows the plan tree
        // exponentially — observed as a driver heap OOM inside the
        // per-action plan-string rendering (explainString) after ~12
        // rounds, long before any executor limit. A checkpoint every few
        // rounds caps plan depth at a constant for one extra
        // materialization per ckptEvery rounds; dedup clusters converge
        // in <= ckptEvery rounds and never pay it.
        labels = persisted.select(col("node"), col("label"))
          .checkpoint(eager = true)
        persisted.unpersist(blocking = true)
        prev = null
      } else {
        prev = persisted
        labels = persisted.select(col("node"), col("label"))
      }
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds")
    // checkpoint (eager) cuts the plan free of the cached iteration
    // chain, so the final unpersist leaves the session cache-clean
    val out = labels.select(col("node"), col("label").as("cluster_id"))
      .checkpoint(eager = true)
    if (prev != null) prev.unpersist(blocking = true)
    out
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    * the same (node, cluster_id) API and resource contract as
    * [[connectedComponents]], converging in O(log n) rounds regardless
    * of component DIAMETER. Use it when clusters can be long chains
    * (similarity graphs stitched through transitive near-dups); for the
    * small-diameter clusters capBuckets-guarded dedup produces, the
    * plain fixpoint needs fewer shuffles per round and wins.
    *
    * Each round rewrites the EDGE set (no label table):
    *  - large-star(u): every neighbor v > u re-links to
    *    m(u) = min(N(u) ∪ {u}) — per-edge emit, one min-groupBy + one
    *    equi-join, both on the node key; no neighborhood is ever
    *    collected into one row, so high-degree hubs spread across
    *    partitions instead of building a driver- or row-sized list.
    *  - small-star(u): every neighbor v ≤ u (and u itself) re-links
    *    to m(u).
    * At the joint fixpoint the edges form a star forest rooted at each
    * component's min id. Convergence is detected by an exact-count +
    * xxhash64-xor signature of the canonicalized edge set (one action
    * per round; a hash collision would need 2⁻⁶⁴ bad luck AND an
    * identical edge count).
    *
    * Each round CHECKPOINTS rather than caches: a round's plan
    * references its input ~16× (two sym() fan-outs and two
    * neighborhood-min joins), so carrying lineage across rounds grows
    * the logical plan 16^rounds — persist alone keeps execution linear
    * but still overflows the planner's tree walks after a handful of
    * rounds. Truncating per round keeps the plan O(1) and, as a
    * side-effect, the loop holds zero cache blocks at any point. */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    Checkpoints.ensureDir(sc)

    def sym(e: DataFrame): DataFrame =
      e.unionAll(e.select(col("b").as("a"), col("a").as("b")))

    // per-node min over the closed neighborhood, m(u) = min(N(u) ∪ {u})
    def mins(s: DataFrame): DataFrame =
      s.groupBy(col("a")).agg(least(min(col("b")), col("a")).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.join(mins(s), "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val withM = s.join(mins(s), "a")
      val relinked = withM.filter(col("b") <= col("a"))
        .select(col("b").as("n"), col("m"))
        .unionAll(withM.select(col("a").as("n"), col("m")))
      relinked.filter(col("n") =!= col("m"))
        .select(col("n").as("a"), col("m").as("b"))
        .distinct()
    }

    def signature(e: DataFrame): (Long, Long) = {
      val row = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).head()
      (row.getLong(0), row.getLong(1))
    }

    // r19 (one action per round instead of two): the per-round signature
    // rides the checkpoint's own materialization as an OBSERVED metric
    // (Dataset.observe — computed as the rows stream to the checkpoint
    // writer, no second scan). Observed metrics are accumulator-backed,
    // and accumulators can over-count under task re-execution, so the
    // convergence DECISION never rests on them alone: when two
    // consecutive observed signatures match, the loop confirms with the
    // exact [[signature]] aggregation over both checkpointed edge sets
    // (two cheap scans, once at convergence) — a phantom match keeps
    // iterating (smallStar∘largeStar is idempotent at the fixpoint, so
    // extra rounds cannot change the answer), a phantom mismatch only
    // costs those extra rounds. Saves rounds−2 jobs per call; in local
    // mode (no speculation, task failure fails the job) the observed
    // values are exact anyway.
    def observed(e: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (e.observe(obs, count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L)).as("x"))
        .checkpoint(eager = true), obs)
    }
    def sigOf(obs: org.apache.spark.sql.Observation): (Long, Long) = {
      val m = obs.get
      (m("n").asInstanceOf[Long], m("x").asInstanceOf[Long])
    }

    val nodes = sym(edges.select(col("a"), col("b")))
      .select(col("a").as("node")).distinct()
    var (cur, obs0) = observed(
      edges.select(col("a"), col("b"))
        .filter(col("a") =!= col("b")).distinct())
    var sig = sigOf(obs0)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val (next, obs) = observed(smallStar(largeStar(cur)))
      val nextSig = sigOf(obs)
      converged = nextSig == sig && signature(next) == signature(cur)
      cur = next
      sig = nextSig
      rounds += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // star forest: non-roots appear as `a` pointing at the component
    // min; roots (and self-loop-only singletons) label themselves
    nodes
      .join(cur.select(col("a").as("node"), col("b").as("cluster_id")),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("cluster_id"), col("node")).as("cluster_id"))
  }
}
