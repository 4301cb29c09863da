package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting via the degree-ordered node-iterator (the
  * MapReduce formulation of Schank's forward algorithm; cf. Suri &
  * Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
  * WWW 2011 — the title is literally about the skew this orientation
  * exists to kill). The graph layer the dedup/ER family lacks a metric
  * for: triangle density distinguishes a genuine duplicate CLIQUE from a
  * hub-and-spoke chain of borderline matches, the precursor to local
  * clustering coefficients.
  *
  * Algorithm: orient every undirected edge from its (degree, id)-lower
  * endpoint to the higher; each triangle then has exactly one node with
  * two outgoing edges (the acyclic orientation's unique source), so
  * joining out-edges on a shared source yields each wedge once, and an
  * equi-join against the undirected edge set closes it. Every triangle is
  * found exactly once — no per-triangle dedup pass.
  *
  * Scale: wedge volume is Σ out-deg², and degree-ordering bounds
  * out-degree by O(√m) — a celebrity node with a million low-degree
  * followers generates NO wedges at the celebrity (all its edges point
  * in), where the naive node-iterator would enumerate 10¹² pairs on one
  * reducer. Both joins are keyed shuffles; the degree frame is one
  * map-side-combined count.
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected edge set
    * (`a` < `b`, deduped). Output: (node, n_tri), nodes in ≥1 triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    val deg = edges.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient a→b iff (d,id)(a) < (d,id)(b); ties impossible on id
    val ed = edges
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
    val w = ed.select(col("src"), col("dst").as("x"))
      .join(ed.select(col("src"), col("dst").as("y")), "src")
      .filter(col("x") < col("y"))
    // close the wedge against the undirected set (x < y matches a < b)
    val tri = w.join(edges, col("x") === col("a") && col("y") === col("b"))
      .select(col("src").as("u"), col("x"), col("y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
