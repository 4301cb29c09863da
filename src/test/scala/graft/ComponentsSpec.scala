package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

/** Connected components: hand-checked shapes plus a property check
  * against an in-memory union-find oracle on random graphs. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, triangles, and isolated pairs get min-id labels") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),   // chain -> cluster 1
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle -> cluster 10
      (20L, 21L)                      // pair -> cluster 20
    ).toDF("a", "b")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("leaves no cached blocks behind (resource contract)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Components.connectedComponents(edges)
    // materialize the RESULT after return — the caller's normal use —
    // and check the iteration's per-round persists are all gone
    assert(out.count() === 5)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"connectedComponents leaked cached RDDs: ${after -- before}")
  }

  test("property: equals an in-memory union-find on random graphs") {
    import org.scalacheck.{Gen, Prop}
    val edgeGen = Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L))
    checkProp(Prop.forAll(Gen.listOfN(12, edgeGen)) { raw =>
      val edges0 = raw.filter { case (a, b) => a != b }
      edges0.isEmpty || {
        val got = Components.connectedComponents(edges0.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        // union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        for ((a, b) <- edges0) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
        }
        val nodes = edges0.flatMap { case (a, b) => Seq(a, b) }.distinct
        // canonical label = min node of the component
        val byRoot = nodes.groupBy(find)
        val want = byRoot.values.flatMap { ns =>
          val m = ns.min; ns.map(_ -> m)
        }.toMap
        got == want
      }
    }, minTests = 10)
  }
}
