package graft

import org.apache.spark.sql.functions._
import graft.ops.Triangles

/** Degree-ordered triangle counting vs brute-force ground truth, plus the
  * wedge-volume property that IS the algorithm's scale claim. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tri = for {
      x <- nodes; y <- nodes if y > x && es((x, y))
      z <- nodes if z > y && es((y, z)) && es((x, z))
    } yield Seq(x, y, z)
    tri.flatten.groupBy(identity).map { case (n, occ) => n -> occ.size.toLong }
  }

  private def engine(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cliques, chains, and mixed graphs match brute force") {
    // K4 (4 triangles), a chain (0), a triangle hanging off the clique
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), // K4
      (10, 11), (11, 12), (12, 13),                   // chain: no triangles
      (4, 20), (4, 21), (20, 21))                     // pendant triangle
    assert(engine(edges) === brute(edges))
    val got = engine(edges)
    assert(got(1L) === 3L && got(4L) === 4L && !got.contains(10L))
  }

  test("fuzz: 300 random edges match brute force") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    assert(engine(edges) === brute(edges))
  }

  test("celebrity node generates zero wedges (the skew guarantee)") {
    // star: hub 0 with 50 followers + one triangle among followers.
    // Degree-orientation points every star edge AT the hub, so the hub's
    // out-degree is 0 — the naive node-iterator would enumerate C(50,2)
    // wedges at the hub; the oriented plan enumerates exactly the one
    // wedge of the pendant triangle's source.
    val star = (1L to 50L).map(i => (0L, i)) ++ Seq((1L, 2L))
    assert(engine(star) === brute(star))
    assert(engine(star) === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
