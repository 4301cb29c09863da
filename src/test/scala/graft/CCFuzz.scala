package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

/** Throwaway deterministic fuzzer for the ComponentsSpec property: runs
  * seeded random graphs through both CC variants and the in-memory
  * union-find oracle, printing the first mismatch verbatim. Exists to
  * reproduce (or rule out) a scalacheck failure without paying its
  * shrink loop, which re-runs an iterative Spark job per candidate. */
object CCFuzz {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 200
    val seed = if (args.length > 1) args(1).toLong else 42L
    // nodes must stay under the fixpoint's maxIter=25 diameter bound
    // (a path over all nodes is reachable by the generator)
    val nodes = if (args.length > 2) args(2).toInt else 16
    val nEdges = if (args.length > 3) args(3).toInt else 12
    val spark = SparkTestSession.get
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    var failures = 0
    for (i <- 0 until iters) {
      val n = nEdges
      val raw = List.fill(n)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      val edges0 = raw.filter { case (a, b) => a != b }
      if (edges0.nonEmpty) {
        val df = edges0.toDF("a", "b")
        val got =
          try Right(Components.connectedComponents(df)
            .as[(Long, Long)].collect().toMap)
          catch { case e: Exception => Left(e) }
        val star =
          try Right(Components.connectedComponentsStar(df)
            .as[(Long, Long)].collect().toMap)
          catch { case e: Exception => Left(e) }
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
        val want = nodes.groupBy(find).values.flatMap { ns =>
          val m = ns.min; ns.map(_ -> m)
        }.toMap
        (got, star) match {
          case (Right(g), Right(st)) if g == want && st == want => ()
          case _ =>
            failures += 1
            println(s"FAIL iter=$i edges=$edges0")
            println(s"  fixpoint=$got")
            println(s"  star=$star")
            println(s"  want=$want")
        }
      }
      if ((i + 1) % 5 == 0) {
        println(s"...${i + 1}/$iters done (failures=$failures) " +
          s"${System.currentTimeMillis()}")
        Console.flush()
      }
    }
    println(s"DONE: $iters iterations, $failures failures")
    spark.stop()
    sys.exit(if (failures > 0) 1 else 0)
  }
}
