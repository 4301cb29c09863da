package graft

import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin

/** FastSS fuzzy join vs the ground truth its blocking must never miss:
  * brute-force all-pairs levenshtein ≤ 1. The neighborhood argument
  * (substitution / insertion / deletion pairs all share a variant) is a
  * completeness CLAIM — this spec checks it exhaustively on a corpus
  * built to hit each edit type plus a randomized fuzz set. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(names: Seq[(Long, String)],
                         maxDist: Int = 1): Set[(Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ka, sa) <- names; (kb, sb) <- names
      if ka < kb && lev(sa, sb) <= maxDist
    } yield (ka, kb)).toSet
  }

  private def engine(names: Seq[(Long, String)],
                     maxDist: Int = 1): Set[(Long, Long)] =
    FuzzyJoin.edJoin(names.toDF("k", "s"), "k", "s", maxDist)
      .select("a_key", "b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("every edit type is found; distance-2 pairs are not") {
    val names = Seq(
      1L -> "widget", 2L -> "wadget", // substitution
      3L -> "widgets",                // insertion vs 1
      4L -> "idget",                  // deletion vs 1
      5L -> "widget",                 // exact duplicate of 1
      6L -> "wodgets",                // 2 edits from 1 — must NOT match
      7L -> "gadget",                 // 2 subs from 1 — must NOT match
      8L -> "")                       // empty string edge
    val got = bruteForce(names)
    assert(got === engine(names))
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((1L, 4L)) && got.contains((1L, 5L)))
    assert(!got.contains((1L, 6L)) && !got.contains((1L, 7L)))
  }

  test("fuzz: blocking never misses a true pair (200 mutated names)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // substitute
        val i = rnd.nextInt(s.length)
        s.updated(i, alphabet(rnd.nextInt(alphabet.length)))
      case 1 => // insert
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i)
      case _ if s.nonEmpty => // delete
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + s.substring(i + 1)
      case _ => s
    }
    val base = (0 until 50).map(i =>
      (0 until 4 + rnd.nextInt(5)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val names = (base ++ base.map(mutate) ++ base.map(s => mutate(mutate(s))) ++
      base.map(identity)).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    assert(engine(names) === bruteForce(names))
  }

  test("depth 2: every 2-edit composition is found; distance-3 is not") {
    val names = Seq(
      1L -> "widget", 2L -> "wodgets", // sub + insert
      3L -> "gadget",                  // 2 subs
      4L -> "idet",                    // 2 deletes
      5L -> "xwidgety",                // 2 inserts
      6L -> "wadet",                   // sub + delete
      7L -> "gadgets",                 // 3 edits from 1 — must NOT match
      8L -> "", 9L -> "ab")            // short-string edges
    val got = bruteForce(names, 2)
    assert(got === engine(names, 2))
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(k => got.contains((1L, k))))
    assert(!got.contains((1L, 7L)))
  }

  test("depth-2 fuzz: blocking never misses a true pair") {
    val rnd = new scala.util.Random(77)
    val alphabet = "abcd"
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty =>
        val i = rnd.nextInt(s.length)
        s.updated(i, alphabet(rnd.nextInt(alphabet.length)))
      case 1 =>
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i)
      case _ if s.nonEmpty =>
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + s.substring(i + 1)
      case _ => s
    }
    val base = (0 until 40).map(_ =>
      (0 until 4 + rnd.nextInt(4)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val names = (base ++ base.map(mutate) ++ base.map(s => mutate(mutate(s))))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    assert(engine(names, 2) === bruteForce(names, 2))
  }

  test("depth-1 matches are a subset of depth-2 (cluster refinement)") {
    val rnd = new scala.util.Random(5)
    val names = (0 until 60).map(i =>
      (i.toLong, (0 until 5).map(_ => "abc"(rnd.nextInt(3))).mkString))
    val e1 = engine(names, 1)
    val e2 = engine(names, 2)
    assert(e1.subsetOf(e2))
  }
}
