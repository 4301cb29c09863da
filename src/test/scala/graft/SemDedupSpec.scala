package graft

import org.apache.spark.sql.functions._

/** Semantic pins for q_semdedup that the oracle hash-compare can't
  * express: the flagged set must coincide EXACTLY with "shares the
  * representative's underlying center" on the clustered fixture, whose
  * ground truth is center = vec_id % 20 by construction
  * (SimilarityQueries.clusteredEmb). */
class SemDedupSpec extends SparkSpec {

  private lazy val rows = Registry.byName("q_semdedup")
    .fn(spark, "/root/testdata/sf0.001")
    .withColumn("ctr", col("vec_id") % 20)
    .withColumn("rep_ctr", col("rep_id") % 20)
    .collect()

  test("every flagged duplicate shares its representative's center") {
    val dups = rows.filter(_.getAs[Boolean]("is_dup"))
    assert(dups.nonEmpty, "fixture should produce semantic dups")
    assert(dups.forall(r =>
      r.getAs[Long]("ctr") == r.getAs[Long]("rep_ctr")),
      "a cross-center pair scored above tau")
  }

  test("every same-center member of a cell is flagged (no misses)") {
    val missed = rows.filter { r =>
      !r.getAs[Boolean]("is_dup") &&
        r.getAs[Long]("vec_id") != r.getAs[Long]("rep_id") &&
        r.getAs[Long]("ctr") == r.getAs[Long]("rep_ctr")
    }
    assert(missed.isEmpty,
      s"same-center members under tau: ${missed.take(3).mkString(", ")}")
  }

  test("representatives are never self-flagged and score 1.0") {
    val reps = rows.filter(r =>
      r.getAs[Long]("vec_id") == r.getAs[Long]("rep_id"))
    assert(reps.nonEmpty)
    assert(reps.forall(r => !r.getAs[Boolean]("is_dup") &&
      math.abs(r.getAs[Double]("score") - 1.0) < 1e-6))
  }
}
