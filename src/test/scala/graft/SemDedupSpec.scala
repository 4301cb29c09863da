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

  test("diversify (D4): per-cell quotas hold, nothing flagged is drawn") {
    // q_diverse_sample composes q_semdedup: the draw pool is exactly the
    // !is_dup keep-set, cells are the same k-means cells, and every cell
    // yields min(quota, keepers) rows — the cluster-balancing property.
    val audit = Registry.byName("q_semdedup").fn(spark, "/root/testdata/sf0.001")
    val sel = Registry.byName("q_diverse_sample").fn(spark, "/root/testdata/sf0.001")
    val dupIds = audit.filter(col("is_dup")).select("vec_id")
    assert(sel.join(dupIds, "vec_id").isEmpty,
      "a semantically-flagged duplicate was drawn")
    val quota = 32
    val expect = audit.filter(!col("is_dup")).groupBy("cell")
      .agg(least(count(lit(1)), lit(quota.toLong)).as("want"))
    val got = sel.groupBy("cell").agg(count(lit(1)).as("got"))
    assert(expect.join(got, Seq("cell"), "full")
      .filter(col("want").isNull || col("got").isNull ||
        col("want") =!= col("got")).isEmpty,
      "per-cell draw count != min(quota, keep-set size)")
  }

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
