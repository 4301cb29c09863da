package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.BudgetSelect

/** q_budget_select's engine-side proof: the hierarchical prefix-sum plan
  * must agree EXACTLY with the naive single-window formulation (the same
  * two-algorithm check the gate oracle runs cross-engine, here run
  * in-engine so it also covers synthetic edge corpora the fixtures don't
  * reach: zero-token docs, budgets landing exactly on tier edges, sparse
  * doc_id ranges). */
class BudgetSelectSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def naiveSummary(scored: org.apache.spark.sql.DataFrame,
                           b: Long): Map[Long, (Long, Long, Long, Long)] = {
    val cum = scored.withColumn("cum", sum(col("toks")).over(
      Window.orderBy(col("quality").desc, col("doc_id"))))
    val sel = cum.filter(col("cum") <= lit(b))
      .groupBy("quality")
      .agg(count(lit(1)).as("n_sel"), sum(col("toks")).as("toks_sel"))
    scored.groupBy("quality")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("toks_all"))
      .join(sel, Seq("quality"), "left")
      .collect().map { r =>
        r.getAs[Long]("quality") -> ((r.getAs[Long]("n_docs"),
          r.getAs[Long]("toks_all"),
          Option(r.getAs[Any]("n_sel")).map(_.toString.toLong).getOrElse(0L),
          Option(r.getAs[Any]("toks_sel")).map(_.toString.toLong)
            .getOrElse(0L)))
      }.toMap
  }

  private def got(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Long)] =
    df.collect().map { r =>
      r.getAs[Long]("quality") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("toks_all"), r.getAs[Long]("n_sel"),
        r.getAs[Long]("toks_sel")))
    }.toMap

  test("hierarchical plan equals the naive global window on the fixture, " +
      "respects the budget, and is prefix-maximal") {
    val scored = queries.TextQueries
      .qualityScored(Tables.documents(spark, dir))
      .select(col("doc_id"), col("quality"),
        coalesce(col("n_tokens").cast("long"), lit(0L)).as("toks"))
    val b = BudgetSelect.quarterBudget(scored).collect()(0).getAs[Long]("b")
    val want = naiveSummary(scored, b)
    val have = got(queries.CurationQueries.qBudgetSelect.fn(spark, dir))
    assert(have == want)
    // non-degenerate: something selected, something left out
    val totSel = have.values.map(_._3).sum
    assert(totSel > 0 && totSel < have.values.map(_._1).sum)
    // budget respected; adding the FIRST unselected doc in priority
    // order must overflow (prefix maximality)
    val selToks = have.values.map(_._4).sum
    assert(selToks <= b)
    val nextToks = scored.withColumn("cum", sum(col("toks")).over(
        Window.orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("cum") > lit(b))
      .orderBy(col("quality").desc, col("doc_id")).limit(1)
      .collect().headOption.map(_.getAs[Long]("toks")).getOrElse(0L)
    assert(selToks + nextToks > b, "selection must be prefix-maximal")
  }

  test("property: hierarchical equals naive on adversarial corpora " +
      "(zero-token docs, arbitrary budgets, sparse doc_id ranges)") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    // doc_ids deliberately sparse (div-1024 ranges uneven), token counts
    // include zeros, qualities collide heavily, budgets hit tier edges
    val docGen = for {
      id <- Gen.choose(0L, 5000L)
      q <- Gen.choose(0L, 3L)
      t <- Gen.frequency((3, Gen.choose(1L, 40L)), (1, Gen.const(0L)))
    } yield (id, q, t)
    val caseGen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, docGen)
      uniq = rows.groupBy(_._1).map(_._2.head).toSeq
      tot = uniq.map(_._3).sum
      b <- Gen.frequency(
        (1, Gen.choose(0L, math.max(tot, 1L))),
        // exact tier-edge budgets: cumulative sums in priority order
        (1, Gen.oneOf(uniq.sortBy(r => (-r._2, r._1)).scanLeft(0L)(_ + _._3))))
    } yield (uniq, b)
    checkProp(Prop.forAllNoShrink(caseGen) { case (rows, b) =>
      val scored = rows.toDF("doc_id", "quality", "toks")
      val budget = Seq(b).toDF("b")
      val want = naiveSummary(scored, b)
      val have = got(BudgetSelect.summary(scored, budget))
      have == want
    }, minTests = 15)
  }
}
