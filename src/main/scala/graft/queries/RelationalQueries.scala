package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.Money

/** Relational capability queries over the TPC-H-ish testdata (SURVEY §2.8:
  * joins, windows, rollup — supplied by Spark built-ins; the reference has
  * only the anti/semi patterns O7-O9).
  *
  * Float-determinism contract shared with the DuckDB oracles: money
  * aggregates are exact fixed-point LONG sums ([[Money]]) converted to
  * DOUBLE once per group — order-independent and bit-identical to the
  * oracle's sum-as-DECIMAL formulation (the oracle SQL keeps the decimal
  * spelling; see Money's scaladoc for the equivalence argument), while
  * the per-row hot path stays 64-bit integer codegen. Averages are exact
  * sums divided as doubles.
  */
object RelationalQueries {

  /** Exact scaled discounted price: cents(ep) × (100 − cents(disc)) is an
    * integer at scale 4 — bit-identical to the oracle's
    * DECIMAL(18,2)×(1−DECIMAL(18,2)) at any SF and partition count. */
  private def discPrice4(ep: org.apache.spark.sql.Column,
                         disc: org.apache.spark.sql.Column) =
    Money.cents(ep) * (lit(100L) - Money.cents(disc))
  private val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"

  /** q1_agg — pricing summary (scan + hash aggregate; maps A1-family to the
    * TPC-H shape). Filter pushes to parquet; aggregation is partial
    * map-side then one shuffle on the 2-key group.
    *
    * Oracle finisher note (caught by the r9 100× probe): DuckDB's direct
    * DECIMAL→DOUBLE cast goes int128→double (truncating) THEN divides by
    * the scale factor — two roundings, one ULP off Spark's single
    * correctly-rounded BigDecimal→double once the scaled sum crosses
    * 2^53 (sum_charge·1e6 ≈ 2.8e17 at the 100× fixture). The scale-4/6
    * sums therefore round-trip through VARCHAR (exact decimal string →
    * correctly-rounded double parse — verified equal to Spark's value at
    * both sf0.01 and 100×); the scale-2 sums stay ≪ 2^53 at any
    * plausible fixture and keep the plain cast. */
  val q1 = Q("q1_agg",
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Money.sumExact(Money.cents(col("l_quantity")), 2).as("sum_qty"),
        Money.sumExact(Money.cents(col("l_extendedprice")), 2)
          .as("sum_base_price"),
        Money.sumExact(discPrice4(col("l_extendedprice"),
          col("l_discount")), 4).as("sum_disc_price"),
        Money.sumExact(discPrice4(col("l_extendedprice"), col("l_discount"))
          * (lit(100L) + Money.cents(col("l_tax"))), 6).as("sum_charge"),
        (Money.sumExact(Money.cents(col("l_quantity")), 2) / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order")),
    Some(s"""SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM($discPriceSql) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST($discPriceSql * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  /** q3_top — shipping-priority style 3-way join + top-10 by revenue.
    * Customer/orders filters push down; the (revenue, key) total order
    * makes the LIMIT deterministic. */
  val q3 = Q("q3_top",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-03-15"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-03-15"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(Money.sumExact(discPrice4(col("l_extendedprice"),
          col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
    },
    Some(s"""SELECT l_orderkey,
      |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  /** q5_region — 5-way star join, revenue per nation for one region/year.
    * Dimension sides (region/nation/supplier) are broadcast — no shuffle
    * for them even at 100 TB fact scale. */
  val q5 = Q("q5_region",
    (s, dir) => {
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val su = Tables.supplier(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Money.sumExact(discPrice4(col("l_extendedprice"),
          col("l_discount")), 4).as("revenue"))
    },
    Some(s"""SELECT n_name,
      |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin))

  /** q_semi_join — O9 membership semi-join: orders having a big lineitem. */
  val qSemi = Q("q_semi_join",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT o_orderstatus, count(*) AS n FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderstatus""".stripMargin))

  /** q_anti_join — customers with no orders (same left_anti shape as the
    * O7/O8 reconciliation). */
  val qAnti = Q("q_anti_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin))

  /** q_topk_per_group — ranking window (A7's general form): top-3
    * customers by balance per market segment. */
  val qTopK = Q("q_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("c_mktsegment", "rk", "c_custkey", "c_name", "c_acctbal")
    },
    Some("""SELECT c_mktsegment, rk, c_custkey, c_name, c_acctbal FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM customer) WHERE rk <= 3""".stripMargin))

  /** q_rollup — grouping-sets capability: rollup over flag/status. */
  val qRollup = Q("q_rollup",
    (s, dir) => Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        Money.sumExact(Money.cents(col("l_quantity")), 2).as("sum_qty")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin))

  /** q_topk_native — q_topk_per_group's exact semantics through the
    * custom [[graft.plans.TopKPerGroupNode]] operator instead of the
    * window: same oracle, differential proof the operator is correct.
    * Bounded per-group heaps prune map-side, so only ≤ k·|groups| rows
    * ever shuffle (the window formulation shuffles every row). */
  val qTopKNative = Q("q_topk_native",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      graft.ops.TopK.perGroup(c, Seq(c("c_mktsegment")),
          Seq(c("c_acctbal") -> true, c("c_custkey") -> false), 3)
        .select("c_mktsegment", "rk", "c_custkey", "c_name", "c_acctbal")
    },
    qTopK.oracle,
    "custom LogicalPlan+Strategy+SparkPlan (SURVEY §7 custom-op ladder tier c)")

  /** q_having_join — the TPC-H Q18 shape: aggregate-then-having feeding a
    * multi-way join back to detail rows (big orders with their
    * customers). Quantities sum as BIGINT (whole-valued in this data) so
    * the HAVING threshold is exact in both engines. The having-aggregate
    * runs BEFORE the joins — at scale the filter collapses the join
    * input from |orders| to |big orders|. */
  val qHavingJoin = Q("q_having_join",
    (s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 300)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("total_qty"))
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, total_qty
      |FROM (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
      |) big
      |JOIN orders ON o_orderkey = big.l_orderkey
      |JOIN customer ON c_custkey = o_custkey""".stripMargin),
    "§2.8 capability: aggregate-having join-back (TPC-H Q18 shape)")

  /** q_scalar_subquery — correlated scalar aggregate subqueries (parts
    * priced above their type's mean), exercising Catalyst's
    * RewriteCorrelatedScalarSubquery path through the SQL surface. The
    * mean comparison is cross-multiplied in integer cents
    * (cents·n > Σcents), so the predicate is exact in both engines —
    * comparing against a float average would be an ULP trap. */
  val qScalarSubquery = Q("q_scalar_subquery",
    (s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("part_sq")
      s.sql("""WITH pc AS (
        |  SELECT p_partkey, p_type,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM part_sq
        |)
        |SELECT p_partkey, p_type, cents FROM pc p
        |WHERE cents * (SELECT count(*) FROM pc p2 WHERE p2.p_type = p.p_type)
        |    > (SELECT sum(cents) FROM pc p2 WHERE p2.p_type = p.p_type)""".stripMargin)
    },
    Some("""WITH pc AS (
      |  SELECT p_partkey, p_type,
      |         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      |  FROM part
      |)
      |SELECT p_partkey, p_type, cents FROM pc p
      |WHERE cents * (SELECT count(*) FROM pc p2 WHERE p2.p_type = p.p_type)
      |    > (SELECT CAST(sum(cents) AS BIGINT) FROM pc p2 WHERE p2.p_type = p.p_type)""".stripMargin),
    "§2.8 capability: correlated scalar subqueries (exact integer predicate)")

  def all: Seq[Q] = Seq(q1, q3, q5, qSemi, qAnti, qTopK, qTopKNative, qRollup,
    qHavingJoin, qScalarSubquery)
}
