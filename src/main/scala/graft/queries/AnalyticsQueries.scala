package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Analytics capability rows beyond the §2.8 set already covered
  * (joins/windows/rollup/set-ops): exact discrete quantiles, pivot, and
  * offset window functions — each a one-shuffle plan with a DuckDB
  * oracle.
  */
object AnalyticsQueries {

  /** q_quantiles — exact per-group quantiles. Discrete quantiles
    * (`percentile_disc` / DuckDB `quantile_disc`) rather than continuous:
    * both engines then SELECT an actual data value by rank instead of
    * interpolating, so parity is exact set arithmetic with no
    * float-formula coupling. One shuffle (partial sort-agg per group). */
  val qQuantiles = Q("q_quantiles",
    (s, dir) => {
      def pd(p: Double, name: String) =
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY value)").as(name)
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(pd(0.25, "p25"), pd(0.5, "p50"), pd(0.75, "p75"),
          pd(0.95, "p95"), count(lit(1)).as("n"))
    },
    Some("""SELECT event_type,
      |  quantile_disc(value, 0.25) AS p25,
      |  quantile_disc(value, 0.50) AS p50,
      |  quantile_disc(value, 0.75) AS p75,
      |  quantile_disc(value, 0.95) AS p95,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin),
    "§2.8 capability: exact per-group quantiles (discrete, engine-parity-safe)")

  /** q_pivot — wide-format pivot: document counts per source, one column
    * per language (explicit value list, as a production pivot at scale
    * must be — an unlisted-values pivot needs a driver-side distinct
    * pass first). Absent cells coalesce to 0 on both sides. */
  val qPivot = Q("q_pivot",
    (s, dir) => {
      val langs = Seq("en", "de", "fr", "es", "zh")
      val p = Tables.documents(s, dir)
        .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
      p.select(col("source") +:
        langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
    },
    Some("""SELECT source,
      |  count(CASE WHEN lang = 'en' THEN 1 END) AS en,
      |  count(CASE WHEN lang = 'de' THEN 1 END) AS de,
      |  count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
      |  count(CASE WHEN lang = 'es' THEN 1 END) AS es,
      |  count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
      |FROM documents GROUP BY source""".stripMargin),
    "§2.8 capability: pivot to wide format (explicit value list)")

  /** q_lag_lead — offset window functions: each event with the same
    * user's previous event type, gap to it, and next event id, in
    * deterministic (ts, event_id) order. One shuffle (the user window). */
  val qLagLead = Q("q_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap_us"),
        lead(col("event_id"), 1).over(w).as("next_id"))
    },
    Some("""SELECT user_id, event_id, event_type,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
      |  lead(event_id, 1) OVER w AS next_id
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin),
    "§2.8 capability: offset window functions (lag/lead, deterministic order)")

  def all: Seq[Q] = Seq(qQuantiles, qPivot, qLagLead)
}
