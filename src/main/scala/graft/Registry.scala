package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver
  * hash-compares against. Column names/aliases must match between the two
  * sides — the compare sorts columns by name.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  def all: Seq[Q] =
    queries.RfpQueries.all ++
      queries.PipelineQueries.all ++
      queries.RelationalQueries.all ++
      queries.TextQueries.all ++
      queries.SimilarityQueries.all ++
      queries.MultimodalQueries.all ++
      queries.StreamQueries.all ++
      queries.CurationQueries.all ++
      queries.AnalyticsQueries.all ++
      queries.RetrievalQueries.all ++
      queries.EmbedQueries.all

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
