package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gated query: a Spark implementation built from graft operators and
  * (where SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. `bench = true` marks the headline set timed by `graft.Bench`.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  lazy val all: Seq[GraftQuery] =
    CoreQueries.queries ++ MetricQueries.queries ++ ScoreQueries.queries ++
      NqsQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      VectorQueries.queries ++ WindowQueries.queries ++ GeoQueries.queries ++
      PipelineQueries.queries ++ CurationQueries.queries ++
      StreamQueries.queries ++ HistoryQueries.queries ++
      GraphQueries.queries ++ LayoutQueries.queries

  lazy val byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap

  def queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
