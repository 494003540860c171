package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over the sf-dir parquet tables,
  * plus an optional DuckDB-dialect oracle equivalent for the driver's t2
  * hash-compare. Queries without an oracle get a weaker rows-only check
  * (used for ops whose exact output is not SQL-expressible in DuckDB,
  * e.g. LSH bucketing with engine-internal hashes).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Central registry of every operator/query the engine ships.
  * SURVEY.md §2 inventory coverage is enumerated here.
  */
object Catalog {
  lazy val all: Seq[Q] =
    ops.Relational.queries ++
      ops.Relational2.queries ++
      ops.Relational3.queries ++
      ops.Relational4.queries ++
      llm.LlmQueries.queries ++
      llm.Clusters.queries ++
      llm.Curation.queries ++
      blocks.BlockQueries.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
