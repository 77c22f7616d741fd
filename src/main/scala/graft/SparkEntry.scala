package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ArcadeSqlQueries, DocQueries, GraphQueries, LlmQueries, Q, Relational, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder brief.
  *
  * The declared query inventory (SURVEY §2): each entry is one operator
  * family re-expressed Spark-first, with a DuckDB oracle twin where the
  * semantics are SQL-expressible (probabilistic/iterative ops fall back
  * to the driver's rows-only check).
  */
object SparkEntry {

  val all: Seq[Q] =
    Relational.queries ++ GraphQueries.queries ++ LlmQueries.queries ++
      WindowQueries.queries ++ ArcadeSqlQueries.queries ++ DocQueries.queries

  /** Flagship query on /root/testdata/sf0.001 (SURVEY §7 minimum slice:
    * the 2-hop traversal-aggregate); driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("match_2hop_revenue")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
