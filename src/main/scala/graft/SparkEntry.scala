package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in `graft.queries.*` registries; each carries its own DuckDB
  * oracle SQL when the semantics are ANSI-expressible (otherwise the driver
  * records a rows-only check).
  */
object SparkEntry {

  /** All registered capabilities, in registry order. */
  def allQueries: Seq[Q] =
    queries_registry

  private lazy val queries_registry: Seq[Q] =
    graft.queries.CoreQueries.list ++
      graft.queries.DataPipelineQueries.list ++
      graft.queries.AiQueries.list ++
      graft.queries.FuzzQueries.list

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The readme's customer_spend join+agg (reference: readme.md:307-315). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spend"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
