package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/types are aligned between the two on purpose — the driver
  * sorts columns by name and hash-compares values (see builder contract).
  *
  * Double-typed aggregates are rounded identically on both sides so that
  * engine-internal summation order (Spark partial aggregation vs DuckDB
  * single-stream) cannot flip the last ulp and break the hash compare.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def sql(name: String, text: String): Q =
    Q(name,
      (spark, dir) => { graft.Tables.registerAll(spark, dir); spark.sql(text) },
      Some(text))
}
