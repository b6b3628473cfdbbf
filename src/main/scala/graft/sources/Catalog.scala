package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** DDL/catalog surface (SURVEY.md §2.1): the reference's folder/namespace,
  * table, CTAS and view operators re-expressed against Spark's built-in
  * session catalog + parquet tables. (The reference resolves these through an
  * Iceberg REST catalog — spark.py:26-28; Spark's catalog API is the same
  * shape, so an Iceberg catalog drops in via config where its runtime jars
  * are available.)
  */
object Catalog {

  /** D1/D2 — CREATE FOLDER / CREATE NAMESPACE IF NOT EXISTS (idempotent).
    * Nested paths collapse to dotted database names on the session catalog. */
  def createNamespace(spark: SparkSession, parts: Seq[String]): Unit =
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${parts.mkString("_")}")

  /** D3/D4/D5 — declared-schema table, optionally partitioned. Partition
    * transforms: identity columns directly; day-grain via a generated
    * `<col>_day` date column (hidden-partitioning stand-in: readers filter
    * the base column, writers derive the partition value). */
  def createTable(spark: SparkSession, name: String, ddl: String,
                  partitionBy: Seq[String] = Nil, location: Option[String] = None): Unit = {
    val partClause = if (partitionBy.nonEmpty) s" PARTITIONED BY (${partitionBy.mkString(", ")})" else ""
    val locClause = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name ($ddl) USING parquet$partClause$locClause")
  }

  /** D6 — CTAS with optional PARTITION BY and DISTRIBUTE BY semantics:
    * DISTRIBUTE BY (retail.sql:134) = repartition on the clustering key
    * before write, co-locating rows for downstream joins. */
  def ctas(spark: SparkSession, name: String, df: DataFrame,
           partitionBy: Seq[String] = Nil, distributeBy: Seq[Column] = Nil): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name") // D8 idempotent-rebuild pattern
    val distributed = if (distributeBy.nonEmpty) df.repartition(distributeBy: _*) else df
    val writer = distributed.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .saveAsTable(name)
  }

  /** D4 — CTAS with a HIDDEN day-grain partition on `tsCol` (the reference's
    * `PARTITION BY (DAY(admit_ts))`, clinicdata.sql:41-51): the writer
    * derives a `<tsCol>_day` DATE partition column; readers keep filtering
    * the base timestamp — plans/HiddenPartitionPruning (installed here) maps
    * base-column bounds onto the partition column so the scan prunes. */
  def ctasDayPartitioned(spark: SparkSession, name: String, df: DataFrame,
                         tsCol: String, distributeBy: Seq[Column] = Nil): Unit = {
    graft.plans.HiddenPartitionPruning.install(spark)
    val withDay = df.withColumn(s"${tsCol}_day",
      org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col(tsCol)))
    ctas(spark, name, withDay, partitionBy = Seq(s"${tsCol}_day"), distributeBy = distributeBy)
  }

  /** D9 — CREATE OR REPLACE VIEW (the semantic layer; ~40 occurrences in the
    * reference). Temp views for session scope, global for cross-session. */
  def createOrReplaceView(spark: SparkSession, name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  def createOrReplaceView(spark: SparkSession, name: String, sql: String): Unit =
    spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $sql")

  /** D8 — DROP TABLE IF EXISTS. */
  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  /** M1 — INSERT INTO … VALUES via typed rows. */
  def insertRows(spark: SparkSession, table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).insertInto(table)

  /** M2 — unqualified DELETE FROM t (the reference's repeatable-run truncate,
    * logistics_AI.sql:60). INSERT OVERWRITE of the empty set works on both
    * managed and external parquet tables (TRUNCATE rejects external ones). */
  def truncate(spark: SparkSession, table: String): Unit = {
    // An empty frame of the same schema, built without reading the table's
    // files (overwrite-while-reading is rejected), overwrite-inserted.
    // partitionOverwriteMode is pinned to static for the call: under dynamic
    // mode an empty input overwrites no partitions at all, silently keeping
    // every row.
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "static")
    try {
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        spark.table(table).schema)
      empty.write.mode(SaveMode.Overwrite).insertInto(table)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** D11 — GRANT … ON … TO USER: governance metadata only; Spark's session
    * catalog has no ACL store. Parsed and recorded so pipelines carrying
    * permissions.sql statements run without modification. */
  private val grants = scala.collection.mutable.ArrayBuffer.empty[String]
  def grant(statement: String): Unit = synchronized { grants += statement }
  def recordedGrants: Seq[String] = synchronized(grants.toSeq)

  /** Declared Dremio `PARTITION BY (...)` clauses from script CREATE TABLEs:
    * recorded intent (table → transform list). The v2 parquet write path
    * doesn't lay out transform partitions, so SqlScriptRunner strips the
    * clause and the engine's own write path (ctasDayPartitioned +
    * HiddenPartitionPruning) supplies day-grain pruning. */
  private val partitionIntents = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def recordPartitionIntent(table: String, clause: String): Unit =
    synchronized { partitionIntents += (table -> clause) }
  def recordedPartitionIntents: Seq[(String, String)] = synchronized(partitionIntents.toSeq)
}
