package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Reflection-style acceleration (SURVEY.md §2.11 X1, readme.md:320-389):
  * the reference declares raw/aggregation "reflections" — materialized
  * versions of a dataset that the engine substitutes into matching queries.
  *
  * Spark-native mapping, in two tiers:
  *  1. Explicit materialization (this class): register a named definition,
  *     `refresh()` snapshots it (persist + optional parquet CTAS), and reads
  *     go through `table(name)` which serves the materialized copy when fresh
  *     — the CTAS-gold-table pattern the reference itself uses
  *     (retail.sql:89-100) when views get expensive.
  *  2. Transparent plan substitution (matching an arbitrary query subtree
  *     against registered materializations) — Iceberg/Dremio do this in the
  *     planner; a Catalyst `injectOptimizerRule` hook is the extension point,
  *     left as the documented stretch path (§4.2.4): fingerprint the
  *     canonicalized logical plan of each registered definition and swap
  *     matching subtrees for the materialized scan.
  */
final class Materializations(spark: SparkSession, warehouseDir: Option[String] = None) {

  private case class Entry(define: () => DataFrame,
                           var materialized: Option[DataFrame],
                           var refreshedAtMs: Option[Long],
                           var fingerprint: Option[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                             org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = None)

  private val entries = scala.collection.mutable.LinkedHashMap.empty[String, Entry]

  /** Declare a reflection: name + definition. Lazy until first refresh. */
  def register(name: String, define: () => DataFrame): Unit = synchronized {
    entries(name) = Entry(define, None, None)
  }

  /** Materialize (or re-materialize) now: persists in memory/disk; with a
    * warehouse dir also writes a parquet CTAS snapshot (survives the session,
    * like a Dremio reflection store). */
  def refresh(name: String): DataFrame = synchronized {
    val e = entries(name)
    // The whole refresh runs with EVERY MaterializationSubstitution stripped
    // (this registry's or any other's): a live rule would (a) rewrite the
    // refresh write to read the very parquet path it is overwriting, and
    // (b) rewrite the definition's optimizedPlan onto an old materialized
    // scan, storing a poisoned fingerprint that no raw-table query can ever
    // match again (the round-2 re-invocation defect). A refresh must always
    // recompute from the raw definition.
    e.fingerprint = None
    e.materialized.foreach(_.unpersist())
    withoutSubstitutionRules {
      val df = e.define()
      val mat = warehouseDir match {
        case Some(dir) =>
          df.write.mode("overwrite").parquet(s"$dir/$name")
          spark.read.parquet(s"$dir/$name")
        case None =>
          df.persist(StorageLevel.MEMORY_AND_DISK)
      }
      e.materialized = Some(mat)
      e.refreshedAtMs = Some(System.currentTimeMillis())
      // Fingerprint once at refresh (optimizer rules run per query —
      // matching must not re-analyze the definition each time).
      e.fingerprint = try Some((
        classic(e.define()).queryExecution.optimizedPlan.canonicalized,
        classic(mat).queryExecution.analyzed))
      catch { case _: Throwable => None }
      mat
    }
  }

  /** Run `body` with every MaterializationSubstitution stripped from the
    * session's extra optimizer rules, restoring them afterwards. */
  private def withoutSubstitutionRules[A](body: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_.isInstanceOf[MaterializationSubstitution])
    try body finally spark.experimental.extraOptimizations = saved
  }

  private def classic(df: DataFrame): org.apache.spark.sql.classic.Dataset[_] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]

  def refreshAll(): Unit = synchronized(entries.keys.foreach(refresh))

  /** Serve the materialization when fresh; fall back to the live definition
    * (a query against a reflection-less dataset still answers correctly —
    * the reference's "autonomous" behavior, readme.md:381-389). */
  def table(name: String): DataFrame = synchronized {
    val e = entries(name)
    e.materialized.getOrElse(e.define())
  }

  def isMaterialized(name: String): Boolean =
    synchronized(entries.get(name).exists(_.materialized.isDefined))

  /** Retire a reflection (autonomous retire path). */
  def retire(name: String): Unit = synchronized {
    entries.get(name).foreach(_.materialized.foreach(_.unpersist()))
    entries.remove(name)
  }

  def status(): Seq[(String, Boolean, Option[Long])] = synchronized {
    entries.toSeq.map { case (n, e) => (n, e.materialized.isDefined, e.refreshedAtMs) }
  }

  /** (definition's canonicalized optimized plan, materialized analyzed plan)
    * for every refreshed entry — the matching index used by
    * MaterializationSubstitution; cached at refresh time. */
  def fingerprints(): Seq[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                           org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    synchronized(entries.values.toSeq.flatMap(_.fingerprint))
}
