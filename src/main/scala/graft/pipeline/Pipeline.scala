package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Medallion pipeline framework (SURVEY.md §7.1 step 4): an ordered DAG of
  * named stages (raw → silver → gold), each a DataFrame transformation over
  * the stages before it.
  *
  * Materialization policy mirrors the reference's two idioms:
  *  - View  — `CREATE OR REPLACE VIEW` (clinicdata.sql:134-163): lazy,
  *    inlined by the analyzer at read time; Catalyst pushes filters through
  *    the whole stack.
  *  - Table — CTAS (retail.sql:89-100): materialized once; the reference
  *    chooses this exactly where view-over-view re-analysis gets expensive —
  *    here it maps to persist(MEMORY_AND_DISK), the session-scope stand-in
  *    for a reflection/CTAS snapshot (readme.md:320-329).
  *
  * Every stage also registers a temp view under its name, so the SQL surface
  * (`spark.sql("SELECT … FROM silver_events")`) works like the reference's
  * semantic layer.
  */
sealed trait Materialization
object Materialization {
  case object View extends Materialization
  case object Table extends Materialization
}

final case class Stage(
    name: String,
    materialize: Materialization = Materialization.View)(
    val build: (SparkSession, Map[String, DataFrame]) => DataFrame)

final class Pipeline(val name: String, val stages: Seq[Stage]) {

  /** Execute stages in order; returns every stage's DataFrame by name. */
  def run(spark: SparkSession): Map[String, DataFrame] =
    stages.foldLeft(Map.empty[String, DataFrame]) { (acc, st) =>
      val built = st.build(spark, acc)
      val df = st.materialize match {
        case Materialization.Table => built.persist(StorageLevel.MEMORY_AND_DISK)
        case Materialization.View  => built
      }
      df.createOrReplaceTempView(st.name)
      acc + (st.name -> df)
    }

  /** Quality gate (reference convention, SURVEY.md §5.2): named invariant
    * views that must be EMPTY. Returns (checkName → violationCount). */
  def check(results: Map[String, DataFrame], checks: Seq[String]): Map[String, Long] =
    checks.map(c => c -> results(c).count()).toMap
}
