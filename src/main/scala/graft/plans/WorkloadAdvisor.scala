package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

/** Autonomous reflection management (reference readme.md:381-389: the
  * enterprise engine "continuously monitors query workloads" to
  * "automatically create reflections for frequently queried views",
  * "refresh reflections based on data freshness needs", and "retire
  * reflections that are no longer useful").
  *
  * Spark-native shape: [[observe]] logs the canonical fingerprint of each
  * query's top aggregate subtree (the unit Dremio accelerates with an
  * aggregation reflection); [[autoMaterialize]] registers + refreshes a
  * materialization for every shape seen at least `minCount` times and
  * installs [[MaterializationSubstitution]], so the NEXT occurrence — or any
  * rollup/column-subset the substitution rule can derive from it — is served
  * from the materialized scan; [[retireStale]] drops reflections whose shape
  * stopped appearing. Observation is driver-side metadata only (a plan walk,
  * no data touched), so monitoring costs nothing at any data scale.
  */
final class WorkloadAdvisor(spark: SparkSession, mats: Materializations) {

  /** One observed aggregate shape. Keeps the first sighting's DataFrame as
    * the definition (immutable plan; `classic.Dataset.ofRows` is
    * private[sql], and the frame IS the plan). */
  private final class Shape(val definition: DataFrame) {
    var seen: Long = 0L
    var lastSeenTick: Long = 0L
    var materializedAs: Option[String] = None
  }

  private val shapes = scala.collection.mutable.LinkedHashMap.empty[String, Shape]
  private var tick = 0L

  private def classic(df: DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]

  /** Log the query's accelerable shape. The workload KEY is the canonical
    * topmost Aggregate subtree (the grain an aggregation reflection stores);
    * the recorded definition is the first sighting's frame. Returns `df`
    * unchanged so call sites can wrap transparently: `advisor.observe(q)`. */
  def observe(df: DataFrame): DataFrame = {
    val analyzed = classic(df).queryExecution.analyzed
    analyzed.collectFirst { case a: Aggregate => a }.foreach { agg =>
      val key = agg.canonicalized.toString
      synchronized {
        tick += 1
        val s = shapes.getOrElseUpdate(key, new Shape(df))
        s.seen += 1
        s.lastSeenTick = tick
      }
    }
    df
  }

  /** Shapes queried at least `minCount` times and not yet materialized —
    * what the autonomous engine would accelerate next. */
  def recommendations(minCount: Int = 3): Seq[(String, Long)] = synchronized {
    shapes.collect {
      case (key, s) if s.seen >= minCount && s.materializedAs.isEmpty =>
        key -> s.seen
    }.toSeq
  }

  /** Create + refresh a reflection for every recommendation, install the
    * substitution rule, and return the new reflection names. Subsequent
    * identical queries (and derivable rollups) hit the materialized scan. */
  def autoMaterialize(minCount: Int = 3): Seq[String] = {
    val created = synchronized {
      shapes.collect {
        case (key, s) if s.seen >= minCount && s.materializedAs.isEmpty =>
          val name = s"auto_rf_${math.abs(key.hashCode).toString}"
          s.materializedAs = Some(name)
          (name, s.definition)
      }.toSeq
    }
    created.foreach { case (name, definition) =>
      mats.register(name, () => definition)
      mats.refresh(name)
    }
    if (created.nonEmpty) MaterializationSubstitution.install(spark, mats)
    created.map(_._1)
  }

  /** Retire auto-created reflections whose shape hasn't been observed in the
    * last `maxIdleObservations` observe() calls; returns retired names. */
  def retireStale(maxIdleObservations: Long): Seq[String] = synchronized {
    val retired = shapes.collect {
      case (_, s) if s.materializedAs.isDefined &&
          tick - s.lastSeenTick > maxIdleObservations =>
        val name = s.materializedAs.get
        s.materializedAs = None
        name
    }.toSeq
    retired.foreach(mats.retire)
    retired
  }

  /** (fingerprint hash, times seen, materialized name) — the advisor's
    * monitoring view, the analog of the reference's reflection dashboard. */
  def workload(): Seq[(Int, Long, Option[String])] = synchronized {
    shapes.toSeq.map { case (key, s) => (key.hashCode, s.seen, s.materializedAs) }
  }
}
