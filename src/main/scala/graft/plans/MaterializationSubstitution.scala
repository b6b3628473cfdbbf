package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Transparent reflection substitution (SURVEY.md §4.2.4 stretch path;
  * reference behavior: readme.md:322-329 — Dremio swaps a matching
  * materialization into the plan without the query changing).
  *
  * A `Rule[LogicalPlan]` installed via `spark.experimental.extraOptimizations`
  * (the public hook for user optimizer rules): any optimized subtree whose
  * canonicalized form equals a refreshed materialization's definition is
  * replaced by the materialized scan, with a Project aliasing the scan's
  * output back to the original attribute ids so parent operators are
  * untouched. Matching is whole-subtree (the reflection hit case: querying a
  * registered view); partial/containment rewrites are the next increment.
  */
final case class MaterializationSubstitution(mats: Materializations)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val candidates = mats.fingerprints()
    if (candidates.isEmpty) plan
    else plan.transformUp {
      case sub if !isMaterializedScan(sub, candidates) =>
        candidates.collectFirst {
          case (canonical, matPlan)
            if sub.canonicalized == canonical &&
              sub.output.length == matPlan.output.length =>
            // Re-key the materialized output to the substituted subtree's
            // attribute ids so references above the swap stay valid.
            Project(sub.output.zip(matPlan.output).map { case (orig, m) =>
              Alias(m, orig.name)(exprId = orig.exprId)
            }, matPlan)
        }.getOrElse(sub)
    }
  }

  /** The materialized scan itself must never be re-substituted. */
  private def isMaterializedScan(p: LogicalPlan,
                                 cands: Seq[(LogicalPlan, LogicalPlan)]): Boolean =
    cands.exists { case (_, mat) => p.canonicalized == mat.canonicalized }
}

object MaterializationSubstitution {
  /** Install the rule once per session (idempotent). */
  def install(spark: SparkSession, mats: Materializations): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[MaterializationSubstitution]))
      spark.experimental.extraOptimizations = existing :+ MaterializationSubstitution(mats)
  }
}
