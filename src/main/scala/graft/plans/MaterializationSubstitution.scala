package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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
    if (candidates.isEmpty) return plan
    // Each injection of a materialized scan must carry UNIQUE attribute ids:
    // two substitution sites sharing one matPlan instance (e.g. a self-join
    // over the registered view) would otherwise violate the optimizer's
    // unique-ExprId invariant below the re-keying Projects. Track which
    // instances are already present and mint a fresh instance per extra site.
    val used = scala.collection.mutable.Set.empty[LogicalPlan]
    candidates.foreach { case (_, m) =>
      // A prior fixed-point iteration may already have injected m verbatim.
      if (plan.exists(p => (p eq m) || p.output == m.output && p.sameResult(m)))
        used += m
    }
    plan.transformUp {
      case sub if !isMaterializedScan(sub, candidates) =>
        candidates.collectFirst {
          case (canonical, matPlan)
            if sub.canonicalized == canonical &&
              sub.output.length == matPlan.output.length =>
            instantiate(matPlan, used).map { inst =>
              // Exact match: re-key the materialized output to the substituted
              // subtree's attribute ids so references above stay valid.
              Project(sub.output.zip(inst.output).map { case (orig, m) =>
                Alias(m, orig.name)(exprId = orig.exprId)
              }, inst): LogicalPlan
            }
          case (canonical, matPlan)
            if partialAggPositions(sub, canonical).isDefined =>
            // OUTPUT-SUBSET match: the query is the same Aggregate but
            // column-pruned (the optimizer drops unused aggregate outputs) —
            // serve the needed columns from the materialization by position.
            val positions = partialAggPositions(sub, canonical).get
            instantiate(matPlan, used).map { inst =>
              Project(sub.output.zip(positions).map { case (orig, pos) =>
                Alias(inst.output(pos), orig.name)(exprId = orig.exprId)
              }, inst): LogicalPlan
            }
        }.flatten.getOrElse(sub)
    }
  }

  /** First use serves matPlan as-is; every further use needs a copy with
    * fresh output ids (MultiInstanceRelation.newInstance). A materialization
    * whose plan can't be re-instantiated (persist()-tier: an arbitrary tree,
    * not a leaf relation) is substituted at most once — skipping a second
    * site loses an acceleration, never correctness. */
  private def instantiate(matPlan: LogicalPlan,
                          used: scala.collection.mutable.Set[LogicalPlan])
      : Option[LogicalPlan] =
    if (used.add(matPlan)) Some(matPlan)
    else matPlan match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        Some(m.newInstance().asInstanceOf[LogicalPlan])
      case _ => None
    }

  /** If `sub` is an Aggregate with the same child and grouping as the
    * definition but only a SUBSET of its aggregate outputs, return each
    * output's position in the definition's output list. Both sides are
    * compared via canonicalized plans over the identical canonical child, so
    * attribute normalization lines up and expression equality is meaningful.
    */
  private def partialAggPositions(sub: LogicalPlan,
                                  defCanonical: LogicalPlan): Option[Seq[Int]] =
    (sub.canonicalized, defCanonical) match {
      case (a: Aggregate, d: Aggregate)
        if a.child == d.child &&
          a.groupingExpressions == d.groupingExpressions &&
          a.aggregateExpressions.length < d.aggregateExpressions.length =>
        // Alias exprIds are normalized by POSITION during canonicalization,
        // so compare with aliases stripped (children are normalized against
        // the identical canonical child, so equality is well-defined).
        def strip(e: org.apache.spark.sql.catalyst.expressions.Expression) = e match {
          case al: Alias => al.child
          case x => x
        }
        val dStripped = d.aggregateExpressions.map(strip)
        val positions = a.aggregateExpressions.map(e => dStripped.indexOf(strip(e)))
        if (positions.forall(_ >= 0)) Some(positions) else None
      case _ => None
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
