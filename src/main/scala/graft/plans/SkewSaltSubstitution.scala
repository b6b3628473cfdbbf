package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, EqualTo, Literal, Multiply, Rand}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Autonomous skew mitigation, served transparently (the reflection contract
  * — readme.md:381-389's "autonomous tier acts, humans don't" — applied to
  * hot-key joins): once [[WorkloadAdvisor.autoSalt]] has confirmed a
  * hot-key finding for a join fingerprint, every FUTURE occurrence of that
  * join is re-planned salted by this optimizer rule — the caller keeps
  * writing the naive join, exactly as reflection users keep querying the
  * raw view.
  *
  * The rewrite is purely logical and output-preserving:
  *
  * {{{
  *   Join(l, r, jt, cond)
  *     ==>
  *   Project(origOutput,                       // exprIds preserved — parents untouched
  *     Join(Project(l.output :+ rand*B as salt, l),       // left: one salt per row
  *          Join(r, LocalRelation(0..B-1), Cross),        // right: replicated per salt
  *          jt, cond AND salt == saltR))
  * }}}
  *
  * Keeping the ORIGINAL condition intact (and only adding the salt equality)
  * means multi-conjunct joins — the J4 interval shape, equi-key plus range
  * bounds — salt correctly: Catalyst's ExtractEquiJoinKeys picks up
  * (key, salt) as the shuffle keys and re-applies the remaining conjuncts as
  * the join's post-match filter, which is exactly the hand-written salted
  * plan. Only left-preserving join types are rewritten (right/full outer
  * would emit one null-extended row per salt replica).
  */
final case class SkewSaltSubstitution(advisor: WorkloadAdvisor)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, _, Some(cond), _)
        if !SkewSaltSubstitution.isSalted(cond) =>
      advisor.confirmedSaltFor(j.canonicalized.toString) match {
        case Some(f) => SkewSaltSubstitution.saltedJoinPlan(j, f.buckets)
        case None => j
      }
  }
}

object SkewSaltSubstitution {

  /** Marker name for injected salt columns — the recursion/observation guard. */
  val SaltName = "__graft_salt"

  private[plans] def isSalted(cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    cond.references.exists(_.name.startsWith(SaltName))

  /** The salted logical plan for `j`, row-identical to `j` and carrying
    * `j.output` verbatim (same attributes, same exprIds). */
  def saltedJoinPlan(j: Join, buckets: Int): LogicalPlan = {
    val Join(l, r, jt, Some(cond), hint) = (j: @unchecked)
    // left: one uniformly-random salt per row. Seeded Rand: deterministic
    // per partition-seed like ScaleOps.saltedEquiJoin's rand(42).
    val saltL = Alias(
      Cast(Multiply(Rand(Literal(42L)), Literal(buckets.toDouble)), IntegerType),
      SaltName)()
    val left2 = Project((l.output :+ saltL).toSeq, l)
    // right: replicated once per salt value via a cross join against the
    // B-row salt relation (B = buckets, clamped small by the advisor) — the
    // logical form of `explode(sequence(0, B-1))`.
    val saltR = AttributeReference(SaltName + "_r", IntegerType, nullable = false)()
    val saltRel = LocalRelation(Seq(saltR),
      (0 until buckets).map(i => InternalRow(i)))
    val right2 = Join(r, saltRel, Cross, None, JoinHint.NONE)
    val newCond = And(cond, EqualTo(saltL.toAttribute, saltR))
    Project(j.output, Join(left2, right2, jt, Some(newCond), hint))
  }

  /** Install (idempotent per advisor; preserves rules owned by others —
    * same contract as [[MaterializationSubstitution.install]]). */
  def install(spark: SparkSession, advisor: WorkloadAdvisor): Unit = {
    val existing = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      existing.filterNot {
        case SkewSaltSubstitution(a) => a eq advisor
        case _ => false
      } :+ SkewSaltSubstitution(advisor)
  }

  private[plans] def uninstall(spark: SparkSession, advisor: WorkloadAdvisor): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot {
        case SkewSaltSubstitution(a) => a eq advisor
        case _ => false
      }
}
