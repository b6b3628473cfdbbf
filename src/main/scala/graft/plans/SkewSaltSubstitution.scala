package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, EqualTo, Expression, Literal, Multiply, Rand}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Shared lock for every mutation of `spark.experimental.extraOptimizations`
  * in this library. The field is a plain var on ExperimentalMethods, so an
  * install/uninstall is a non-atomic read-modify-write: two concurrent
  * installers (a [[WorkloadAdvisor]] confirming a salt while a
  * [[Materializations]] registry materializes a reflection) would otherwise
  * silently lose one another's rule. Mutation is rare (confirm/retire, both
  * driver-side); concurrent query PLANNING only reads the var and needs no
  * lock. */
private[graft] object ExtraOptimizations {
  def mutate(spark: SparkSession)
            (f: Seq[Rule[LogicalPlan]] => Seq[Rule[LogicalPlan]]): Unit =
    synchronized {
      spark.experimental.extraOptimizations =
        f(spark.experimental.extraOptimizations)
    }
}

/** Autonomous skew mitigation, served transparently (the reflection contract
  * — readme.md:381-389's "autonomous tier acts, humans don't" — applied to
  * hot-key joins): once [[WorkloadAdvisor.autoSalt]] has confirmed a
  * hot-key finding for a join fingerprint, every FUTURE occurrence of that
  * join is re-planned salted by this optimizer rule — the caller keeps
  * writing the naive join, exactly as reflection users keep querying the
  * raw view.
  *
  * The rewrite is purely logical and output-preserving. For a LEFT-side hot
  * key (the finding's `side == "left"`):
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
  * and the mirror for a RIGHT-side hot key (`side == "right"`): the right
  * child gets the per-row salt, the left child is cross-replicated. Which
  * sides are legal depends on the join type — the replicated side must not
  * be null-preserved (each of its rows appears once per salt value, so a
  * right/full outer join over a replicated right side would emit every
  * unmatched right row B times) and must not feed an existence decision
  * (semi/anti over a replicated left would emit each preserved row once per
  * replica). Hence: salt-left serves inner/left-outer/left-semi/left-anti;
  * salt-right serves inner/right-outer. [[WorkloadAdvisor]] derives the
  * candidate sides from the same sets.
  *
  * Keeping the ORIGINAL condition intact (and only adding the salt equality)
  * means multi-conjunct joins — the J4 interval shape, equi-key plus range
  * bounds — salt correctly: Catalyst's ExtractEquiJoinKeys picks up
  * (key, salt) as the shuffle keys and re-applies the remaining conjuncts as
  * the join's post-match filter, which is exactly the hand-written salted
  * plan.
  */
final case class SkewSaltSubstitution(advisor: WorkloadAdvisor)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, _, Some(cond), _)
        if !SkewSaltSubstitution.isSalted(cond) =>
      advisor.confirmedSaltFor(j.canonicalized.toString) match {
        case Some(f) =>
          SkewSaltSubstitution.saltedJoinPlan(j, f.buckets, f.side == "right")
        case None => j
      }
  }
}

object SkewSaltSubstitution {

  /** Display name for injected salt columns (what shows up in .explain). */
  val SaltName = "__graft_salt"

  /** ExprIds of every salt attribute THIS library injected — the
    * recursion/observation guard. Keying on exprId instead of the
    * "__graft_salt" name prefix (ADVICE r9) means a user dataset that
    * happens to carry a column of that name neither suppresses observation
    * nor risks ambiguous resolution against an injected salt: only
    * attributes minted by [[saltedJoinPlan]] itself are recognized. The set
    * grows by two longs per served rewrite — bounded by rewrite count, not
    * data. */
  private val saltExprIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

  private[plans] def isSalted(cond: Expression): Boolean =
    cond.references.exists(a => saltExprIds.contains(a.exprId.id))

  /** The salted logical plan for `j`, row-identical to `j` and carrying
    * `j.output` verbatim (same attributes, same exprIds). `saltRight`
    * selects the mirrored form (right child salted, left replicated) for
    * right-side hot keys. */
  def saltedJoinPlan(j: Join, buckets: Int, saltRight: Boolean = false): LogicalPlan = {
    val Join(l, r, jt, Some(cond), hint) = (j: @unchecked)
    // hot side: one uniformly-random salt per row. Seeded Rand: deterministic
    // per partition-seed like ScaleOps.saltedEquiJoin's rand(42).
    val saltHot = Alias(
      Cast(Multiply(Rand(Literal(42L)), Literal(buckets.toDouble)), IntegerType),
      SaltName)()
    // other side: replicated once per salt value via a cross join against the
    // B-row salt relation (B = buckets, clamped small by the advisor) — the
    // logical form of `explode(sequence(0, B-1))`.
    val saltRep = AttributeReference(SaltName + "_r", IntegerType, nullable = false)()
    val saltRel = LocalRelation(Seq(saltRep),
      (0 until buckets).map(i => InternalRow(i)))
    saltExprIds.add(saltHot.exprId.id)
    saltExprIds.add(saltRep.exprId.id)
    val newCond = And(cond, EqualTo(saltHot.toAttribute, saltRep))
    val salted =
      if (saltRight) {
        val right2 = Project((r.output :+ saltHot).toSeq, r)
        val left2 = Join(l, saltRel, Cross, None, JoinHint.NONE)
        Join(left2, right2, jt, Some(newCond), hint)
      } else {
        val left2 = Project((l.output :+ saltHot).toSeq, l)
        val right2 = Join(r, saltRel, Cross, None, JoinHint.NONE)
        Join(left2, right2, jt, Some(newCond), hint)
      }
    Project(j.output, salted)
  }

  /** Install (idempotent per advisor; preserves rules owned by others —
    * same contract as [[MaterializationSubstitution.install]]). All
    * extraOptimizations mutation is serialized through
    * [[ExtraOptimizations.mutate]]. */
  def install(spark: SparkSession, advisor: WorkloadAdvisor): Unit =
    ExtraOptimizations.mutate(spark) { existing =>
      existing.filterNot {
        case SkewSaltSubstitution(a) => a eq advisor
        case _ => false
      } :+ SkewSaltSubstitution(advisor)
    }

  private[plans] def uninstall(spark: SparkSession, advisor: WorkloadAdvisor): Unit =
    ExtraOptimizations.mutate(spark) {
      _.filterNot {
        case SkewSaltSubstitution(a) => a eq advisor
        case _ => false
      }
    }
}
