package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, ExprId, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

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
        trySubstitute(sub, candidates, used)
          .orElse(tryFilterContainment(sub, candidates, used))
          .orElse(tryJoinAgg(sub, candidates, used))
          .getOrElse(sub)
    }
  }

  private def trySubstitute(sub: LogicalPlan,
                            candidates: Seq[(LogicalPlan, LogicalPlan)],
                            used: scala.collection.mutable.Set[LogicalPlan])
      : Option[LogicalPlan] =
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
      case (canonical, matPlan)
        if rollupRecipe(sub, canonical).isDefined =>
        // ROLL-UP match (aggregation reflection, readme.md:323-329): the
        // query aggregates the same child at a COARSER grain than the
        // materialized aggregate — re-aggregate the mat instead of the
        // raw data (sum of sums, min of mins, avg from sum+count).
        val (groupPos, recipe) = rollupRecipe(sub, canonical).get
        instantiate(matPlan, used).map(inst => buildRollup(sub, inst, groupPos, recipe))
    }.flatten

  /** FILTER containment: a predicate pushed BELOW the aggregate (a join-key
    * `isnotnull` from an inner join over the definition, a user WHERE on a
    * dimension) breaks whole-subtree equality even though the
    * materialization still answers the query. A filter on grouping columns
    * commutes with the aggregate — every row of group v passes or the whole
    * group does — so: strip Filters under the Aggregate, match the stripped
    * subtree through the normal paths, and re-apply the predicates ABOVE the
    * substituted scan, remapped onto the aggregate's passthrough outputs.
    * Predicates referencing non-surfacing or non-grouping columns abort
    * (return None) — correctness over coverage. */
  private def tryFilterContainment(sub: LogicalPlan,
                                   candidates: Seq[(LogicalPlan, LogicalPlan)],
                                   used: scala.collection.mutable.Set[LogicalPlan])
      : Option[LogicalPlan] = sub match {
    case agg @ Aggregate(_, aggs, child, _) =>
      val (stripped, conds) = stripFilters(child)
      if (conds.isEmpty) None
      else {
        // filter references must surface as plain (possibly aliased)
        // passthroughs — in a valid Aggregate those are grouping columns
        val outFor: Map[ExprId, Expression] = aggs.zip(agg.output).collect {
          case (al: Alias, out) if al.child.isInstanceOf[AttributeReference] =>
            al.child.asInstanceOf[AttributeReference].exprId -> (out: Expression)
          case (ar: AttributeReference, out) => ar.exprId -> (out: Expression)
        }.toMap
        val refs = conds.flatMap(_.references.toSeq)
        if (!refs.forall(r => outFor.contains(r.exprId))) None
        else trySubstitute(agg.copy(child = stripped), candidates, used).map { repl =>
          val mapped = conds.map(_.transform {
            case ar: AttributeReference if outFor.contains(ar.exprId) => outFor(ar.exprId)
          }).reduce(org.apache.spark.sql.catalyst.expressions.And)
          org.apache.spark.sql.catalyst.plans.logical.Filter(mapped, repl)
        }
      }
    case _ => None
  }

  /** Collect Filter conjuncts under pruning Projects (Project output ids ==
    * input ids for plain column prunes, so references stay valid). */
  private def stripFilters(p: LogicalPlan): (LogicalPlan, Seq[Expression]) = p match {
    case org.apache.spark.sql.catalyst.plans.logical.Filter(f, x) =>
      val (x2, fs) = stripFilters(x)
      (x2, splitConjuncts(f) ++ fs)
    case pr @ Project(pl, x) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      val (x2, fs) = stripFilters(x)
      (pr.copy(child = x2), fs)
    case other => (other, Nil)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  // --- join-aware rewrite (aggregate over join ← agg reflection ⋈ dim) -------

  /** JOIN containment: `Aggregate(g, a, fact ⋈_inner dim)` where every
    * fact-side column the query touches (join keys, grouping columns, filter
    * columns) is a grouping passthrough of an aggregation reflection over
    * `fact`, and every aggregate measures fact columns the reflection
    * stores. Rewrite: join the REFLECTION to the dim and re-aggregate (sum
    * of sums, sum of counts, min/max of min/max, avg from sum+count).
    *
    * Why this is sound for ANY inner join condition: all rows of a
    * reflection group share the fact columns the condition reads, so each
    * group row joins exactly the dim rows every raw row of that group
    * joined — per-pair re-aggregation reproduces the raw multiplicities
    * (duplicate dim keys included; count(*) re-sums the stored count once
    * per matching dim row, exactly like the raw row count multiplies).
    * Outer joins are NOT rewritten: an unmatched fact group would surface
    * once instead of once per raw row.
    *
    * At scale this is the reflection win the reference describes for star
    * joins (readme.md:320-389): the 100 TB fact never rescans — the
    * pre-aggregated (orders-of-magnitude smaller) reflection joins the
    * dimension, usually as a broadcast. */
  private def tryJoinAgg(sub: LogicalPlan,
                         candidates: Seq[(LogicalPlan, LogicalPlan)],
                         used: scala.collection.mutable.Set[LogicalPlan])
      : Option[LogicalPlan] = sub match {
    case agg @ Aggregate(_, _, child, _) =>
      unwrapPrunes(child) match {
        case join @ Join(l, r, org.apache.spark.sql.catalyst.plans.Inner, cond, _) =>
          attemptJoinAgg(agg, l, r, factIsLeft = true, cond, candidates, used)
            .orElse(attemptJoinAgg(agg, r, l, factIsLeft = false, cond, candidates, used))
        case _ => None
      }
    case _ => None
  }

  /** Strip pure-attribute pruning Projects (references stay valid: a prune's
    * output attrs ARE its input attrs). */
  private def unwrapPrunes(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, x) if pl.forall(_.isInstanceOf[AttributeReference]) => unwrapPrunes(x)
    case x => x
  }

  /** Positional map from `qc`'s output to `dcc`'s output (both canonical):
    * exact equality, or two column-pruning Projects over the same child
    * matched by the projected attrs' (canonical) ids. */
  private def posRemap(qc: LogicalPlan, dcc: LogicalPlan): Option[Int => Option[Int]] = {
    def attrs(pl: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression])
        : Option[Seq[ExprId]] =
      if (pl.forall(_.isInstanceOf[AttributeReference]))
        Some(pl.map(_.asInstanceOf[AttributeReference].exprId))
      else None
    if (qc == dcc) Some(p => Some(p))
    else (qc, dcc) match {
      case (Project(pq, x), Project(pd, y)) if x == y =>
        for { qi <- attrs(pq); di <- attrs(pd) } yield
          (p: Int) => qi.lift(p).flatMap { id =>
            val j = di.indexOf(id); if (j >= 0) Some(j) else None
          }
      case _ => None
    }
  }

  private def attemptJoinAgg(agg: Aggregate, fact: LogicalPlan, dim: LogicalPlan,
                             factIsLeft: Boolean, cond: Option[Expression],
                             candidates: Seq[(LogicalPlan, LogicalPlan)],
                             used: scala.collection.mutable.Set[LogicalPlan])
      : Option[LogicalPlan] = {
    // fact-side filters (inner-join isnotnull pushdowns, user predicates)
    // commute with the reflection's grouping when they only read passthrough
    // columns — strip for matching, re-apply above the substituted scan
    val (stripped, factConds) = stripFilters(fact)
    val sc = stripped.canonicalized
    // Try EVERY structurally matching reflection, not just the first: one
    // whose measures can't serve this query (buildJoinAgg → None) must not
    // shadow a later one that can.
    candidates.view.flatMap {
      case (dCanon @ Aggregate(_, _, _, _), matPlan) =>
        posRemap(sc, dCanon.child).flatMap { rm =>
          buildJoinAgg(agg, stripped, factConds, dim, factIsLeft, cond,
            dCanon, matPlan, rm, used)
        }
      case _ => None
    }.headOption
  }

  private def buildJoinAgg(agg: Aggregate, stripped: LogicalPlan,
                           factConds: Seq[Expression], dim: LogicalPlan,
                           factIsLeft: Boolean, cond: Option[Expression],
                           dCanon: Aggregate, matPlan: LogicalPlan,
                           remap: Int => Option[Int],
                           used: scala.collection.mutable.Set[LogicalPlan])
      : Option[LogicalPlan] = {
    val dOut = dCanon.aggregateExpressions.map(strip)
    val dChild = dCanon.child
    val factSet = stripped.outputSet
    val dimSet = dim.outputSet

    // original fact attr → the canonical attr AS THE DEFINITION'S AGGREGATE
    // REFERENCES IT: canonicalization re-keys a parent's expressions to its
    // child's OUTPUT POSITIONS, so the child-output attr must be re-keyed to
    // ExprId(position) before comparing (same model as rollupRecipe).
    def defAttr(a: AttributeReference): Option[Expression] = {
      val p = stripped.output.indexWhere(_.exprId == a.exprId)
      if (p < 0) None
      else remap(p).map(j => dChild.output(j).withExprId(ExprId(j)))
    }
    // original fact attr → reflection output position (grouping passthrough)
    def matPos(a: AttributeReference): Option[Int] =
      defAttr(a).map(dOut.indexOf).filter(_ >= 0)
    def allFactMappable(e: Expression): Boolean = e.references.forall {
      case a: AttributeReference if factSet.contains(a) => matPos(a).isDefined
      case a => dimSet.contains(a)
    }

    def dFn(j: Int): Option[AggregateFunction] = dOut(j) match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        Some(ae.aggregateFunction)
      case _ => None
    }
    def findAgg(p: AggregateFunction => Boolean): Option[Int] =
      dOut.indices.find(j => dFn(j).exists(p))
    // agg children must be single fact attrs (or foldable count literals) —
    // matched against the definition's canonical agg children by attr object
    def defChild(e: Expression): Option[Expression] = e match {
      case a: AttributeReference if factSet.contains(a) => defAttr(a)
      case lit: org.apache.spark.sql.catalyst.expressions.Literal => Some(lit)
      case _ => None
    }
    def recipeOf(ae: AggregateExpression): Option[RollupCol] =
      if (ae.isDistinct || ae.filter.nonEmpty) None
      else ae.aggregateFunction match {
        case s: Sum => defChild(s.child).flatMap(x =>
          findAgg { case s2: Sum => s2.child == x; case _ => false }).map(RollSum)
        case c: Count => c.children.foldLeft(Option(Seq.empty[Expression])) {
          (acc, ch) => acc.flatMap(xs => defChild(ch).map(xs :+ _))
        }.flatMap(xs =>
          findAgg { case c2: Count => c2.children == xs; case _ => false }).map(RollSum)
        case m: Min => defChild(m.child).flatMap(x =>
          findAgg { case m2: Min => m2.child == x; case _ => false }).map(RollMin)
        case m: Max => defChild(m.child).flatMap(x =>
          findAgg { case m2: Max => m2.child == x; case _ => false }).map(RollMax)
        case a: Average if a.dataType == DoubleType =>
          for {
            x <- defChild(a.child)
            js <- findAgg { case s: Sum => s.child == x; case _ => false }
            jc <- findAgg { case c: Count => c.children == Seq(x); case _ => false }
          } yield RollAvg(js, jc)
        case _ => None
      }

    // every predicate that must move onto the reflection reads only
    // passthrough fact columns (or dim columns, for the join condition)
    val condsOk = cond.forall(allFactMappable) && factConds.forall(allFactMappable)
    // An output may be a COMPOSITE over aggregates (CollapseProject folds
    // `round(sum(x), 2)` into the Aggregate): validate recursively — every
    // embedded AggregateExpression needs a recipe, every bare fact attr a
    // passthrough position, dim attrs pass verbatim.
    def checkOut(e: Expression): Boolean = e match {
      case ae: AggregateExpression => recipeOf(ae).isDefined
      case a: AttributeReference if factSet.contains(a) => matPos(a).isDefined
      case a: AttributeReference => dimSet.contains(a)
      case _ => e.children.forall(checkOut)
    }
    val outsOk = agg.aggregateExpressions.forall(ne => checkOut(strip(ne)))
    val groupOk = agg.groupingExpressions.forall(checkOut)

    if (!condsOk || !groupOk || !outsOk) None
    else instantiate(matPlan, used).map { inst =>
      val instOut = inst.output
      def aggE(f: AggregateFunction): Expression =
        AggregateExpression(f, Complete, isDistinct = false)
      def buildOut(e: Expression): Expression = e match {
        case ae: AggregateExpression =>
          val built: Expression = recipeOf(ae).get match {
            case RollSum(j) => aggE(new Sum(instOut(j)))
            case RollMin(j) => aggE(Min(instOut(j)))
            case RollMax(j) => aggE(Max(instOut(j)))
            case RollAvg(js, jc) =>
              Divide(Cast(aggE(new Sum(instOut(js))), DoubleType),
                Cast(aggE(new Sum(instOut(jc))), DoubleType))
            case GroupCol(j) => instOut(j)
          }
          if (built.dataType == ae.dataType) built else Cast(built, ae.dataType)
        case a: AttributeReference if factSet.contains(a) => instOut(matPos(a).get)
        case a: AttributeReference => a
        case _ => e.mapChildren(buildOut)
      }
      val factLeg: LogicalPlan =
        if (factConds.isEmpty) inst
        else org.apache.spark.sql.catalyst.plans.logical.Filter(
          factConds.map(buildOut).reduce(org.apache.spark.sql.catalyst.expressions.And), inst)
      val (nl, nr) = if (factIsLeft) (factLeg, dim) else (dim, factLeg)
      val newJoin = Join(nl, nr, org.apache.spark.sql.catalyst.plans.Inner,
        cond.map(buildOut), org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE)
      val newAggs = agg.aggregateExpressions.zip(agg.output).map {
        // Only DIM attrs survive unchanged — the dim leg is reused verbatim so
        // its ids stay live. A FACT passthrough must be remapped onto the
        // reflection instance's output (fresh ids) while keeping the original
        // output id for parents.
        case (a: AttributeReference, _) if !factSet.contains(a) => a
        case (ne, out) => Alias(buildOut(strip(ne)), out.name)(exprId = out.exprId)
      }
      val newG = agg.groupingExpressions.map(buildOut)
      Aggregate(newG, newAggs, newJoin): LogicalPlan
    }
  }

  // --- aggregate roll-up rewrite ---------------------------------------------

  private sealed trait RollupCol
  private case class GroupCol(pos: Int) extends RollupCol
  private case class RollSum(pos: Int) extends RollupCol // sum & count both re-sum
  private case class RollMin(pos: Int) extends RollupCol
  private case class RollMax(pos: Int) extends RollupCol
  private case class RollAvg(sumPos: Int, cntPos: Int) extends RollupCol

  /** Matches `sub` = Aggregate over the definition's child with grouping ⊆
    * the definition's grouping and every output derivable from the
    * materialized columns: grouping passthrough, SUM→sum of sums,
    * COUNT→sum of counts, MIN/MAX→min/max of mins/maxes, AVG→sum(sum)/
    * sum(count). Matching runs on canonicalized plans; the child may be
    * column-pruned on either side (attribute positions are composed through
    * the pruning Projects). DISTINCT/FILTER aggregates never roll up. */
  private def rollupRecipe(sub: LogicalPlan, defCanonical: LogicalPlan)
      : Option[(Seq[Int], Seq[RollupCol])] =
    (sub.canonicalized, defCanonical) match {
      case (q: Aggregate, d: Aggregate) if q.groupingExpressions.nonEmpty =>
        childRemap(q.child, d.child).flatMap { remap =>
          val dOut = d.aggregateExpressions.map(strip)
          def dFn(j: Int): Option[AggregateFunction] = dOut(j) match {
            case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
              Some(ae.aggregateFunction)
            case _ => None
          }
          def findAgg(p: AggregateFunction => Boolean): Option[Int] =
            dOut.indices.find(j => dFn(j).exists(p))
          def remapE(e: Expression): Option[Expression] = {
            var ok = true
            val r = e.transform {
              case ar: AttributeReference => remap(ar.exprId.id) match {
                case Some(j) => ar.withExprId(ExprId(j))
                case None => ok = false; ar
              }
            }
            if (ok) Some(r) else None
          }
          def groupColOf(e: Expression): Option[Int] =
            remapE(e).flatMap { re =>
              val j = dOut.indexOf(re)
              if (j >= 0) Some(j) else None
            }
          val groupPos = q.groupingExpressions.map(groupColOf)
          val recipe = q.aggregateExpressions.map(strip).map {
            case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
              ae.aggregateFunction match {
                case s: Sum => remapE(s.child).flatMap(x =>
                  findAgg { case s2: Sum => s2.child == x; case _ => false }).map(RollSum)
                case c: Count => c.children.foldLeft(Option(Seq.empty[Expression])) {
                  (acc, ch) => acc.flatMap(xs => remapE(ch).map(xs :+ _))
                }.flatMap(xs =>
                  findAgg { case c2: Count => c2.children == xs; case _ => false }).map(RollSum)
                case m: Min => remapE(m.child).flatMap(x =>
                  findAgg { case m2: Min => m2.child == x; case _ => false }).map(RollMin)
                case m: Max => remapE(m.child).flatMap(x =>
                  findAgg { case m2: Max => m2.child == x; case _ => false }).map(RollMax)
                case a: Average if a.dataType == DoubleType =>
                  for {
                    x <- remapE(a.child)
                    js <- findAgg { case s: Sum => s.child == x; case _ => false }
                    jc <- findAgg { case c: Count => c.children == Seq(x); case _ => false }
                  } yield RollAvg(js, jc)
                case _ => None
              }
            case e => groupColOf(e).map(GroupCol) // grouping passthrough
          }
          if (groupPos.forall(_.isDefined) && recipe.forall(_.isDefined)) {
            val gset = groupPos.flatten.toSet
            // a passthrough output must BE one of the grouping columns, or
            // the rebuilt Aggregate would reference a non-grouped attribute
            val valid = recipe.flatten.forall {
              case GroupCol(j) => gset.contains(j)
              case _ => true
            }
            if (valid) Some((groupPos.map(_.get), recipe.map(_.get))) else None
          } else None
        }
      case _ => None
    }

  /** Position remap from q-child output ordinals to d-child output ordinals,
    * composing through column-pruning Projects on either side. Canonicalized
    * attribute ids ARE ordinals, which is what makes this a pure Int map. */
  private def childRemap(qc: LogicalPlan, dc: LogicalPlan)
      : Option[Long => Option[Long]] = {
    def attrPos(p: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression])
        : Option[Seq[Long]] =
      if (p.forall(_.isInstanceOf[AttributeReference]))
        Some(p.map(_.asInstanceOf[AttributeReference].exprId.id))
      else None
    if (qc == dc) Some(i => Some(i))
    else (qc, dc) match {
      case (Project(pq, x), _) if x == dc =>
        attrPos(pq).map(mq => (i: Long) => mq.lift(i.toInt))
      case (_, Project(pd, y)) if qc == y =>
        attrPos(pd).map(md => (i: Long) => { val j = md.indexOf(i); if (j >= 0) Some(j.toLong) else None })
      case (Project(pq, x), Project(pd, y)) if x == y =>
        for { mq <- attrPos(pq); md <- attrPos(pd) } yield
          (i: Long) => mq.lift(i.toInt).flatMap { r =>
            val j = md.indexOf(r); if (j >= 0) Some(j.toLong) else None
          }
      case _ => None
    }
  }

  /** Construct the replacement Aggregate over the instantiated mat scan,
    * re-keyed to the substituted subtree's attribute ids. */
  private def buildRollup(sub: LogicalPlan, inst: LogicalPlan,
                          groupPos: Seq[Int], recipe: Seq[RollupCol]): LogicalPlan = {
    val out = inst.output
    def agg(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)
    val exprs = sub.output.zip(recipe).map { case (orig, rc) =>
      val e: Expression = rc match {
        case GroupCol(j) => out(j)
        case RollSum(j) => agg(new Sum(out(j)))
        case RollMin(j) => agg(Min(out(j)))
        case RollMax(j) => agg(Max(out(j)))
        case RollAvg(js, jc) =>
          Divide(Cast(agg(new Sum(out(js))), DoubleType),
            Cast(agg(new Sum(out(jc))), DoubleType))
      }
      val typed = if (e.dataType == orig.dataType) e else Cast(e, orig.dataType)
      Alias(typed, orig.name)(exprId = orig.exprId)
    }
    Aggregate(groupPos.distinct.map(out), exprs, inst)
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
        val dStripped = d.aggregateExpressions.map(strip)
        val positions = a.aggregateExpressions.map(e => dStripped.indexOf(strip(e)))
        if (positions.forall(_ >= 0)) Some(positions) else None
      case _ => None
    }

  /** Canonicalized Alias exprIds are positional; compare with them stripped. */
  private def strip(e: Expression): Expression = e match {
    case al: Alias => al.child
    case x => x
  }

  /** The materialized scan itself must never be re-substituted. */
  private def isMaterializedScan(p: LogicalPlan,
                                 cands: Seq[(LogicalPlan, LogicalPlan)]): Boolean =
    cands.exists { case (_, mat) => p.canonicalized == mat.canonicalized }
}

object MaterializationSubstitution {
  /** Install the rule (idempotent; REPLACES a previously installed instance
    * so the rule always consults the caller's Materializations registry). */
  /** Idempotent per registry: replaces this registry's rule if present,
    * PRESERVING rules owned by other [[Materializations]] registries — a
    * session can host several (e.g. q54's API-path fixture and a
    * SqlScriptRunner's scripted reflections) and installing one must not
    * evict the others. */
  def install(spark: SparkSession, mats: Materializations): Unit =
    ExtraOptimizations.mutate(spark) { existing =>
      existing.filterNot {
        case MaterializationSubstitution(m) => m eq mats
        case _ => false
      } :+ MaterializationSubstitution(mats)
    }
}
