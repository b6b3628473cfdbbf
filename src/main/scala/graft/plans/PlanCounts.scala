package graft.plans

/** Physical-plan cost-shape fingerprint: the number of shuffle Exchanges and
  * Sorts in a query's executed plan. These two node counts are the plan
  * properties that turn into cluster cost at 100 TB — an extra Exchange is an
  * extra all-to-all of the data, an extra Sort an extra spill candidate — and
  * they regress silently: a lost broadcast hint or a new non-collapsing
  * Project adds one without any test changing its answer and without the
  * bench noise floor attributing it. [[graft.tools.PlanBudget]] records the
  * counts per registry query into PLAN_BUDGETS.tsv; PlanBudgetSpec fails CI
  * on any drift from the checked-in budget.
  */
object PlanCounts {

  /** (shuffle exchanges, sorts) in a physical plan's string form. String
    * counting deliberately: AQE's AdaptiveSparkPlanExec is a leaf node (its
    * input plan is not a TreeNode child), so collect() misses everything
    * under it, while toString prints the full initial plan.
    *  - `\bExchange\b` counts ShuffleExchange only ("BroadcastExchange" has
    *    no word boundary before its E);
    *  - `\bSort\b` counts SortExec only (no boundary inside "SortAggregate"
    *    / "SortMergeJoin").
    *
    * An EXECUTED AdaptiveSparkPlan (e.g. a materialized cached fixture)
    * prints BOTH "== Final Plan ==" and "== Initial Plan ==" sections, so
    * the same query would count differently depending on which caches an
    * earlier query/suite happened to materialize. [[normalize]] drops the
    * Final sections so every plan counts in its initial-plan form — the
    * form an unexecuted derivation prints.
    */
  def shuffleSortCounts(plan: String): (Int, Int) = {
    val p = normalize(plan)
    ("\\bExchange\\b".r.findAllIn(p).size,
      "\\bSort\\b".r.findAllIn(p).size)
  }

  private[graft] def normalize(plan: String): String = {
    if (!plan.contains("== Final Plan ==")) plan
    else {
      val out = new StringBuilder(plan.length)
      var skipping = false
      plan.split("\n", -1).foreach { l =>
        if (l.contains("== Final Plan ==")) skipping = true
        else if (l.contains("== Initial Plan ==")) skipping = false
        else if (!skipping) out.append(l).append('\n')
      }
      out.toString
    }
  }
}
