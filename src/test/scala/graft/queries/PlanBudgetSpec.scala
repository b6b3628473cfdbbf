package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.plans.PlanCounts

/** Shuffle-budget gate: every registry query's physical plan must carry
  * EXACTLY the shuffle-Exchange and Sort counts recorded in PLAN_BUDGETS.tsv.
  * PlanAuditSpec bans the catastrophic shapes (cartesians); this spec catches
  * the quiet ones — an Exchange creeping into a plan is invisible to the
  * correctness gate and hides inside bench noise, but is a full extra
  * all-to-all pass at 100 TB. Intentional plan changes regenerate the file
  * (`sbt "runMain graft.tools.PlanBudget"`) and justify increases in the
  * commit; decreases also fail so the budget ratchets down rather than
  * going stale.
  */
class PlanBudgetSpec extends SparkSpec {

  private val sfDir = graft.SparkSpec.sfDir

  test("every registry query matches its recorded shuffle/sort budget") {
    val budgetFile = java.nio.file.Paths.get("PLAN_BUDGETS.tsv")
    assert(java.nio.file.Files.exists(budgetFile),
      "PLAN_BUDGETS.tsv missing — run: sbt \"runMain graft.tools.PlanBudget\"")
    val budgets = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(budgetFile)).asScala
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val Array(name, sh, so) = l.split("\t")
        name -> (sh.toInt, so.toInt)
      }.toMap

    val problems = SparkEntry.allQueries.flatMap { q =>
      // mirror the PlanBudget tool: clear caches so the derived plan text
      // doesn't depend on which earlier suite materialized a shared
      // persist (a materialized AdaptiveSparkPlan prints extra Exchanges)
      spark.catalog.clearCache()
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val (sh, so) = PlanCounts.shuffleSortCounts(plan)
      budgets.get(q.name) match {
        case None =>
          Some(s"${q.name}: not in PLAN_BUDGETS.tsv (new query — regenerate)")
        case Some((bsh, bso)) if sh > bsh || so > bso =>
          Some(s"${q.name}: plan REGRESSED — shuffles $bsh→$sh, sorts $bso→$so" +
            " (find the extra Exchange/Sort, or regenerate + justify)")
        case Some((bsh, bso)) if sh < bsh || so < bso =>
          Some(s"${q.name}: plan improved — shuffles $bsh→$sh, sorts $bso→$so" +
            " (ratchet the budget down: regenerate PLAN_BUDGETS.tsv)")
        case _ => None
      }
    }
    val stale = budgets.keySet.diff(SparkEntry.allQueries.map(_.name).toSet)
    assert(problems.isEmpty && stale.isEmpty,
      (problems ++ stale.map(n => s"$n: in budget but not in registry"))
        .mkString("\n"))
  }
}
