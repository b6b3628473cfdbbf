package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates PLAN_BUDGETS.tsv: per registry query, the shuffle-Exchange
  * and Sort counts of its physical plan (see [[graft.plans.PlanCounts]]).
  * The session config mirrors SparkSpec's (local[4], 4 shuffle partitions,
  * sf0.001) so the recorded plans are the ones PlanBudgetSpec re-derives.
  *
  * Run after any intentional plan change:
  *   sbt "runMain graft.tools.PlanBudget"
  * then review the diff — an INCREASE needs a justification in the commit.
  */
object PlanBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLAN_BUDGETS.tsv")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = graft.SparkEntry.allQueries.map { q =>
      // derivation must not depend on which caches an earlier query
      // materialized: a materialized InMemoryRelation prints its
      // AdaptiveSparkPlan with the FINAL plan (extra Exchange text), so the
      // same query counts differently by session history. Clearing first
      // makes the recorded counts order-independent (PlanBudgetSpec clears
      // identically before re-deriving).
      spark.catalog.clearCache()
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val (sh, so) = graft.plans.PlanCounts.shuffleSortCounts(plan)
      s"${q.name}\t$sh\t$so"
    }
    val header = "# query\tshuffle_exchanges\tsorts — regenerate with: " +
      "sbt \"runMain graft.tools.PlanBudget\" (see PlanBudgetSpec)"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (header +: lines).mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"wrote $out (${lines.size} queries)")
    spark.stop()
  }
}
