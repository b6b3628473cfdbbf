package graft.queries

import org.apache.spark.sql.functions._

import graft.tools.Fuzz

/** Cross-engine differential fuzzing surfaced through the driver gate: a
  * seeded batch of generated single-measure filter+groupBy+agg queries (some
  * joined) union-alled into one normalized (case_id, group-key, value)
  * result. The oracle union-alls the SAME generated SQL in DuckDB — so every
  * driver run hash-compares a batch of queries nobody hand-wrote, on top of
  * FuzzSpec's 200-case Spark-internal differential (DataFrame plan vs SQL
  * parser). Seed and count are FIXED so the check is reproducible across
  * rounds; change the seed to rotate the batch.
  */
object FuzzQueries {

  // shared with PlanAuditSpec's per-case shuffle-budget pin, so rotating
  // the batch re-pins the cases that actually run
  private[graft] val Seed = 70L
  private[graft] val N = 30

  val list: Seq[Q] = Seq(
    Q("q70_fuzz_differential", (s, dir) => {
      val cases = Fuzz.gen(Seed, N, singleAgg = true)
      // The 30 generated cases are INDEPENDENT queries; union-ing their lazy
      // plans into one tree made every analysis/AQE-replan pass walk a
      // 30-branch plan and serialized the driver on it (guide §3.3 "very
      // wide unions: planning time itself becomes the bottleneck", §7.3).
      // Instead each case is materialized CONCURRENTLY from a small driver
      // pool (guide §2.6 — overlap independent jobs so one case's straggler
      // tail back-fills with the next case's tasks) via an eager
      // localCheckpoint (lineage truncation, recomputed per invocation — no
      // cross-run state), and the returned union is over the 30 already-
      // computed results. Rows are IDENTICAL: checkpointing changes where
      // blocks live, never values; the per-case plans are untouched.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        // Duration.Inf: the lazy-union form this replaced had no per-case
        // deadline either — a straggling case must block, not fail the run
        val done = cases.map { c =>
          Future(Fuzz.normalizedDf(s, dir, c).localCheckpoint(true))
        }.map(Await.result(_, Duration.Inf))
        done.reduce(_.union(_))
      } finally pool.shutdown()
    }, Some(
      Fuzz.gen(Seed, N, singleAgg = true)
        .map(Fuzz.normalizedSql).mkString("\n      UNION ALL\n      ")))
  )
}
