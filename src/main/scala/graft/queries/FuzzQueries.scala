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

  private val Seed = 70L
  private val N = 30

  val list: Seq[Q] = Seq(
    Q("q70_fuzz_differential", (s, dir) => {
      val cases = Fuzz.gen(Seed, N, singleAgg = true)
      cases.map(Fuzz.normalizedDf(s, dir, _)).reduce(_.union(_))
    }, Some(
      Fuzz.gen(Seed, N, singleAgg = true)
        .map(Fuzz.normalizedSql).mkString("\n      UNION ALL\n      ")))
  )
}
