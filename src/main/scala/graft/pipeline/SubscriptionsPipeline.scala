package graft.pipeline

import org.apache.spark.sql.functions._

import graft.ops.RelationalOps._
import graft.pipeline.DremioDialect._

/** Port of the messy-source subscriptions pipeline
  * (semantic_example.sql:16-340; FIXTURES.md A5) — the hard dialect test
  * (SURVEY.md §7.3.2): every timestamp arrives as a STRING in one of four
  * formats (slash, ISO-"T", day-first, epoch seconds) plus garbage; the
  * silver layer sniffs formats with anchored regexes and parses leniently
  * (NULL on failure), maps cryptic flags via simple CASE, renames the
  * semantic layer, and gold derives monthly usage.
  */
object SubscriptionsPipeline {

  final case class CustMstr(cid: String, c_nm: String, c_eml: String,
                            act_flg: String, crt_ts: String)
  final case class UsageEvt(evt_id: String, cust: String, pl: String,
                            u_ts: String, u_cd: String, qty_v: Int)

  /** One row per timestamp format, mirroring semantic_example.sql:25-27. */
  val custSeed = Seq(
    CustMstr("C001", "Ada", "ada@x.com", "C", "2025/08/18 09:15:33"),
    CustMstr("C002", "Grace", "grace@x.com", "C", "2025-08-18T10:01:00Z"),
    CustMstr("C003", "Edsger", "e@x.com", "T", "18-08-2025 11:45"),
    CustMstr("C004", "Alan", "alan@x.com", "C", "1692369600"),
    CustMstr("C005", "Kurt", "kurt@x.com", "T", "not-a-date")) // garbage → NULL

  val usageSeed = Seq(
    UsageEvt("E1", "C001", "PRO", "2025/08/19 10:00:00", "API", 100),
    UsageEvt("E2", "C001", "PRO", "2025-08-20T11:00:00Z", "API", 50),
    UsageEvt("E3", "C002", "BASIC", "19-08-2025 09:30", "UI", 10),
    UsageEvt("E4", "C003", "BASIC", "1724059800", "API", 25), // epoch
    UsageEvt("E5", "C004", "PRO", "garbage-ts", "UI", 5),     // unparseable
    UsageEvt("E6", "C002", "BASIC", "2025/09/01 08:00:00", "API", 40))

  def seeded(): Pipeline = new Pipeline("subscriptions", Seq(
    Stage("raw_cust_mstr")((s, _) => { import s.implicits._; custSeed.toDF() }),
    Stage("raw_usage_evt")((s, _) => { import s.implicits._; usageSeed.toDF() }),

    // Silver customers (semantic_example.sql:99-154): semantic renames,
    // simple-CASE flag decode, multi-format timestamp parsing.
    Stage("silver_customers")((_, st) =>
      st("raw_cust_mstr").select(
        col("cid").as("customer_id"),
        col("c_nm").as("customer_name"),
        col("c_eml").as("email"),
        when(col("act_flg") === "C", lit("ACTIVE"))
          .when(col("act_flg") === "T", lit("TERMINATED"))
          .otherwise(lit("UNKNOWN")).as("account_status"),
        toTimestampMulti(col("crt_ts")).as("created_ts"))),

    // Silver usage (semantic_example.sql:178-246): parse, drop unparseable.
    Stage("silver_usage")((_, st) =>
      st("raw_usage_evt").select(
        col("evt_id").as("event_id"),
        col("cust").as("customer_id"),
        col("pl").as("plan_code"),
        toTimestampMulti(col("u_ts")).as("event_ts"),
        col("u_cd").as("channel"),
        col("qty_v").as("quantity"))
        .filter(col("event_ts").isNotNull)),

    // Gold: monthly usage per plan (semantic_example.sql:278-314:
    // DATE_TRUNC month grouping), active-rate KPI.
    Stage("gold_monthly_usage")((_, st) =>
      st("silver_usage")
        .groupBy(col("plan_code"),
          date_trunc("month", col("event_ts")).cast("date").as("month"))
        .agg(sum(col("quantity")).as("total_quantity"),
          countDistinct(col("customer_id")).as("active_customers"))),

    Stage("gold_account_kpis")((_, st) =>
      st("silver_customers").agg(
        count(lit(1)).as("n_accounts"),
        rate(col("account_status") === "ACTIVE").as("active_rate"),
        countIf(col("created_ts").isNull).as("n_unparseable_created")))))
}
