package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps._

/** Compact ports of the remaining industry pipelines (FIXTURES.md A8) —
  * each captures its domain's distinctive operators with a seeded fixture
  * whose gold numbers are hand-computable (asserted in MiscDomainsSpec).
  */
object MiscDomains {

  private def ts(s: String) = Timestamp.valueOf(s)

  // --- finance (finance_example.sql:15-89): 2-key symbol+date equi join,
  // signed P&L CASE, DECIMAL(18,4) ---------------------------------------
  object Finance {
    final case class Trade(trade_id: Long, symbol: String, side: String,
                           qty: Int, price: Double, trade_ts: Timestamp)
    final case class DailyPrice(symbol: String, price_date: Timestamp, close_price: Double)

    val trades = Seq(
      Trade(1, "ACME", "BUY", 100, 10.00, ts("2025-08-18 10:00:00")),
      Trade(2, "ACME", "SELL", 40, 12.50, ts("2025-08-18 14:00:00")),
      Trade(3, "GLOBO", "BUY", 200, 5.00, ts("2025-08-18 11:00:00")),
      Trade(4, "GLOBO", "SELL", 200, 4.50, ts("2025-08-19 09:30:00")),
      Trade(5, "ACME", "BUY", 50, 11.00, ts("2025-08-19 10:15:00")))
    val prices = Seq(
      DailyPrice("ACME", ts("2025-08-18 00:00:00"), 12.00),
      DailyPrice("ACME", ts("2025-08-19 00:00:00"), 11.50),
      DailyPrice("GLOBO", ts("2025-08-18 00:00:00"), 4.80),
      DailyPrice("GLOBO", ts("2025-08-19 00:00:00"), 4.40))

    /** Mark-to-market P&L per trade: J2 composite join on
      * (symbol, DATE_TRUNC day) + signed CASE (BUY: close−price, SELL:
      * price−close), DECIMAL(18,4) like finance_example.sql:21. */
    def markToMarket(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val t = trades.toDF(); val p = prices.toDF()
      t.join(p, t("symbol") === p("symbol") &&
          date_trunc("day", t("trade_ts")) === date_trunc("day", p("price_date")))
        .select(t("trade_id"), t("symbol"), t("side"), t("qty"),
          (when(t("side") === "BUY", p("close_price") - t("price"))
            .otherwise(t("price") - p("close_price")) * t("qty"))
            .cast("decimal(18,4)").as("pnl"))
    }
  }

  // --- gov 311 (gov_example.sql:12-107): TIMESTAMPADD(sla_days) due dates,
  // AVG-of-flag SLA compliance --------------------------------------------
  object Gov311 {
    final case class Request(request_id: Long, category: String, opened_ts: Timestamp,
                             closed_ts: Option[Timestamp], sla_days: Int)

    val requests = Seq(
      Request(1, "POTHOLE", ts("2025-06-01 08:00:00"), Some(ts("2025-06-03 10:00:00")), 5),  // on time
      Request(2, "POTHOLE", ts("2025-06-02 09:00:00"), Some(ts("2025-06-10 10:00:00")), 5),  // late
      Request(3, "GRAFFITI", ts("2025-06-03 10:00:00"), Some(ts("2025-06-04 09:00:00")), 2), // on time
      Request(4, "GRAFFITI", ts("2025-06-05 11:00:00"), None, 2),                            // open
      Request(5, "STREETLIGHT", ts("2025-06-06 12:00:00"), Some(ts("2025-06-16 12:00:00")), 10)) // boundary: exactly due

    /** Due date via dynamic interval from a column (TIMESTAMPADD(DAY,
      * sla_days, opened) — gov_example.sql:80-85) and the SLA rate KPI. */
    def slaCompliance(spark: SparkSession): DataFrame = {
      import spark.implicits._
      requests.toDF()
        .withColumn("due_ts", expr("timestampadd(DAY, sla_days, opened_ts)"))
        .withColumn("met_sla",
          when(col("closed_ts").isNotNull, col("closed_ts") <= col("due_ts")))
        .groupBy(col("category"))
        .agg(count(lit(1)).as("n_requests"),
          countIf(col("closed_ts").isNull).as("n_open"),
          avg(when(col("met_sla"), 1).otherwise(when(col("met_sla").isNotNull, 0)))
            .as("sla_rate"))
    }
  }

  // --- insurance (insurance_example.sql:13-148): DATE_TRUNC month join key,
  // guarded loss ratio / frequency / severity ------------------------------
  object Insurance {
    final case class Premium(policy_id: String, premium_month: Timestamp, premium: Double)
    final case class Claim(claim_id: Long, policy_id: String, claim_ts: Timestamp, paid: Double)

    val premiums = Seq(
      Premium("P1", ts("2025-07-01 00:00:00"), 1000.0),
      Premium("P2", ts("2025-07-01 00:00:00"), 500.0),
      Premium("P1", ts("2025-08-01 00:00:00"), 1000.0),
      Premium("P2", ts("2025-08-01 00:00:00"), 500.0))
    val claims = Seq(
      Claim(1, "P1", ts("2025-07-10 00:00:00"), 300.0),
      Claim(2, "P1", ts("2025-07-20 00:00:00"), 450.0),
      Claim(3, "P2", ts("2025-08-05 00:00:00"), 2000.0)) // loss-making month

    /** Monthly loss ratio per policy: left join on the derived
      * DATE_TRUNC('month') key (J2 with expression key,
      * insurance_example.sql:83-86), guarded division KPIs. */
    def monthlyLossRatio(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val p = premiums.toDF()
      val c = claims.toDF()
        .groupBy(col("policy_id").as("c_policy_id"),
          date_trunc("month", col("claim_ts")).as("claim_month"))
        .agg(sum(col("paid")).as("paid"), count(lit(1)).as("n_claims"))
      p.join(c, p("policy_id") === col("c_policy_id") &&
          p("premium_month") === col("claim_month"), "left")
        .groupBy(p("policy_id"), p("premium_month"))
        .agg(sum(col("premium")).as("premium"),
          sum(coalesce(col("paid"), lit(0.0))).as("paid"),
          sum(coalesce(col("n_claims"), lit(0L))).as("n_claims"))
        .withColumn("loss_ratio", guardedRatio(col("paid"), col("premium")))
    }
  }

  // --- supply chain (supply_chain_example.sql:10-110): composite-key PO
  // line ⋈ receipts, per-row OTIF flags, OTIF rate -------------------------
  object SupplyChain {
    final case class PoLine(po_id: Long, line_id: Int, sku: String, qty_ordered: Int,
                            promised_ts: Timestamp)
    final case class Receipt(po_id: Long, line_id: Int, received_ts: Timestamp, qty_received: Int)

    // Per-row expected outcomes (the reference documents each row's
    // OTIF verdict in comments, supply_chain_example.sql:52-57):
    val poLines = Seq(
      PoLine(100, 1, "SKU-A", 10, ts("2025-05-10 00:00:00")), // on-time, in-full  → OTIF
      PoLine(100, 2, "SKU-B", 20, ts("2025-05-10 00:00:00")), // late              → not OTIF
      PoLine(101, 1, "SKU-A", 5, ts("2025-05-12 00:00:00")),  // short             → not OTIF
      PoLine(101, 2, "SKU-C", 8, ts("2025-05-15 00:00:00")))  // never received    → not OTIF
    val receipts = Seq(
      Receipt(100, 1, ts("2025-05-09 10:00:00"), 10),
      Receipt(100, 2, ts("2025-05-12 09:00:00"), 20),
      Receipt(101, 1, ts("2025-05-11 08:00:00"), 3))

    def otif(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val po = poLines.toDF(); val r = receipts.toDF()
      po.join(r, Seq("po_id", "line_id"), "left") // J2 composite key
        .withColumn("on_time",
          col("received_ts").isNotNull && col("received_ts") <= col("promised_ts"))
        .withColumn("in_full",
          col("qty_received").isNotNull && col("qty_received") >= col("qty_ordered"))
        .withColumn("otif", col("on_time") && col("in_full"))
    }

    def otifRate(spark: SparkSession): DataFrame =
      otif(spark).agg(
        rate(col("otif")).as("otif_rate"),
        rate(col("on_time")).as("on_time_rate"),
        rate(col("in_full")).as("in_full_rate"))
  }

  // --- healthcare (healthcare_example.sql:82-124): LIKE-cohort flags with
  // existence aggregation over claims -------------------------------------
  object Healthcare {
    final case class HcClaim(claim_id: Long, member_id: String, dx_code: String,
                             service_ts: Timestamp, allowed: Double)

    val claims = Seq(
      HcClaim(1, "M1", "E11.9", ts("2025-04-01 00:00:00"), 120.0),
      HcClaim(2, "M1", "I10", ts("2025-04-15 00:00:00"), 80.0),
      HcClaim(3, "M2", "J45.0", ts("2025-04-20 00:00:00"), 60.0),
      HcClaim(4, "M3", "E11.65", ts("2025-05-01 00:00:00"), 200.0),
      HcClaim(5, "M3", "E11.9", ts("2025-05-10 00:00:00"), 150.0))

    /** Per-member cohort profile: diabetic existence flag (LIKE 'E11%' +
      * MAX CASE — healthcare_example.sql:97,104-110), FILTER-style counts. */
    def memberCohorts(spark: SparkSession): DataFrame = {
      import spark.implicits._
      claims.toDF()
        .groupBy(col("member_id"))
        .agg(existsFlag(col("dx_code").like("E11%")).as("is_diabetic"),
          countIf(col("dx_code").like("E11%")).as("n_diabetic_claims"),
          sum(col("allowed")).as("total_allowed"))
    }
  }

  // --- media AI (media_ai.sql:42-256): LISTAGG tag rollup + AI caption
  // classification over asset descriptions ---------------------------------
  object MediaAi {
    final case class Asset(asset_id: Long, title: String, description: String, tag: String)

    val assets = Seq(
      Asset(1, "Goal compilation", "soccer highlights with amazing goals from the match", "sports"),
      Asset(2, "Goal compilation", "soccer highlights with amazing goals from the match", "football"),
      Asset(3, "Cooking show", "chef prepares a recipe with fresh ingredients in the kitchen", "food"),
      Asset(4, "News briefing", "breaking news report on the election results tonight", "news"))

    def assetProfile(spark: SparkSession): DataFrame = {
      import spark.implicits._
      graft.ai.AiFunctions.register(spark)
      assets.toDF()
        .groupBy(col("asset_id"), col("title"), col("description"))
        .agg(listaggDistinct(col("tag"), ", ").as("tags")) // A12 LISTAGG
        .withColumn("category", graft.ai.AiFunctions.aiClassify(
          col("description"),
          typedlit(Seq("sports match", "cooking recipe", "news report", "music"))))
    }
  }
}
