package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DomainPipelinesSpec extends SparkSpec {

  test("retail: normalization, dedup, decimal revenue, rolling, cohort LTV") {
    val r = RetailPipeline.seeded().run(spark)
    // 6 raw orders − 1 dup = 5; statuses normalized
    val silver = r("silver_orders")
    assert(silver.count() === 5)
    assert(silver.select("status").distinct().collect().map(_.getString(0)).toSet ===
      Set("PAID", "CANCELED"))
    // paid order revenue: o1=250, o2=100, o3=60, o5=75.50 (o4 canceled)
    val rev = r("silver_order_revenue").select("order_id", "order_revenue").collect()
      .map(x => x.getLong(0) -> x.getDecimal(1).doubleValue()).toMap
    assert(rev === Map(1L -> 250.0, 2L -> 100.0, 3L -> 60.0, 5L -> 75.5))
    // cohort LTV: C1 (GOLD) both orders within 90d of signup → 350;
    // C2 (UNASSIGNED) order3 within 90d → 60; C3 (SILVER) order5 (04-20)
    // within 90d of 02-01 signup → 75.50
    val ltv = r("gold_cohort_ltv").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDecimal(2).doubleValue())).toMap
    assert(ltv("GOLD") === ((1L, 350.0)))
    assert(ltv("UNASSIGNED") === ((1L, 60.0)))
    assert(ltv("SILVER") === ((1L, 75.5)))
    // rolling frame is monotone non-decreasing within a single-day category
    val roll = r("gold_category_rolling").filter(col("category") === "home").collect()
    assert(roll.nonEmpty)
  }

  test("subscriptions: four timestamp formats parse; garbage → NULL; gold KPIs") {
    val r = SubscriptionsPipeline.seeded().run(spark)
    val cust = r("silver_customers").orderBy("customer_id").collect()
    assert(cust(0).getTimestamp(4).toString === "2025-08-18 09:15:33.0") // slash
    assert(cust(1).getTimestamp(4).toString === "2025-08-18 10:01:00.0") // ISO T
    assert(cust(2).getTimestamp(4).toString === "2025-08-18 11:45:00.0") // day-first
    assert(cust(3).getTimestamp(4).toString === "2023-08-18 14:40:00.0") // epoch (UTC)
    assert(cust(4).isNullAt(4))                                          // garbage
    assert(cust.map(_.getString(3)).toSeq ===
      Seq("ACTIVE", "ACTIVE", "TERMINATED", "ACTIVE", "TERMINATED"))
    // usage: 6 raw − 1 unparseable = 5
    assert(r("silver_usage").count() === 5)
    val kpi = r("gold_account_kpis").head
    assert(kpi.getLong(0) === 5L)
    assert(kpi.getDouble(1) === 0.6)
    assert(kpi.getLong(2) === 1L)
    // monthly usage: PRO 2025-08 = 150 (E1+E2; E5 dropped)
    val monthly = r("gold_monthly_usage")
      .filter(col("plan_code") === "PRO" && col("month") === lit("2025-08-01").cast("date"))
      .head
    assert(monthly.getLong(2) === 150L)
  }

  test("logistics AI: stub classification makes the gold histogram exact") {
    val r = LogisticsAiPipeline.seeded().run(spark)
    val silver = r("silver_deliveries")
    val labels = silver.select("delivery_id", "issue_label").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(labels === Map(
      1L -> "traffic", 2L -> "none", 3L -> "weather", 4L -> "access problem",
      5L -> "mechanical", 6L -> "none", 7L -> "traffic", 8L -> "weather"))
    val hist = r("gold_issue_histogram").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(hist("traffic") === ((2L, 2L, 2L)))   // both late, both angry/unacceptable
    assert(hist("none") === ((2L, 0L, 0L)))
    assert(hist("weather") === ((2L, 2L, 0L)))
    assert(hist("mechanical") === ((1L, 1L, 0L)))
    val late = r("gold_region_late_rate").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(late("WEST") === 2.0 / 3)
    assert(late("EAST") === 0.5)
  }
}
