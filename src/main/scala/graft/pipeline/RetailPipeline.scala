package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RelationalOps._

/** Port of the retail medallion pipeline (retail.sql:17-299; FIXTURES.md A3):
  * mixed-case status normalization (UPPER/TRIM), order dedup, DECIMAL(18,2)
  * revenue, CTAS-style gold tables, 7-day rolling category revenue (W2) and
  * a 90-day signup-cohort LTV with COUNT(DISTINCT) per loyalty tier.
  */
object RetailPipeline {

  final case class Customer(customer_id: String, email: String, signup_ts: Timestamp,
                            country: String, state: String, loyalty_tier: Option[String])
  final case class Order(order_id: Long, customer_id: String, order_ts: Timestamp,
                         status: String, payment_method: String, promo_code: Option[String])
  final case class OrderItem(order_id: Long, line_num: Int, sku: String, category: String,
                             qty: Int, unit_price: Double, item_ts: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  val customerSeed = Seq(
    Customer("C1", "a@x.com", ts("2025-01-01 08:00:00"), "US", "CA", Some("GOLD")),
    Customer("C2", "b@x.com", ts("2025-01-15 09:00:00"), "US", "NY", None), // NULL tier
    Customer("C3", "c@x.com", ts("2025-02-01 10:00:00"), "DE", "BE", Some("SILVER")))

  /** Mixed-case statuses ('Paid','PAID','canceled') are the seeded anomaly —
    * silver must normalize before any status comparison (retail.sql:96). */
  val orderSeed = Seq(
    Order(1, "C1", ts("2025-01-05 10:00:00"), "Paid", "card", Some("NEW10")),
    Order(2, "C1", ts("2025-01-20 11:00:00"), "PAID", "card", None),
    Order(3, "C2", ts("2025-02-10 12:00:00"), "paid ", "paypal", None), // trailing space
    Order(4, "C2", ts("2025-03-01 13:00:00"), "canceled", "card", None),
    Order(5, "C3", ts("2025-04-20 14:00:00"), "Paid", "invoice", None), // outside C3's 90d? no: within
    Order(5, "C3", ts("2025-04-20 14:00:00"), "Paid", "invoice", None)) // dup order

  val itemSeed = Seq(
    OrderItem(1, 1, "SKU1", "electronics", 2, 100.00, ts("2025-01-05 10:00:00")),
    OrderItem(1, 2, "SKU2", "home", 1, 50.00, ts("2025-01-05 10:00:00")),
    OrderItem(2, 1, "SKU1", "electronics", 1, 100.00, ts("2025-01-20 11:00:00")),
    OrderItem(3, 1, "SKU3", "toys", 3, 20.00, ts("2025-02-10 12:00:00")),
    OrderItem(4, 1, "SKU2", "home", 4, 50.00, ts("2025-03-01 13:00:00")), // canceled → excluded
    OrderItem(5, 1, "SKU4", "home", 1, 75.50, ts("2025-04-20 14:00:00")))

  def seeded(): Pipeline = new Pipeline("retail", Seq(
    Stage("raw_customers")((s, _) => { import s.implicits._; customerSeed.toDF() }),
    Stage("raw_orders")((s, _) => { import s.implicits._; orderSeed.toDF() }),
    Stage("raw_order_items")((s, _) => { import s.implicits._; itemSeed.toDF() }),

    // Silver orders (retail.sql:89-125): dedup keep-latest + status
    // normalization with UPPER(TRIM(...)).
    Stage("silver_orders", Materialization.Table)((_, st) =>
      dedupKeepLatest(st("raw_orders"), Seq("order_id"), Seq(col("order_ts").desc))
        .withColumn("status", upper(trim(col("status"))))),

    // Order revenue at DECIMAL(18,2) (retail.sql:117): qty*price summed per
    // order, canceled orders excluded.
    Stage("silver_order_revenue")((_, st) => {
      val items = st("raw_order_items")
        .groupBy(col("order_id"))
        .agg(sum(col("qty") * col("unit_price")).cast("decimal(18,2)").as("order_revenue"))
      st("silver_orders").filter(col("status") === "PAID")
        .join(items, "order_id")
    }),

    // Gold: daily revenue per category with the 7-day rolling frame
    // (retail.sql:230-240) — ROWS frame over daily grain.
    Stage("gold_category_rolling")((_, st) => {
      val daily = st("raw_order_items")
        .join(st("silver_orders").filter(col("status") === "PAID"), Seq("order_id"))
        .groupBy(col("category"), to_date(col("order_ts")).as("order_date"))
        .agg(sum(col("qty") * col("unit_price")).cast("decimal(18,2)").as("day_rev"))
      rollingSum(daily, col("day_rev"), "rev_7d",
        Seq(col("category")), Seq(col("order_date")), 6)
    }),

    // Gold: 90-day cohort LTV per loyalty tier (retail.sql:248-276):
    // revenue within 90 days of signup, COALESCE tier → 'UNASSIGNED',
    // COUNT(DISTINCT customer).
    Stage("gold_cohort_ltv", Materialization.Table)((_, st) => {
      val c = st("raw_customers")
      val rev = st("silver_order_revenue")
      val in90 = intervalJoin(c, rev,
        c("customer_id") === rev("customer_id"),
        rev("order_ts"), c("signup_ts"), c("signup_ts") + expr("INTERVAL 90 DAYS"),
        joinType = "left")
      in90.groupBy(coalesce(col("loyalty_tier"), lit("UNASSIGNED")).as("loyalty_tier"))
        .agg(
          countDistinct(c("customer_id")).as("n_customers"),
          sum(coalesce(col("order_revenue"), lit(0).cast("decimal(18,2)"))).as("cohort_revenue_90d"))
    })))
}
