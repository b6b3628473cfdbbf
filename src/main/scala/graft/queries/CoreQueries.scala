package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.RelationalOps._

/** Relational operator coverage for SURVEY.md §2.4–§2.9, re-expressed over
  * the TPC-H-ish test tables. Each query cites the reference pattern it
  * mirrors. Scale intent: dimension joins broadcast, fact-side aggregations
  * are partial (map-side) by construction, every filter/projection is
  * declarative so Catalyst pushes it into the parquet scan.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** q54's refreshed-reflection fixture, keyed by (session, sf dir). */
  private[queries] val reflectionFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, graft.plans.Materializations]()

  /** q66's scripted-pipeline fixture: the reflection DDL runs once per
    * (session, sf dir) — reflections refresh out-of-band in the reference
    * (readme.md:322-329) — so per-invocation timing measures the SERVE path. */
  private[queries] val scriptRunnerFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, graft.pipeline.SqlScriptRunner]()

  /** q68's z-ordered-orders fixture (path of the clustered copy); the
    * rewrite is maintenance (OPTIMIZE-time), not query-time work. */
  private[queries] val zorderFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q69's join-reflection fixture (refresh is out-of-band, as in q54). */
  private[queries] val joinReflFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, graft.plans.Materializations]()

  /** q68's WRITE side as a standalone measurable: a FRESH z-order rewrite of
    * orders into a new directory (what OPTIMIZE … ZORDER BY pays at
    * maintenance time). Exposed so the bench reports write and read rows
    * separately instead of folding maintenance cost into the read path. */
  private[graft] def zorderWriteFresh(s: SparkSession, dir: String): Unit = {
    val out = graft.TempDirs.newDir("graft_zorder_w") + "/orders_z"
    graft.ops.ScaleOps.zorderWrite(t(s, dir, "orders"),
      Seq("o_orderdate", "o_totalprice"), out, targetFiles = 8)
  }

  /** q68's READ side: file-skipping proof + 2-column range aggregate over
    * the (fixture-cached) z-ordered copy. */
  private[graft] def zorderRead(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ScaleOps
    val path = zorderFixtures.computeIfAbsent(
      s"${System.identityHashCode(s)}|$dir", _ => {
        val out = graft.TempDirs.newDir("graft_zorder") + "/orders_z"
        ScaleOps.zorderWrite(t(s, dir, "orders"),
          Seq("o_orderdate", "o_totalprice"), out, targetFiles = 8)
        out
      })
    val z = s.read.parquet(path)
    // Skipping proof in ONE pass: per-file min/max of BOTH clustered columns
    // ride the same input_file_name groupBy, and the three counts the
    // require()s need (file count + per-column overlap counts) reduce to a
    // single 1-row aggregate — one job where three separate
    // fileRangeStats scans (3 full reads of the table) ran before
    // (opt guide §1.2: don't compute things three times). Ranges and the
    // overlap predicate are unchanged, so the requirement pins the exact
    // same claim.
    val dLo = lit("1994-01-01").cast("timestamp")
    val dHi = lit("1994-03-31").cast("timestamp")
    val stats = ScaleOps.fileRangeStatsMulti(z, Seq("o_totalprice", "o_orderdate"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("o_totalprice_lo") <= lit(100000.0) &&
          col("o_totalprice_hi") >= lit(50000.0), 1L)
          .otherwise(0L)).as("p_overlap"),
        sum(when(col("o_orderdate_lo") <= dHi && col("o_orderdate_hi") >= dLo, 1L)
          .otherwise(0L)).as("d_overlap"))
      .head()
    val nFiles = stats.getLong(0)
    require(stats.getLong(1) < nFiles,
      "z-order layout failed to prune files on o_totalprice")
    require(stats.getLong(2) < nFiles,
      "z-order layout failed to prune files on o_orderdate")
    z.filter(col("o_orderdate").between(lit("1994-01-01").cast("timestamp"),
        lit("1994-03-31").cast("timestamp")) &&
        col("o_totalprice").between(50000.0, 100000.0))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count_distinct(col("o_custkey")).as("n_customers"))
  }

  val list: Seq[Q] = Seq(

    // A3/A10 — multi-key groupBy with sum/avg/count over the biggest fact
    // (reference analog: dremio.sql:5-8 agg shape; retail.sql:204-210).
    Q("q01_pricing_summary", (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02 23:59:59").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          // exact-lattice numerators (integer qty / cent discounts) then one
          // IEEE division: bit-identical across engines, no rounding boundary
          (round(sum(col("l_quantity")), 0) / count(lit(1))).as("avg_qty"),
          (round(sum(col("l_discount")), 2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_quantity), 0) / count(*) AS avg_qty,
             round(sum(l_discount), 2) / count(*) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59'
      GROUP BY l_returnflag, l_linestatus""")),

    // A1/A13 — global scalar aggregate, the BASELINE.md cold-scan analog
    // (reference: dremio.sql:2,5-8).
    Q("q02_global_avg", (s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        (round(sum(col("l_quantity")), 0) / count(lit(1))).as("avg_qty"),
        (round(sum(col("l_extendedprice")), 2) / count(lit(1))).as("avg_price"),
        (round(sum(col("l_discount")), 2) / count(lit(1))).as("avg_disc"))
    }, Some("""
      SELECT count(*) AS n,
             round(sum(l_quantity), 0) / count(*) AS avg_qty,
             round(sum(l_extendedprice), 2) / count(*) AS avg_price,
             round(sum(l_discount), 2) / count(*) AS avg_disc
      FROM lineitem""")),

    // A2 — COUNT(DISTINCT) per group (reference: clinicdata.sql:380).
    Q("q03_count_distinct", (s, dir) => {
      t(s, dir, "customer").groupBy(col("c_mktsegment")).agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_cust"),
        (round(sum(col("c_acctbal")), 2) / count(lit(1))).as("avg_bal"))
    }, Some("""
      SELECT c_mktsegment,
             count(DISTINCT c_nationkey) AS n_nations,
             count(*) AS n_cust,
             round(sum(c_acctbal), 2) / count(*) AS avg_bal
      FROM customer GROUP BY c_mktsegment""")),

    // A4/A5/A8 — conditional aggregates (reference: retail.sql:207-210,
    // semantic_example.sql:296-298, supply_chain_example.sql:102-104).
    Q("q04_conditional_agg", (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderpriority")).agg(
        round(sumIf(col("o_orderstatus") === "F", col("o_totalprice")), 2).as("fulfilled_rev"),
        countIf(col("o_orderstatus") === "P").as("n_pending"),
        (countIf(col("o_orderstatus") === "O").cast("double") / count(lit(1))).as("open_rate"))
    }, Some("""
      SELECT o_orderpriority,
             round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS fulfilled_rev,
             count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
             CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS DOUBLE) / count(*) AS open_rate
      FROM orders GROUP BY o_orderpriority""")),

    // A6 — COUNT(*) FILTER (WHERE …) via the SQL surface
    // (reference: clinicdata.sql:326-334). Identical text runs on DuckDB.
    Q.sql("q05_filter_clause", """
      SELECT l_returnflag,
             count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
             count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""),

    // A7 — per-group existence flag (reference: clinicdata.sql:319).
    Q("q06_exists_flag", (s, dir) => {
      t(s, dir, "customer").groupBy(col("c_nationkey")).agg(
        existsFlag(col("c_acctbal") < 0).as("has_negative_bal"),
        count(lit(1)).as("n_cust"))
    }, Some("""
      SELECT c_nationkey,
             max(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS has_negative_bal,
             count(*) AS n_cust
      FROM customer GROUP BY c_nationkey""")),

    // A9 — pivot-style per-type averages with implicit ELSE NULL
    // (reference: manufacturing.sql:208-210), over the events table.
    Q("q07_pivot_avg", (s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          round(avg(when(col("event_type") === "click", col("value"))), 4).as("avg_click"),
          round(avg(when(col("event_type") === "purchase", col("value"))), 4).as("avg_purchase"),
          round(avg(when(col("event_type") === "error", col("value"))), 4).as("avg_error"),
          count(lit(1)).as("n_events"))
    }, Some("""
      SELECT CAST(ts AS DATE) AS day,
             round(avg(CASE WHEN event_type = 'click' THEN value END), 4) AS avg_click,
             round(avg(CASE WHEN event_type = 'purchase' THEN value END), 4) AS avg_purchase,
             round(avg(CASE WHEN event_type = 'error' THEN value END), 4) AS avg_error,
             count(*) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)""")),

    // A11 — HAVING over grouped counts (reference: manufacturing.sql:86-91).
    Q("q08_having", (s, dir) => {
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("tot"))
        .filter(col("n_orders") >= 15)
    }, Some("""
      SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS tot
      FROM orders GROUP BY o_custkey HAVING count(*) >= 15""")),

    // A12 — LISTAGG(DISTINCT …) with deterministic order
    // (reference: media_ai.sql:195). Broadcast join on the tiny dim.
    Q("q09_listagg", (s, dir) => {
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(listaggDistinct(col("n_name"), ", ").as("nations"))
    }, Some("""
      SELECT r_name, string_agg(DISTINCT n_name, ', ' ORDER BY n_name) AS nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""")),

    // A14 — guarded-ratio KPI (reference: insurance_example.sql:123-131).
    Q("q10_ratio_kpi", (s, dir) => {
      t(s, dir, "customer").groupBy(col("c_nationkey")).agg(
        count(lit(1)).as("n_cust"),
        countIf(col("c_acctbal") < 0).as("n_negative"))
        .select(col("c_nationkey"), col("n_cust"),
          guardedRatio(lit(100.0) * col("n_negative"), col("n_cust")).as("pct_negative"))
    }, Some("""
      SELECT c_nationkey, count(*) AS n_cust,
             CASE WHEN count(*) > 0
                  THEN CAST(100.0 AS DOUBLE) * count(CASE WHEN c_acctbal < 0 THEN 1 END) / count(*)
                  END AS pct_negative
      FROM customer GROUP BY c_nationkey""")),

    // J1 — the flagship customer_spend join+agg (reference: readme.md:307-315).
    Q("q11_customer_spend", (s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
    }, Some("""
      SELECT c_custkey, c_name, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_spend
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name""")),

    // J1 chain — 4-way dim chain revenue rollup
    // (reference: semantic_example.sql:265-269 3-way chain).
    Q("q12_region_revenue", (s, dir) => {
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
    }, Some("""
      SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""")),

    // J4 — equi + range (interval) join: lineitems shipped within 90 days of
    // their order date (reference: clinicdata.sql:294-297). The equi key
    // stays in the join condition so Spark hashes on it.
    Q("q13_interval_join", (s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      intervalJoin(li, o, col("l_orderkey") === col("o_orderkey"),
        col("l_shipdate"), col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_within_90d"),
          round(sum(col("l_extendedprice")), 2).as("rev_within_90d"))
    }, Some("""
      SELECT l_returnflag, count(*) AS n_within_90d,
             round(sum(l_extendedprice), 2) AS rev_within_90d
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
      GROUP BY l_returnflag""")),

    // J3 — left outer join keeping unmatched rows, null-probing aggregate
    // (reference: retail.sql:168-170).
    Q("q14_left_join", (s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(big, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_big_orders"),
          countIf(col("o_orderkey").isNull).as("n_unmatched_rows"))
    }, Some("""
      SELECT c_mktsegment,
             count(DISTINCT c_custkey) AS n_cust,
             count(o_orderkey) AS n_big_orders,
             count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_unmatched_rows
      FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        ON c_custkey = o_custkey
      GROUP BY c_mktsegment""")),

    // J6 — anti join (reference FK probe, manufacturing.sql:220-225):
    // customers with no pending order.
    Q("q15_anti_join", (s, dir) => {
      val c = t(s, dir, "customer")
      val p = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      antiJoin(c, p, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""")),

    // Semi join (EXISTS) — customers with at least one very large order.
    Q("q16_semi_join", (s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      semiJoin(c, big, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust_with_big_order"))
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_cust_with_big_order
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      GROUP BY c_mktsegment""")),

    // W1 — keep-latest dedup, the reference's most repeated pattern
    // (clinicdata.sql:145-161): latest order per customer, deterministic
    // tiebreak on orderkey.
    Q("q17_keep_latest", (s, dir) => {
      dedupKeepLatest(
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
        Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
    }, Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) t
      WHERE rn = 1""")),

    // W2 — 7-row trailing rolling revenue over a daily grain
    // (reference: retail.sql:230-240).
    Q("q18_rolling_7d", (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("d"))
        .agg(round(sum(col("o_totalprice")), 2).as("day_rev"))
      rollingSum(daily, col("day_rev"), "rev_7d",
        Seq(col("o_orderpriority")), Seq(col("d")), 6)
        .select(col("o_orderpriority"), col("d"), col("day_rev"),
          round(col("rev_7d"), 2).as("rev_7d"))
    }, Some("""
      WITH daily AS (
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
               round(sum(o_totalprice), 2) AS day_rev
        FROM orders GROUP BY 1, 2)
      SELECT o_orderpriority, d, day_rev,
             round(sum(day_rev) OVER (PARTITION BY o_orderpriority ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
      FROM daily""")),

    // W3/J5 — successive-row pairing via lead() (idiomatic rewrite of the
    // reference's rn self-join, manufacturing.sql:289-317): mean days
    // between consecutive orders, per market segment.
    Q("q19_lead_gap", (s, dir) => {
      val o = t(s, dir, "orders")
      val seq = leadCol(
        o.select(col("o_custkey"), to_date(col("o_orderdate")).as("d"), col("o_orderkey")),
        col("d"), "nd", Seq(col("o_custkey")), Seq(col("d"), col("o_orderkey")))
        .withColumn("gap", datediff(col("nd"), col("d")))
      seq.join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg((sum(col("gap")).cast("double") / count(col("gap"))).as("avg_gap_days"),
          count(col("gap")).as("n_gaps"))
    }, Some("""
      WITH s AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
               lead(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nd
        FROM orders)
      SELECT c_mktsegment,
             CAST(sum(date_diff('day', d, nd)) AS DOUBLE) / count(nd) AS avg_gap_days,
             count(nd) AS n_gaps
      FROM s JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""")),

    // P10 — SELECT DISTINCT (reference: clinicdata.sql:355-360).
    Q("q20_distinct", (s, dir) => {
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    }, Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // O3 — UNION ALL of filtered branches (reference: manufacturing.sql:81-84).
    Q("q21_union_all", (s, dir) => {
      val o = t(s, dir, "orders")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(lit("urgent").as("bucket"), col("o_totalprice"))
      val fulfilled = o.filter(col("o_orderstatus") === "F")
        .select(lit("fulfilled").as("bucket"), col("o_totalprice"))
      urgent.unionAll(fulfilled)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
    }, Some("""
      SELECT bucket, count(*) AS n, round(sum(o_totalprice), 2) AS rev
      FROM (SELECT 'urgent' AS bucket, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'fulfilled' AS bucket, o_totalprice FROM orders WHERE o_orderstatus = 'F') u
      GROUP BY bucket""")),

    // O4 — CTE chain (CTE referencing CTE; reference: retail.sql:248-276),
    // identical SQL text on both engines.
    Q.sql("q22_cte_chain", """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               round(sum(o_totalprice), 2) AS rev, count(*) AS n
        FROM orders GROUP BY 1),
      busy AS (SELECT d, rev, n FROM daily WHERE n >= 5)
      SELECT count(*) AS n_busy_days, round(sum(rev), 2) / count(*) AS avg_rev,
             round(max(rev), 2) AS max_rev
      FROM busy"""),

    // O1 — ORDER BY in a view-style trend (reference: semantics.sql:241).
    Q.sql("q23_monthly_trend", """
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             round(sum(o_totalprice), 2) AS rev, count(*) AS n_orders
      FROM orders GROUP BY 1 ORDER BY 1"""),

    // §2.9 strings — UPPER/TRIM, concat, LIKE, regex, COALESCE, substring
    // (reference: retail.sql:96, logistics_AI.sql:128-134,
    // semantic_example.sql:112-124).
    Q("q24_string_funcs", (s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(trim(col("p_type"))).as("type_u"),
        concat(col("p_brand"), lit("#"), col("p_size").cast("string")).as("brand_size"),
        col("p_type").like("PROMO%").as("is_promo"),
        col("p_name").rlike("green").as("has_green"),
        coalesce(col("p_name"), lit("?")).as("name_nn"),
        substring(col("p_name"), 1, 5).as("name5"))
    }, Some("""
      SELECT p_partkey,
             upper(trim(p_type)) AS type_u,
             p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size,
             p_type LIKE 'PROMO%' AS is_promo,
             regexp_matches(p_name, 'green') AS has_green,
             coalesce(p_name, '?') AS name_nn,
             substring(p_name, 1, 5) AS name5
      FROM part""")),

    // §2.9 dates — TO_DATE, DATE_TRUNC, year/month, DATEDIFF (end-first,
    // day grain), +INTERVAL arithmetic (reference: clinicdata.sql:267-296,
    // insurance_example.sql:71-86, gov_example.sql:77-85).
    Q("q25_date_funcs", (s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate"))).as("days_to_2000"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("date").as("plus30"))
    }, Some("""
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS d,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(year(o_orderdate) AS INTEGER) AS y,
             CAST(month(o_orderdate) AS INTEGER) AS m,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_2000,
             CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30
      FROM orders""")),

    // P5/P7 — BETWEEN on timestamps + IN list (reference:
    // clinicdata.sql:296-297, manufacturing.sql:116).
    Q("q26_between_in", (s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderdate").between(
          lit("1996-01-01 00:00:00").cast("timestamp"),
          lit("1996-12-31 23:59:59").cast("timestamp")))
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
    }, Some("""
      SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS rev
      FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_orderstatus""")),

    // P4 + NULLIF — null production/probing without relying on source nulls.
    Q.sql("q27_null_handling", """
      SELECT count(*) AS n,
             count(nullif(o_orderstatus, 'P')) AS n_not_pending,
             count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS n_null_status
      FROM orders"""),

    // O5 — derived-table subquery feeding an outer aggregate
    // (reference: healthcare_example.sql:121-124).
    Q.sql("q28_subquery", """
      SELECT CAST(sum(cnt) AS DOUBLE) / count(*) AS avg_orders_per_cust,
             max(cnt) AS max_orders
      FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) t"""),

    // P2/P3 — rename projection (semantic layer) + star-expansion join
    // projection `o.*` plus enrichment columns (reference:
    // semantic_example.sql:99-102; retail.sql:162-167).
    Q("q29_star_enrich", (s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(o.col("*"),
          col("c_name").as("customer_name"),
          col("c_mktsegment").as("segment"))
        .filter(col("o_totalprice") > 300000.0)
    }, Some("""
      SELECT o.*, c_name AS customer_name, c_mktsegment AS segment
      FROM orders o JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > 300000""")),

    // J2/J5 — composite-key self-join on computed successor line number
    // (reference: supply_chain_example.sql:88-91 composite keys;
    // manufacturing.sql:289-317 rn self-join form, kept literal here —
    // q19 is the lead() rewrite of the same idea).
    Q("q30_composite_selfjoin", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val b = li.select(col("l_orderkey").as("r_orderkey"),
        col("l_linenumber").as("r_linenumber"), col("l_extendedprice").as("next_price"))
      a.join(b, col("l_orderkey") === col("r_orderkey") &&
          col("r_linenumber") === col("l_linenumber") + 1)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_adjacent_pairs"),
          // sum (not avg): cent-valued inputs make the sum a multiple of
          // 0.01, so 2-decimal rounding never lands on a half-way boundary
          // where engine-internal summation order could flip the result.
          round(sum(col("next_price") - col("l_extendedprice")), 2).as("total_price_step"))
    }, Some("""
      SELECT a.l_orderkey, count(*) AS n_adjacent_pairs,
             round(sum(b.l_extendedprice - a.l_extendedprice), 2) AS total_price_step
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
      GROUP BY a.l_orderkey""")),

    // J7 — join facts against an aggregated CTE (reference:
    // manufacturing.sql:86-91 dup list; insurance_example.sql:132-136).
    Q.sql("q31_join_agg_cte", """
      WITH heavy AS (
        SELECT o_custkey AS h_custkey, count(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING count(*) >= 12)
      SELECT o_orderstatus, count(*) AS n_heavy_cust_orders,
             round(sum(o_totalprice), 2) AS heavy_rev
      FROM orders JOIN heavy ON o_custkey = h_custkey
      GROUP BY o_orderstatus"""),

    // A15 — reconciliation aggregate: recompute a gold rollup from silver and
    // emit mismatching rows; empty result = invariant holds (reference:
    // manufacturing.sql:345-364).
    Q.sql("q32_reconciliation", """
      WITH by_day_prio AS (
        SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority,
               sum(o_totalprice) AS rev FROM orders GROUP BY 1, 2),
      gold AS (SELECT d, round(sum(rev), 2) AS day_rev FROM by_day_prio GROUP BY d),
      silver AS (SELECT CAST(o_orderdate AS DATE) AS d, round(sum(o_totalprice), 2) AS day_rev2
                 FROM orders GROUP BY 1)
      SELECT gold.d, day_rev, day_rev2
      FROM gold JOIN silver ON gold.d = silver.d
      WHERE abs(day_rev - day_rev2) > 0.011"""),

    // Semi-structured: JSON property extraction from the events stream
    // (the reference's "unstructured columns processed by functions" idea,
    // SURVEY.md §1.1, over typed JSON instead of an LLM).
    Q("q33_json_props", (s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).cast("long").as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"),
          countIf(col("k").isNull).as("n_missing"))
    }, Some("""
      SELECT event_type,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
               / count(json_extract_string(props, '$.k')) AS avg_k,
             count(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS n_missing
      FROM events GROUP BY event_type""")),

    // Behavioral funnel over events: first signup → later purchase
    // conversion, built from pivot-style per-type MIN timestamps (A7/A9
    // pattern applied to a funnel; groupBy user shuffles once).
    Q("q34_event_funnel", (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("st"),
          min(when(col("event_type") === "purchase", col("ts"))).as("pt"))
        .agg(
          countIf(col("st").isNotNull).as("n_signed"),
          countIf(col("st").isNotNull && col("pt") > col("st")).as("n_converted"))
    }, Some("""
      WITH f AS (SELECT user_id,
                        min(CASE WHEN event_type = 'signup' THEN ts END) AS st,
                        min(CASE WHEN event_type = 'purchase' THEN ts END) AS pt
                 FROM events GROUP BY user_id)
      SELECT count(CASE WHEN st IS NOT NULL THEN 1 END) AS n_signed,
             count(CASE WHEN st IS NOT NULL AND pt > st THEN 1 END) AS n_converted
      FROM f""")),

    // ROLLUP — beyond the reference's surface (it has no grouping sets),
    // included because Catalyst provides it natively and warehouse users
    // expect subtotal rows.
    Q("q37_rollup", (s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    // CUBE — all grouping-set combinations (companion to q37's ROLLUP).
    Q("q37b_cube", (s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // Percentiles + dispersion — also beyond the reference's surface.
    // Interpolated percentiles over integer-valued quantities sit on an
    // exact lattice (k/4 here), so direct equality holds across engines;
    // stddev is continuous-valued (boundary risk is measure-zero) and
    // rounded on both sides.
    Q("q38_percentiles", (s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
    }, Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS median_qty,
             quantile_cont(l_quantity, 0.25) AS p25_qty,
             round(stddev_samp(l_extendedprice), 4) AS sd_price
      FROM lineitem GROUP BY l_returnflag""")),

    // Full ranking-window suite — beyond the reference (it only uses
    // ROW_NUMBER/LEAD): rank, dense_rank, ntile, lag, first_value over a
    // deterministic total order.
    Q("q39_window_suite", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          first_value(col("o_orderkey")).over(w).as("first_order"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
             CAST(rank() OVER w AS INTEGER) AS rnk,
             CAST(dense_rank() OVER w AS INTEGER) AS drnk,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             lag(o_totalprice, 1) OVER w AS prev_price,
             first_value(o_orderkey) OVER w AS first_order
      FROM orders WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // Array operators (reference: recipes.sql ARRAY[...] + ARRAY_TO_STRING,
    // ai_classify label arrays): build, sort, measure, stringify, probe.
    Q("q35_array_ops", (s, dir) => {
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sort_array(collect_list(col("n_name"))).as("nations_arr"))
        .select(col("r_name"),
          // scalar derivatives only: array-typed outputs hash differently
          // across engines' result serializations
          size(col("nations_arr")).as("n_nations"),
          array_join(col("nations_arr"), "|").as("nations_str"),
          array_contains(col("nations_arr"), "CHINA").as("has_china"),
          element_at(col("nations_arr"), 1).as("first_nation"))
    }, Some("""
      SELECT r_name,
             CAST(len(list_sort(list(n_name))) AS INTEGER) AS n_nations,
             array_to_string(list_sort(list(n_name)), '|') AS nations_str,
             list_contains(list(n_name), 'CHINA') AS has_china,
             list_sort(list(n_name))[1] AS first_nation
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""")),

    // Batch sessionization over events: sessions start where the gap from
    // the previous event exceeds 30 minutes (lag + conditional flag +
    // running sum — the W-series composed); per-user session stats.
    Q("q36_sessions", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          // NTZ-safe gap: timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ
          // alike (an epoch cast is illegal on NTZ). date_trunc first so the
          // count is second-BOUNDARY crossings — ts carries microseconds, and
          // the DuckDB oracle's date_diff('second', ...) counts boundaries,
          // not floor(elapsed).
          when(col("prev_ts").isNull ||
            expr("timestampdiff(SECOND, date_trunc('second', prev_ts), date_trunc('second', ts))") > 1800,
            1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).cast("long").as("n_sessions"),
          (sum(col("n_events")).cast("double") / count(lit(1))).as("avg_events_per_session"),
          max(col("n_events")).as("max_session_len"))
    }, Some("""
      WITH s AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session,
               ts, event_id
        FROM s),
      numbered AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged),
      per_session AS (
        SELECT user_id, session_id, count(*) AS n_events
        FROM numbered GROUP BY user_id, session_id)
      SELECT user_id,
             CAST(max(session_id) AS BIGINT) AS n_sessions,
             CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_events_per_session,
             max(n_events) AS max_session_len
      FROM per_session GROUP BY user_id""")),

    // Reflection acceleration end-to-end (readme.md:320-329, dremio.sql:10-13
    // — the reference's headline feature): register an aggregation
    // materialization at (returnflag, linestatus) grain, then ask a COARSER
    // query incl. AVG (which the mat never stored — it rolls up from
    // sum+count). The optimizer rule must rewrite the raw-table query to the
    // mat scan — enforced by a require() on the physical plan — and the
    // DuckDB oracle checks the rolled-up numbers against the raw table.
    // No round(): l_quantity is integer-valued, so sums are exact in double
    // and avg = exact_sum/count is bit-identical across engines.
    Q("q54_reflection_rollup", (s, dir) => {
      import graft.plans.{MaterializationSubstitution, Materializations}
      // The materialization is a once-per-(session, sf) fixture: reflections
      // refresh out-of-band in the reference too (readme.md:322-329), so the
      // per-invocation cost measured here is the SERVE path — substitution
      // rewrite + materialized scan — not the CTAS build.
      val m = CoreQueries.reflectionFixtures.computeIfAbsent(
        s"${System.identityHashCode(s)}|$dir", _ => {
          val wh = graft.TempDirs.newDir("graft_refl")
          val mats = new Materializations(s, Some(wh))
          mats.register("li_agg_rf_ls", () =>
            t(s, dir, "lineitem")
              .groupBy(col("l_returnflag"), col("l_linestatus"))
              .agg(sum(col("l_quantity")).as("sum_qty"),
                count(col("l_quantity")).as("cnt_qty"),
                min(col("l_quantity")).as("min_qty"),
                max(col("l_quantity")).as("max_qty")))
          mats.refresh("li_agg_rf_ls")
          mats
        })
      MaterializationSubstitution.install(s, m)
      val q = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("avg_qty"),
          sum(col("l_quantity")).as("sum_qty"),
          count(col("l_quantity")).as("cnt_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
      val physical = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      // match the reflections-warehouse marker, not the materialization
      // name: plan strings truncate long scan locations, which can cut the
      // deeper path segment (same rationale as q66's check)
      require(physical.contains("graft_refl"),
        s"reflection rollup did not substitute:\n$physical")
      q
    }, Some("""
      SELECT l_returnflag, avg(l_quantity) AS avg_qty,
             sum(l_quantity) AS sum_qty, count(l_quantity) AS cnt_qty,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag""")),

    // Iceberg metadata-table functions (readme.md:357-369: `SELECT * FROM
    // TABLE(table_snapshot('t'))`): the metadata scan over a plain table
    // synthesizes the single current snapshot from file statistics. The
    // deterministic columns (snapshot id, operation, record count) are
    // oracle-checked — the record count must equal the table's true
    // cardinality, proving the metadata path agrees with the data path
    // without ever scanning data pages for file metrics.
    Q("q59_table_metadata", (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q59_meta_customer")
      graft.sources.MetadataFunctions.tableSnapshot(s, "q59_meta_customer")
        .select(col("snapshot_id"), col("operation"), col("total_records"))
    }, Some("""
      SELECT CAST(0 AS BIGINT) AS snapshot_id, 'APPEND' AS operation,
             count(*) AS total_records FROM customer""")),

    // Scripted acceleration end-to-end (readme.md:322-326's exact DDL shape):
    // a Dremio-style script declares a view and `ALTER DATASET … CREATE
    // REFLECTION … USING RAW`; a later SELECT over the view must be served
    // from the reflection's materialized scan — require()d on the physical
    // plan — and the values must match DuckDB recomputing the view from the
    // raw table. Proves the SQL-surface path (parse → register → refresh →
    // substitute), not just the programmatic Materializations API (q54).
    Q("q66_scripted_reflection", (s, dir) => {
      val runner = CoreQueries.scriptRunnerFixtures.computeIfAbsent(
        s"${System.identityHashCode(s)}|$dir", _ => {
          t(s, dir, "nation").createOrReplaceTempView("q66_nation")
          val r = new graft.pipeline.SqlScriptRunner(s)
          r.run("""
            CREATE OR REPLACE TEMP VIEW q66_region_counts AS
              SELECT n_regionkey, count(*) AS n_nations
              FROM q66_nation GROUP BY n_regionkey;
            ALTER DATASET q66_region_counts
            CREATE REFLECTION q66_region_counts_rf
            USING RAW;
          """)
          r
        })
      val df = runner.run(
        "SELECT n_regionkey, n_nations FROM q66_region_counts").values.head
      val physical = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      // match the reflections-warehouse marker: plan strings truncate long
      // scan locations, which can cut the reflection name itself
      require(physical.contains("graft_reflections"),
        s"scripted reflection did not substitute:\n$physical")
      df
    }, Some("""
      SELECT n_regionkey, count(*) AS n_nations
      FROM nation GROUP BY n_regionkey""")),

    // X2 companion — OPTIMIZE ... ZORDER BY: orders rewritten clustered on
    // the z-curve over (o_orderdate, o_totalprice), then a 2-column range
    // predicate over the clustered copy. The oracle runs the same predicate
    // on the RAW table — equality proves clustering is a pure reorder — and
    // the require() proves the layout actually skips: the predicate's file
    // ranges must exclude some files on BOTH clustering columns (a linear
    // sort can only ever skip on its leading column).
    Q("q68_zorder_skip", (s, dir) => CoreQueries.zorderRead(s, dir), Some("""
      SELECT count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue,
             count(DISTINCT o_custkey) AS n_customers
      FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1994-01-01 00:00:00'
                            AND TIMESTAMP '1994-03-31 00:00:00'
        AND o_totalprice BETWEEN 50000 AND 100000""")),

    // X1 join containment — the star-join reflection case (readme.md:320-389):
    // the query aggregates fact⋈dim, the registered reflection pre-aggregates
    // the FACT alone at join-key grain. The optimizer rule joins the
    // reflection to the dim and re-aggregates (sum of sums, sum of counts) —
    // the 100 TB fact is never rescanned. The require() proves the rewrite
    // fired; the oracle computes the same numbers from the raw tables.
    Q("q69_join_reflection", (s, dir) => {
      import graft.plans.{MaterializationSubstitution, Materializations}
      val m = CoreQueries.joinReflFixtures.computeIfAbsent(
        s"${System.identityHashCode(s)}|$dir", _ => {
          val wh = graft.TempDirs.newDir("graft_reflections_join")
          val mats = new Materializations(s, Some(wh))
          mats.registerAggregate("li_rev_by_order",
            () => t(s, dir, "lineitem"), Seq("l_orderkey"), Seq(
              Materializations.AggSpec("sum", "l_extendedprice", "rev"),
              Materializations.AggSpec("count", "*", "cnt")))
          mats.refresh("li_rev_by_order")
          mats
        })
      MaterializationSubstitution.install(s, m)
      val q = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev_raw"),
          count(lit(1)).as("n_items"))
        .select(col("o_orderpriority"), round(col("rev_raw"), 2).as("rev"),
          col("n_items"))
      val physical = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      require(physical.contains("graft_reflections_join"),
        s"join reflection did not substitute:\n$physical")
      require(!physical.contains("lineitem"),
        s"fact table rescanned despite the join reflection:\n$physical")
      q
    }, Some("""
      SELECT o_orderpriority, round(sum(l_extendedprice), 2) AS rev,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority""")),

    // UNPIVOT (wide → long): three lineitem measures melted to
    // (flag, measure, value) rows with Spark's native Dataset.unpivot —
    // the inverse of q07's pivot shape. At scale unpivot is a map-side
    // row-expansion (no shuffle until the aggregate); the oracle re-melts
    // via the engine-neutral UNION ALL form.
    Q("q77_unpivot", (s, dir) => {
      val melted = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_tax")),
          variableColumnName = "measure",
          valueColumnName = "val")
      melted.groupBy(col("l_returnflag"), col("measure"))
        .agg(round(sum(col("val")), 2).as("total"),
          count(lit(1)).as("n"))
    }, Some("""
      WITH st AS (
        SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      SELECT l_returnflag, measure, round(sum(val), 2) AS total, count(*) AS n
      FROM st GROUP BY l_returnflag, measure""")),

    // Mergeable HLL sketches (Apache DataSketches via Spark's
    // hll_sketch_agg/hll_union_agg): per-source partial sketches merged
    // must estimate ~the same cardinality as one global sketch — the
    // map-side-combine property that makes sketch rollups linear at 100 TB
    // (partials travel, not values). Union is not bit-identical to the
    // global sketch (partials can be in different sparse/dense modes when
    // merged), so the require() bounds merged-vs-global drift at 2%, and
    // the emitted flag asserts BOTH estimates land within ±2% of the true
    // cardinality — an error contract the oracle verifies from the exact
    // count (the estimate itself is sketch-internal, like q49b's recall
    // floor).
    Q("q78_hll_mergeable", (s, dir) => {
      val d = t(s, dir, "documents")
      // lgK=14 (~0.4% standard error) keeps the 2% contract comfortable at
      // any corpus scale; the default lgK=12's ~0.8% would sit too close
      val global = d.agg(
        hll_sketch_estimate(hll_sketch_agg(col("text"), 14)).as("est"),
        countDistinct(col("text")).as("n_exact")).head()
      val merged = d.groupBy(col("source"))
        .agg(hll_sketch_agg(col("text"), 14).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head()
      val (est, exact) = (global.getLong(0), global.getLong(1))
      val estM = merged.getLong(0)
      require(math.abs(estM - est).toDouble / exact <= 0.02,
        s"merged sketch estimate $estM drifted >2% from global $est")
      val withinPct = math.abs(est - exact).toDouble / exact <= 0.02 &&
        math.abs(estM - exact).toDouble / exact <= 0.02
      import s.implicits._
      Seq((exact, withinPct)).toDF("n_exact", "within_2pct")
    }, Some("""
      SELECT count(DISTINCT text) AS n_exact, TRUE AS within_2pct
      FROM documents""")),

    // As-of join (temporal nearest-predecessor): every purchase event
    // enriched with the user's latest click at or before the purchase time
    // — classic attribution / point-in-time-lookup semantics Spark has no
    // native operator for. RelationalOps.asofJoin is the scalable
    // union+window form (ONE shuffle on user_id, no t_r <= t_l theta-join
    // blowup); the oracle is DuckDB's NATIVE ASOF LEFT JOIN, so the two
    // engines' as-of semantics (inclusive match, null when no predecessor)
    // are compared operator-to-operator.
    Q("q73_asof_join", (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.ops.RelationalOps.asofJoin(
        purchases, clicks, keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("event_id", "value"), prefix = "click_",
        tiebreak = Seq("event_id"))
    }, Some("""
      WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'),
      clicks AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.ts, p.value,
             c.ts AS click_ts, c.event_id AS click_event_id,
             c.value AS click_value
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts""")),

    // GROUPING SETS beyond ROLLUP/CUBE (q37/q37b): an explicit, non-nested
    // subtotal lattice — the form BI layers emit when the wanted subtotals
    // are not a prefix chain. grouping_id() disambiguates a real NULL key
    // from a subtotal row. Executes as ONE Expand + hash-agg pass (no
    // re-scan per set) in Spark.
    Q.sql("q88_grouping_sets", """
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
             CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
             count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_linestatus), ())"""),

    // INTERSECT / EXCEPT set operators (distinct semantics) — the two
    // ANSI set ops the O-series (q21 UNION ALL) did not yet cover. Both
    // execute as hash aggregations + joins (no sort), shuffle on the full
    // row — scale shape identical to a groupBy on the compared columns.
    Q.sql("q89_intersect_except", """
      SELECT 'both' AS tag, k FROM
        (SELECT c_nationkey AS k FROM customer
         INTERSECT
         SELECT s_nationkey AS k FROM supplier)
      UNION ALL
      SELECT 'cust_only' AS tag, k FROM
        (SELECT c_nationkey AS k FROM customer
         EXCEPT
         SELECT s_nationkey AS k FROM supplier)"""),

    // Skew-safe EXACT distinct count: a straight count(DISTINCT) on a hot
    // group key funnels every distinct value of that group through one
    // reducer. Bucketing the VALUE space first (hash(value) % 32) makes the
    // buckets partition each group's values, so per-bucket exact distincts
    // SUM to the true total — two shuffles, both on (group, bucket), no
    // single-reducer hotspot at 100 TB. The oracle is the plain
    // count(DISTINCT): the rewrite must be value-identical, not approximate.
    Q("q91_bucketed_distinct", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          pmod(xxhash64(col("l_partkey")), lit(32)).as("__b"))
        .agg(countDistinct(col("l_partkey")).as("d"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("d")).as("n_parts"))
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_returnflag"""))
  )
}
