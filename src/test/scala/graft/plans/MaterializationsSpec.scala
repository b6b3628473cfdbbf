package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializationsSpec extends SparkSpec {

  test("register/refresh/serve/retire reflection lifecycle") {
    val m = new Materializations(spark)
    var buildCount = 0
    m.register("agg_spend", () => {
      buildCount += 1
      sf("orders").groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("spend"))
    })
    // unmaterialized: serves the live definition
    assert(!m.isMaterialized("agg_spend"))
    val live = m.table("agg_spend").count()
    m.refresh("agg_spend")
    assert(m.isMaterialized("agg_spend"))
    val mat = m.table("agg_spend")
    assert(mat.count() === live)
    // served copy does not re-invoke the definition
    val before = buildCount
    m.table("agg_spend").count()
    assert(buildCount === before)
    m.retire("agg_spend")
    intercept[Exception](m.table("agg_spend"))
  }

  test("refresh does not resurrect an unrelated rule uninstalled mid-refresh") {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.catalyst.rules.Rule
    object Dummy extends Rule[LogicalPlan] { def apply(p: LogicalPlan): LogicalPlan = p }
    ExtraOptimizations.mutate(spark)(_ :+ Dummy)
    val m = new Materializations(spark)
    m.register("r", () => {
      // simulates e.g. a skew advisor retiring its rule while a refresh runs
      ExtraOptimizations.mutate(spark)(_.filterNot(_ eq Dummy))
      sf("region").select(col("r_regionkey"))
    })
    m.refresh("r")
    val still = spark.experimental.extraOptimizations.exists(_ eq Dummy)
    assert(!still, "refresh restored a rule another component uninstalled")
  }

  test("warehouse-backed reflection survives as parquet CTAS") {
    val wh = Files.createTempDirectory("refl").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    m.register("daily", () =>
      sf("orders").groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n")))
    m.refresh("daily")
    assert(new java.io.File(s"$wh/daily").exists())
    assert(spark.read.parquet(s"$wh/daily").count() === m.table("daily").count())
  }

  test("optimizer rule substitutes a matching query with the materialized scan") {
    val wh = java.nio.file.Files.createTempDirectory("subst").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    def definition() =
      sf("orders").groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
    m.register("prio_rev", () => definition())
    m.refresh("prio_rev")
    MaterializationSubstitution.install(spark, m)
    try {
      // an INDEPENDENTLY built identical query must hit the materialization:
      // the physical plan becomes a scan of the materialized parquet (its
      // path shows in FileScan) with no aggregation left to do
      val q = definition()
      val physical = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(physical.contains("prio_rev"), s"expected materialized scan in:\n$physical")
      assert(!physical.contains("HashAggregate"), s"aggregate should be gone:\n$physical")
      // and still return correct results
      val direct = definition().collect().map(_.toString).sorted
      assert(q.collect().map(_.toString).sorted === direct)
      // a different query is untouched
      val other = sf("orders").groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val otherPlan = other.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(!otherPlan.contains("prio_rev"))
      assert(otherPlan.contains("HashAggregate"))
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("self-join over a materialized definition: both legs substitute with unique ids") {
    val wh = java.nio.file.Files.createTempDirectory("substsj").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    def definition() =
      sf("orders").groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
    m.register("prio_rev_sj", () => definition())
    m.refresh("prio_rev_sj")
    MaterializationSubstitution.install(spark, m)
    try {
      // two references to the SAME definition in one query — the ADVICE
      // failure mode was both legs sharing one matPlan's ExprIds
      val a = definition().select(col("o_orderpriority").as("p"), col("rev"))
      val b = definition().select(col("o_orderpriority").as("p"), col("n"))
      val j = a.join(b, "p")
      val expected = {
        spark.experimental.extraOptimizations = Seq.empty
        val d1 = definition().select(col("o_orderpriority").as("p"), col("rev"))
        val d2 = definition().select(col("o_orderpriority").as("p"), col("n"))
        val r = d1.join(d2, "p").collect().map(_.toString).sorted
        MaterializationSubstitution.install(spark, m)
        r
      }
      val physical = j.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan
      val planStr = physical.toString
      assert(planStr.contains("prio_rev_sj"), s"expected materialized scan:\n$planStr")
      assert(!planStr.contains("orders.parquet"),
        s"raw table should not be scanned on either leg:\n$planStr")
      // unique-ExprId invariant: no attribute id appears on both join legs
      // (AQE wraps the plan; collect from the inner plan)
      val root = physical match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      val scans = root.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s.output.map(_.exprId)
      }
      assert(scans.length === 2, s"expected both legs served from the mat:\n$planStr")
      assert(scans(0).toSet.intersect(scans(1).toSet).isEmpty,
        s"join legs share attribute ids: ${scans(0)} vs ${scans(1)}")
      assert(j.collect().map(_.toString).sorted === expected)
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("coarser aggregates roll up from an aggregation reflection (sum/count/min/max/avg)") {
    val wh = java.nio.file.Files.createTempDirectory("rollup").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    val li = sf("lineitem")
    // aggregation reflection at (returnflag, linestatus) grain with the
    // classic measure set: sum+count (which also serves AVG), min, max
    m.register("li_cube", () =>
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(col("l_quantity")).as("cnt_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty")))
    m.refresh("li_cube")
    MaterializationSubstitution.install(spark, m)
    try {
      // COARSER grain (returnflag only) + AVG, which the mat never stored
      def query = li.groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("avg_qty"),
          sum(col("l_quantity")).as("sum_qty"),
          count(col("l_quantity")).as("cnt_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
      val physical = query.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(physical.contains("li_cube"), s"rollup not served from mat:\n$physical")
      assert(!physical.contains("lineitem.parquet"), s"raw scan still present:\n$physical")
      // results identical to the raw aggregation (computed with the rule off)
      spark.experimental.extraOptimizations = Seq.empty
      val raw = query.orderBy("l_returnflag").collect().map(_.toString)
      MaterializationSubstitution.install(spark, m)
      val rolled = query.orderBy("l_returnflag").collect().map(_.toString)
      assert(rolled === raw)
      // an aggregate the mat cannot serve (different measure column) is untouched
      val miss = li.groupBy(col("l_returnflag")).agg(sum(col("l_extendedprice")).as("s"))
      val planMiss = miss.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(!planMiss.contains("li_cube"))
      // DISTINCT aggregates never roll up
      val dist = li.groupBy(col("l_returnflag")).agg(countDistinct(col("l_quantity")).as("d"))
      val planDist = dist.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(!planDist.contains("li_cube"))
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("refresh under an installed rule does not poison the fingerprint (re-invocation)") {
    // Round-2 headline defect: refresh() computed the definition's
    // optimizedPlan while a previously installed MaterializationSubstitution
    // was active, so the fingerprint stored a Project-over-old-parquet and
    // later raw-table queries never matched. This replays q54's flow twice in
    // one session, plus a second registered mat, asserting substitution still
    // fires every time.
    val wh = java.nio.file.Files.createTempDirectory("repoison").toFile.getAbsolutePath
    val li = sf("lineitem")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
    try {
      (1 to 2).foreach { round =>
        val m = new Materializations(spark, Some(wh))
        m.register("li_agg_rf_ls", () =>
          li.groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum(col("l_quantity")).as("sum_qty"),
              count(col("l_quantity")).as("cnt_qty")))
        m.refresh("li_agg_rf_ls") // round 2: rule from round 1 is installed HERE
        MaterializationSubstitution.install(spark, m)
        val q = li.groupBy(col("l_returnflag"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        assert(planOf(q).contains("li_agg_rf_ls"),
          s"round $round: rollup not substituted:\n${planOf(q)}")
      }
      // refreshing one entry while ANOTHER entry's rule is live must not
      // poison either fingerprint. Since install() preserves rules of OTHER
      // registries (a session hosts several — q54's fixture + script
      // runners), drop the loop's registries first so this section pins
      // WHICH mat serves each query, not just that one does.
      spark.experimental.extraOptimizations = Seq.empty
      val m2 = new Materializations(spark, Some(wh))
      m2.register("ord_prio", () =>
        sf("orders").groupBy(col("o_orderpriority"))
          .agg(sum(col("o_totalprice")).as("rev"),
            count(col("o_totalprice")).as("cnt")))
      m2.register("li_rf", () =>
        li.groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("s"), count(col("l_quantity")).as("c")))
      m2.refresh("ord_prio")
      MaterializationSubstitution.install(spark, m2)
      m2.refresh("li_rf") // refreshed with ord_prio's rule installed
      MaterializationSubstitution.install(spark, m2)
      val q1 = sf("orders").groupBy(col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("a"))
      val q2 = li.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
      assert(planOf(q1).contains("ord_prio"), s"mat1 lost:\n${planOf(q1)}")
      assert(planOf(q2).contains("li_rf"), s"mat2 lost:\n${planOf(q2)}")
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("queries built ON TOP of a materialized definition also hit the scan (containment)") {
    val wh = java.nio.file.Files.createTempDirectory("subst2").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    def definition() =
      sf("orders").groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
    m.register("prio_rev2", () => definition())
    m.refresh("prio_rev2")
    MaterializationSubstitution.install(spark, m)
    try {
      // transformUp substitutes the inner matching subtree, so a filter and
      // a further aggregate OVER the definition reuse the materialization
      val filtered = definition().filter(col("rev") > 0)
      val planF = filtered.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(planF.contains("prio_rev2"), s"filter-over-def not substituted:\n$planF")
      // An aggregate over the definition column-prunes the inner subtree;
      // OUTPUT-SUBSET matching serves the pruned columns from the
      // materialization by position.
      val reagg = definition().agg(sum(col("rev")).as("total"))
      val planA = reagg.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(planA.contains("prio_rev2"), s"agg-over-def not substituted:\n$planA")
      assert(reagg.head.getDouble(0) ===
        definition().agg(sum(col("rev"))).head.getDouble(0))
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("aggregate over a join rewrites onto the agg reflection joined to the dim") {
    val wh = Files.createTempDirectory("graft_jrefl").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    m.register("li_by_order", () =>
      sf("lineitem").groupBy(col("l_orderkey")).agg(
        sum(col("l_extendedprice")).as("rev"),
        count(lit(1)).as("cnt"),
        count(col("l_extendedprice")).as("cnt_price"),
        min(col("l_discount")).as("min_disc"),
        max(col("l_discount")).as("max_disc")))
    m.refresh("li_by_order")
    val query = () => sf("lineitem")
      .join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")).as("rev"),
        count(lit(1)).as("n_items"),
        avg(col("l_extendedprice")).as("avg_rev"),
        min(col("l_discount")).as("min_disc"))
    val expected = query().collect()
      .map(r => r.getString(0) -> (math.round(r.getDouble(1) * 100), r.getLong(2),
        math.round(r.getDouble(3) * 100), r.getDouble(4))).toMap
    try {
      MaterializationSubstitution.install(spark, m)
      val accel = query()
      val plan = accel.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(plan.contains("graft_jrefl"),
        s"expected the reflection scan in the join:\n$plan")
      assert(!plan.contains("lineitem"),
        s"fact table must not rescan after the join rewrite:\n$plan")
      val got = accel.collect()
        .map(r => r.getString(0) -> (math.round(r.getDouble(1) * 100), r.getLong(2),
          math.round(r.getDouble(3) * 100), r.getDouble(4))).toMap
      assert(got === expected)

      // outer joins must NOT rewrite (unmatched fact groups would collapse)
      val outer = sf("lineitem")
        .join(sf("orders"), col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val outerPlan = outer.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(outerPlan.contains("lineitem"), s"left join must stay raw:\n$outerPlan")

      // FACT passthrough (r5 ADVICE high defect): grouping by AND selecting a
      // fact column must remap it onto the reflection instance's fresh ids —
      // the stale-ExprId bug made this crash at attribute binding.
      val factPass = sf("lineitem")
        .join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val fpPlan = factPass.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(fpPlan.contains("graft_jrefl"),
        s"fact-passthrough grouping should still serve from the reflection:\n$fpPlan")
      val fpGot = factPass.collect()
        .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
      val fpExpected = {
        spark.experimental.extraOptimizations = Seq.empty
        val r = sf("lineitem")
          .join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice")).as("rev"))
          .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
        MaterializationSubstitution.install(spark, m)
        r
      }
      assert(fpGot === fpExpected)

      // aggregates over DIM columns must not rewrite either
      val dimAgg = sf("lineitem")
        .join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("dim_sum"))
      val dimPlan = dimAgg.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(dimPlan.contains("lineitem"), s"dim-measure agg must stay raw:\n$dimPlan")
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("join rewrite tries every matching reflection, not just the first") {
    val wh = Files.createTempDirectory("graft_jrefl2").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    // first candidate matches the fact structurally but lacks the measure;
    // the second can serve — collectFirst would have stopped at the first
    m.register("li_min_only", () =>
      sf("lineitem").groupBy(col("l_orderkey"))
        .agg(min(col("l_discount")).as("min_disc")))
    m.register("li_rev", () =>
      sf("lineitem").groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("cnt")))
    m.refresh("li_min_only")
    m.refresh("li_rev")
    try {
      MaterializationSubstitution.install(spark, m)
      val q = sf("lineitem")
        .join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val plan = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(plan.contains("li_rev"), s"second reflection should serve:\n$plan")
      assert(!plan.contains("lineitem.parquet"), s"fact must not rescan:\n$plan")
      val got = q.collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
      spark.experimental.extraOptimizations = Seq.empty
      val raw = sf("lineitem")
        .join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev"))
        .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
      assert(got === raw)
    } finally {
      spark.experimental.extraOptimizations = Seq.empty
    }
  }

  test("incremental refresh merges an append-only delta without rescanning the base") {
    for (wh <- Seq(None, Some(Files.createTempDirectory("refl_inc").toFile.getAbsolutePath))) {
      val m = new Materializations(spark, wh)
      val all = sf("orders")
      val cut = lit("1998-01-01").cast("timestamp")
      val oldRows = all.filter(col("o_orderdate") < cut)
      val delta = all.filter(col("o_orderdate") >= cut)
      assert(oldRows.count() > 0 && delta.count() > 0)

      // base() tracks the CURRENT state of the (append-only) table
      var base = oldRows
      m.registerAggregate("spend_by_cust", () => base, Seq("o_custkey"), Seq(
        Materializations.AggSpec("sum", "o_totalprice", "spend"),
        Materializations.AggSpec("count", "*", "n_orders"),
        Materializations.AggSpec("min", "o_totalprice", "min_price"),
        Materializations.AggSpec("max", "o_totalprice", "max_price")))
      m.refresh("spend_by_cust")

      base = all // the append happened
      m.refreshIncremental("spend_by_cust", delta)

      val expected = all.groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("spend"), count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"), max(col("o_totalprice")).as("max_price"))
        .collect().map(r => r.getLong(0) ->
          (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      val got = m.table("spend_by_cust")
        .collect().map(r => r.getLong(0) ->
          (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(got === expected, s"incremental merge diverged (warehouse=$wh)")

      // the merged copy still substitutes: fingerprint was re-derived
      try {
        MaterializationSubstitution.install(spark, m)
        val q = graft.Tables(spark, graft.SparkSpec.sfDir, "orders")
          .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("spend"))
        val plan = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.executedPlan.toString
        // partial-agg path: the 2-measure query serves from the 4-measure mat
        // (in-memory tier shows as an InMemory scan, warehouse as the path)
        val marker = if (wh.isEmpty) "InMemory" else "spend_by_cust"
        assert(plan.contains(marker),
          s"expected substituted scan after incremental refresh (marker=$marker):\n$plan")
      } finally {
        spark.experimental.extraOptimizations = Seq.empty
      }
      m.retire("spend_by_cust")
    }
  }

  test("agg-over-join reflection refreshes incrementally: delta fact ⋈ static dim only") {
    for (wh <- Seq(None, Some(Files.createTempDirectory("refl_incj").toFile.getAbsolutePath))) {
      val m = new Materializations(spark, wh)
      val all = sf("lineitem")
      val cut = all.stat.approxQuantile("l_orderkey", Array(0.5), 0.01).head
      val oldRows = all.filter(col("l_orderkey") < cut)
      val delta = all.filter(col("l_orderkey") >= cut)
      assert(oldRows.count() > 0 && delta.count() > 0)

      var factCalls = 0
      var base = oldRows
      m.registerAggregateJoin("rev_by_prio",
        fact = () => { factCalls += 1; base },
        dim = () => sf("orders"),
        joinKeys = Seq("l_orderkey" -> "o_orderkey"),
        groupCols = Seq("o_orderpriority"),
        aggs = Seq(
          Materializations.AggSpec("sum", "l_extendedprice", "rev"),
          Materializations.AggSpec("count", "*", "n_items"),
          Materializations.AggSpec("max", "l_extendedprice", "max_price")))
      m.refresh("rev_by_prio")
      val callsAfterFull = factCalls

      base = all // the fact append happened
      m.refreshIncremental("rev_by_prio", delta)
      // the incremental path must not rescan the base fact: define()/fact()
      // is only re-invoked for FINGERPRINTING (plan analysis, no execution) —
      // so allow the fingerprint call but prove the merge used the delta by
      // value equality below plus the no-extra-scan contract on the counter
      assert(factCalls <= callsAfterFull + 1,
        s"incremental refresh re-invoked the fact ${factCalls - callsAfterFull}x")

      val expected = all.join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n_items"),
          max(col("l_extendedprice")).as("max_price"))
        .collect().map(r => r.getString(0) ->
          (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3))).toMap
      val got = m.table("rev_by_prio")
        .collect().map(r => r.getString(0) ->
          (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3))).toMap
      assert(got === expected, s"incremental join merge diverged (warehouse=$wh)")

      // the merged copy still substitutes whole-subtree queries
      try {
        MaterializationSubstitution.install(spark, m)
        val q = sf("lineitem").join(sf("orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n_items"),
            max(col("l_extendedprice")).as("max_price"))
        val plan = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.executedPlan.toString
        val marker = if (wh.isEmpty) "InMemory" else "rev_by_prio"
        assert(plan.contains(marker),
          s"expected substituted scan after incremental join refresh:\n$plan")
      } finally {
        spark.experimental.extraOptimizations = Seq.empty
      }
      m.retire("rev_by_prio")
    }
  }

  test("incremental refresh handles group keys that first appear in the delta") {
    import spark.implicits._
    val m = new Materializations(spark)
    var base = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    m.registerAggregate("kv", () => base, Seq("k"),
      Seq(Materializations.AggSpec("sum", "v", "s"),
        Materializations.AggSpec("count", "*", "n")))
    m.refresh("kv")
    val delta = Seq(("a", 4.0), ("b", 10.0)).toDF("k", "v")
    base = base.unionByName(delta)
    m.refreshIncremental("kv", delta)
    val got = m.table("kv").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got === Map("a" -> (7.0, 3L), "b" -> (10.0, 1L)))
    // non-mergeable measures are rejected at registration
    intercept[IllegalArgumentException] {
      m.registerAggregate("bad", () => base, Seq("k"),
        Seq(Materializations.AggSpec("avg", "v", "a")))
    }
    m.retire("kv")
  }
}
