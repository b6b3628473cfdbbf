package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Autonomous reflections (readme.md:381-389): monitor → create → serve →
  * retire, driven only by the observed workload. */
class WorkloadAdvisorSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  test("repeated aggregate shape is auto-materialized and then served from the scan") {
    val saved = spark.experimental.extraOptimizations
    try {
      val wh = java.nio.file.Files.createTempDirectory("auto_rf").toFile.getAbsolutePath
      val mats = new Materializations(spark, Some(wh))
      val advisor = new WorkloadAdvisor(spark, mats)
      val li = sf("lineitem")
      def rollup() = li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))

      // below threshold: nothing recommended yet
      advisor.observe(rollup()); advisor.observe(rollup())
      assert(advisor.recommendations(minCount = 3).isEmpty)
      assert(advisor.autoMaterialize(minCount = 3).isEmpty)

      // third sighting crosses the threshold
      advisor.observe(rollup())
      assert(advisor.recommendations(minCount = 3).map(_._2) === Seq(3L))
      val created = advisor.autoMaterialize(minCount = 3)
      assert(created.length === 1 && created.head.startsWith("auto_rf_"))
      assert(mats.isMaterialized(created.head))

      // the next identical query is served from the auto-reflection...
      val served = rollup()
      assert(planOf(served).contains("auto_rf"), s"not served:\n${planOf(served)}")
      assert(!planOf(served).contains("lineitem.parquet"))
      // ...with identical values (compare against the raw plan, rule stripped)
      val expect = {
        val s2 = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations = saved
        try rollup().collect().map(_.toString).sorted
        finally spark.experimental.extraOptimizations = s2
      }
      assert(served.collect().map(_.toString).sorted === expect)
      // a shape seen once is never materialized
      advisor.observe(li.groupBy(col("l_linestatus")).agg(max(col("l_quantity")).as("m")))
      assert(advisor.autoMaterialize(minCount = 3).isEmpty)

      // retire: many observations without the shape re-appearing
      (1 to 10).foreach(_ => advisor.observe(
        li.groupBy(col("l_linestatus")).agg(max(col("l_quantity")).as("m"))))
      val retired = advisor.retireStale(maxIdleObservations = 5)
      assert(retired === created)
      assert(!mats.isMaterialized(created.head))
    } finally spark.experimental.extraOptimizations = saved
  }

  test("skewed join is observed, diagnosed, and re-planned salted") {
    val mats = new Materializations(spark,
      Some(graft.TempDirs.newDir("advisor_skew")))
    val advisor = new WorkloadAdvisor(spark, mats)

    // 90% of the fact side hits one key — the straggler-task regime the
    // advisor exists to catch (the salted plan spreads it over `buckets`
    // reducers; reference behavior class: autonomous monitoring,
    // readme.md:381-389, applied to skew instead of reflections).
    val left = spark.range(0, 10000).select(
      when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 997 + 1000).as("k"),
      col("id").as("v"))
    val right = spark.range(0, 2000).select(
      col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
    val joined = left.join(right, Seq("k"))

    advisor.observe(joined)
    val jf = advisor.skewFindings(hotShare = 0.2).filter(_.kind == "join-salt")
    assert(jf.length === 1)
    assert(jf.head.key === "k" && jf.head.hotKey === "7")
    assert(jf.head.hotShare > 0.85 && jf.head.hotShare < 0.95)
    assert(jf.head.buckets >= 2)

    // ACT: identical rows...
    val salted = advisor.saltedRewrite(jf.head)
    assert(salted.columns.toSeq === joined.columns.toSeq)
    assert(salted.collect().map(_.toString).sorted ===
      joined.collect().map(_.toString).sorted)

    // ...and the hot key no longer serializes through one reducer. Measured
    // with AQE + broadcast off so both plans shuffle on their join keys, at a
    // production-like reducer count (at the suite's 4 shuffle partitions the
    // 8 salt values of ONE key birthday-collide into the same 4 reducers,
    // which measures hash luck, not the spread).
    val savedConf = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
        val counts = df.groupBy(spark_partition_id()).count()
          .collect().map(_.getLong(1))
        counts.max.toDouble / counts.sum
      }
      val naive = maxShare(joined)
      val spread = maxShare(advisor.saltedRewrite(jf.head))
      assert(naive > 0.5, s"fixture not skewed enough: $naive")
      assert(spread < naive / 2, s"salting did not spread: $spread vs $naive")
    } finally savedConf.foreach { case (k, v) => spark.conf.set(k, v) }

    // a rank-style window over the same hot key is diagnosed for the argmax
    // rewrite (recommendation: the q91 max(struct) pattern)
    import org.apache.spark.sql.expressions.Window
    advisor.observe(left
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc)))
      .filter(col("rn") === 1))
    val wf = advisor.skewFindings(hotShare = 0.2).filter(_.kind == "window-argmax")
    assert(wf.exists(f => f.key == "k" && f.hotKey == "7" && f.hotShare > 0.85))
  }

  test("second occurrence of a confirmed hot-key join is served salted automatically") {
    val saved = spark.experimental.extraOptimizations
    // AQE skew handling off: salting is the only weapon, so the serve
    // policy confirms the plain-join finding (the policy itself is covered
    // by the dedicated serve-policy test below)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      val advisor = new WorkloadAdvisor(spark,
        new Materializations(spark, Some(graft.TempDirs.newDir("advisor_auto"))))
      val left = spark.range(0, 10000).select(
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 997 + 1000).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 2000).select(
        col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
      def naive() = left.join(right, Seq("k"))

      // first occurrence: observed only — nothing served yet
      advisor.observe(naive())
      assert(!planOf(naive()).contains("__graft_salt"))

      // diagnose + confirm: the monitor→act loop closes here (reflection
      // contract, readme.md:381-389 — the autonomous tier acts)
      val confirmed = advisor.autoSalt(hotShare = 0.2)
      assert(confirmed.length === 1 && confirmed.head.hotKey === "7")

      // SECOND occurrence: the caller writes the naive join, the optimizer
      // serves the salted plan
      val served = naive()
      assert(planOf(served).contains("__graft_salt"),
        s"second occurrence not served salted:\n${planOf(served)}")

      // identical rows to the un-served plan
      val expect = {
        val s2 = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations = saved
        try naive().collect().map(_.toString).sorted
        finally spark.experimental.extraOptimizations = s2
      }
      assert(served.collect().map(_.toString).sorted === expect)

      // idempotent re-install keeps exactly one rule for this advisor
      advisor.autoSalt(hotShare = 0.2)
      assert(spark.experimental.extraOptimizations.count {
        case SkewSaltSubstitution(a) => a eq advisor
        case _ => false
      } === 1)

      // an ACTIVELY-SERVED join never retires: serving touches the shape
      // even though the salted plan is hidden from the join monitor
      (1 to 6).foreach { _ =>
        advisor.observe(naive())
        assert(planOf(naive()).contains("__graft_salt"))
      }
      assert(advisor.retireSalts(maxIdleObservations = 5).isEmpty)

      // an IDLE salt retires and the rule uninstalls with it (the skew
      // mirror of reflection retirement, readme.md:381-389)
      val unrelated = spark.range(0, 100).select(col("id").as("x"))
      (1 to 10).foreach(_ => advisor.observe(unrelated))
      val retired = advisor.retireSalts(maxIdleObservations = 5)
      assert(retired.length === 1)
      assert(!planOf(naive()).contains("__graft_salt"),
        "retired salt still being served")
      assert(!spark.experimental.extraOptimizations.exists {
        case SkewSaltSubstitution(a) => a eq advisor
        case _ => false
      })
    } finally {
      spark.experimental.extraOptimizations = saved
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }
  }

  test("hot-key interval join (multi-conjunct) is diagnosed and salted row-identically") {
    val advisor = new WorkloadAdvisor(spark,
      new Materializations(spark, Some(graft.TempDirs.newDir("advisor_ivl"))))

    // J4 shape (clinicdata.sql:294-297 class): equi key PLUS range bounds —
    // the reference's only superlinear risk. Salting needs only the equi-key
    // spread; the bounds re-apply as the join's post-match filter.
    val facts = spark.range(0, 20000).select(
      when(col("id") % 10 < 9, lit(5L)).otherwise(col("id") % 40 + 1).as("k"),
      (col("id") % 100).as("v"))
    val dims = spark.range(0, 50).select(
      col("id").as("k2"), (col("id") * 2).as("lo"), (col("id") * 2 + 60).as("hi"))
    def naive() = facts.join(dims,
      facts("k") === dims("k2") && facts("v") >= dims("lo") && facts("v") <= dims("hi"))

    advisor.observe(naive())
    val jf = advisor.skewFindings(hotShare = 0.2).filter(_.kind == "join-salt")
    assert(jf.length === 1, s"interval join not diagnosed: $jf")
    assert(jf.head.hotKey === "5" && jf.head.hotShare > 0.85)

    val salted = advisor.saltedRewrite(jf.head)
    // using-join shape: the duplicate right key column is dropped
    assert(salted.columns.toSeq === Seq("k", "v", "lo", "hi"))
    assert(salted.collect().map(_.toString).sorted ===
      naive().select(col("k"), col("v"), col("lo"), col("hi"))
        .collect().map(_.toString).sorted)
  }

  test("right-side hot key is diagnosed and served salted with the roles swapped") {
    val saved = spark.experimental.extraOptimizations
    try {
      val advisor = new WorkloadAdvisor(spark,
        new Materializations(spark, Some(graft.TempDirs.newDir("advisor_rhot"))))
      // the MIRROR of the left-hot fixture (VERDICT r9 #1: join order is
      // author-chosen — a hot key on the right is just as real): dim on the
      // LEFT, 90%-hot fact on the RIGHT
      val dim = spark.range(0, 2000).select(
        col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
      val fact = spark.range(0, 10000).select(
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 997 + 1000).as("k"),
        col("id").as("v"))
      def naive() = dim.join(fact, Seq("k"))

      advisor.observe(naive())
      val jf = advisor.skewFindings(hotShare = 0.2).filter(_.kind == "join-salt")
      assert(jf.length === 1, s"right-hot join not diagnosed: $jf")
      assert(jf.head.side === "right", s"hot side misattributed: ${jf.head}")
      assert(jf.head.hotKey === "7" && jf.head.hotShare > 0.85)

      // ACT: identical rows with the salt/replicate roles swapped
      val salted = advisor.saltedRewrite(jf.head)
      assert(salted.collect().map(_.toString).sorted ===
        naive().select(col("k"), col("name"), col("v"))
          .collect().map(_.toString).sorted)

      // the hot key no longer serializes through one reducer (same
      // measurement regime as the left-hot case: AQE + broadcast off,
      // production-like reducer count)
      val savedConf = Seq("spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold", "spark.sql.shuffle.partitions")
        .map(k => k -> spark.conf.get(k))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      try {
        def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
          val counts = df.groupBy(spark_partition_id()).count()
            .collect().map(_.getLong(1))
          counts.max.toDouble / counts.sum
        }
        val naiveShare = maxShare(naive())
        val spreadShare = maxShare(advisor.saltedRewrite(jf.head))
        assert(naiveShare > 0.5, s"fixture not skewed enough: $naiveShare")
        assert(spreadShare < naiveShare / 2,
          s"right-side salting did not spread: $spreadShare vs $naiveShare")
      } finally savedConf.foreach { case (k, v) => spark.conf.set(k, v) }

      // SERVE: confirmed right-hot fingerprint → second occurrence salted
      // (AQE skew handling off for the serve step: policy covered below)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try {
        val confirmed = advisor.autoSalt(hotShare = 0.2)
        assert(confirmed.exists(_.side == "right"), s"not confirmed: $confirmed")
        val served = naive()
        assert(planOf(served).contains("__graft_salt"),
          s"right-hot second occurrence not served:\n${planOf(served)}")
        val expect = {
          val s2 = spark.experimental.extraOptimizations
          spark.experimental.extraOptimizations = saved
          try naive().collect().map(_.toString).sorted
          finally spark.experimental.extraOptimizations = s2
        }
        assert(served.collect().map(_.toString).sorted === expect)
      } finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("left-outer join with a hot RIGHT key has no legal salted form and is not diagnosed") {
    val advisor = new WorkloadAdvisor(spark,
      new Materializations(spark, Some(graft.TempDirs.newDir("advisor_lo"))))
    val dim = spark.range(0, 2000).select(
      col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
    val fact = spark.range(0, 10000).select(
      when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 997 + 1000).as("k"),
      col("id").as("v"))
    // preserved LEFT + replicated-left illegality: salting the right would
    // replicate the null-preserved side — the advisor must stay silent
    // rather than serve a wrong plan
    advisor.observe(dim.join(fact, Seq("k"), "left_outer"))
    val jf = advisor.skewFindings(hotShare = 0.2).filter(_.kind == "join-salt")
    assert(jf.isEmpty, s"illegal right-salt diagnosed anyway: $jf")
  }

  test("serve policy defers AQE-splittable shapes and serves distribution-reuse shapes") {
    val saved = spark.experimental.extraOptimizations
    try {
      val advisor = new WorkloadAdvisor(spark,
        new Materializations(spark, Some(graft.TempDirs.newDir("advisor_pol"))))
      val left = spark.range(0, 10000).select(
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 997 + 1000).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 2000).select(
        col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
      def plain() = left.join(right, Seq("k"))
      // the same join feeding a groupBy ON THE JOIN KEY — the shape where
      // AQE declines the skew split (it would break the co-partitioning
      // the aggregate needs) and the salt is the only effective weapon
      def reusing() = plain().groupBy("k")
        .agg(count(lit(1)).as("n"), max(col("name")).as("nm"))

      // plain shape with AQE skew handling ON (suite default): even a
      // DOMINANT 90% share defers — SKEWBENCH_r10 measured AQE 2.10s vs
      // salted 5.95s at the 90% share when the distribution is free
      assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
      advisor.observe(plain())
      val c1 = advisor.autoSalt(hotShare = 0.2)
      assert(c1.isEmpty, s"AQE-splittable shape served anyway: $c1")
      assert(advisor.deferredToAqe.exists(f => f.hotKey == "7" && f.hotShare > 0.85))
      assert(!planOf(plain()).contains("__graft_salt"))

      // observing the distribution-reusing consumer flips the policy: the
      // same join fingerprint is now served salted (SKEWBENCH_r10: salted
      // 5.10s vs AQE 9.97s ≈ naive 9.32s at the 90% share under reuse)
      advisor.observe(reusing())
      val c2 = advisor.autoSalt(hotShare = 0.2)
      assert(c2.length === 1 && c2.head.hotKey === "7", s"reuse shape not served: $c2")
      // the PLAIN fingerprint stays deferred (column pruning under the
      // aggregate makes the reused join a distinct optimized shape, so each
      // occurrence is arbitrated by its own context — exactly right: the
      // plain join remains AQE's to split), while the served fingerprint
      // left the deferred set
      assert(advisor.deferredToAqe.forall(f => !c2.exists(_.fingerprint == f.fingerprint)))
      assert(!planOf(plain()).contains("__graft_salt"),
        "plain AQE-splittable occurrence got salted by the reuse confirmation")
      val served = reusing()
      assert(planOf(served).contains("__graft_salt"),
        s"reuse shape not served salted:\n${planOf(served)}")
      // row-identical through the downstream aggregate
      val expect = {
        val s2 = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations = saved
        try reusing().collect().map(_.toString).sorted
        finally spark.experimental.extraOptimizations = s2
      }
      assert(served.collect().map(_.toString).sorted === expect)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("scripted SQL surface feeds the monitor; a confirmed scripted hot join is served salted") {
    val saved = spark.experimental.extraOptimizations
    try {
      val advisor = new WorkloadAdvisor(spark,
        new Materializations(spark, Some(graft.TempDirs.newDir("advisor_sql"))))
      val runner = new graft.pipeline.SqlScriptRunner(spark, advisor = Some(advisor))
      spark.range(0, 10000).select(
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 997 + 1000).as("k"),
        col("id").as("v")).createOrReplaceTempView("facts_sql")
      spark.range(0, 2000).select(
        col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
        .createOrReplaceTempView("dims_sql")
      // GROUP BY on the join key: a distribution-reuse shape, so the serve
      // policy confirms it even with AQE skew handling on (the scripted
      // path exercises the same reuse detection as the API path)
      val script =
        "SELECT f.k, count(*) AS n, max(d.name) AS nm " +
          "FROM facts_sql f JOIN dims_sql d ON f.k = d.k GROUP BY f.k;"

      runner.run(script) // observed through the runner, not the API path
      val confirmed = advisor.autoSalt(hotShare = 0.2)
      assert(confirmed.exists(_.hotKey == "7"), s"scripted join not confirmed: $confirmed")

      // identical SQL re-run through the runner is served salted — the
      // fingerprint survives fresh exprIds via plan canonicalization
      val served = runner.run(script).values.head
      assert(planOf(served).contains("__graft_salt"),
        s"scripted second occurrence not served salted:\n${planOf(served)}")
      val expect = {
        val s2 = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations = saved
        try spark.sql(script.stripSuffix(";")).collect().map(_.toString).sorted
        finally spark.experimental.extraOptimizations = s2
      }
      assert(served.collect().map(_.toString).sorted === expect)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("pathological store observed N times → layout finding → healed on the " +
      "maintenance tick with no caller involvement") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val advisor = new WorkloadAdvisor(spark,
      new Materializations(spark, Some(graft.TempDirs.newDir("advisor_maint"))))
    val root = java.nio.file.Files.createTempDirectory("advisor_store")
      .toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.setSortOrder(Seq("id"), files = 2)
    t.commit(Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("id", "v"))
    (1 to 10).foreach { w =>
      t.commit(Seq.tabulate(5)(i => ((w * 1000 + i).toLong, s"w$w"))
        .toDF("id", "v").coalesce(1), op = "append")
    }
    val expected = t.read().count()

    // the workload: the same store read three times — the advisor learns
    // the store from the PLAN (ManifestFileIndex root), not from a caller
    // registering anything
    (1 to 3).foreach(_ => advisor.observe(t.read()).count())
    val findings = advisor.storeFindings(minCount = 3)
    assert(findings.exists(f => f.root == root && f.chainDirs === 11L),
      s"store pathology not diagnosed: $findings")

    // the act half: one tick heals it (sort-order aware — clustering kept)
    val tick = advisor.maintenanceTick(minCount = 3)
    assert(tick.compacted.map(_._1) === Seq(root))
    val t2 = new SnapshotTable(spark, root)
    assert(t2.read().count() === expected)
    assert(t2.layoutStats()._1.size === 1, "chain not folded")
    t2.readWhere(col("id") < 50L).count()
    val (kept, total) = t2.lastPruneStats
    assert(total === 2L && kept === 1L,
      s"tick destroyed the declared clustering: $kept/$total")

    // idempotent: a healthy store yields no finding and the next tick is a
    // no-op (head does not move)
    assert(advisor.storeFindings(minCount = 3).isEmpty)
    val head = t2.currentVersion
    assert(advisor.maintenanceTick(minCount = 3).compacted.isEmpty)
    assert(t2.currentVersion === head)

    // a DROPPED store must not wedge the loop: the dead root is evicted and
    // later ticks keep running (and keep serving other stores)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    assert(advisor.storeFindings(minCount = 3).isEmpty)
    assert(advisor.maintenanceTick(minCount = 3).compacted.isEmpty)
  }

  test("a registered IVF index drifted past its retrain share is retrained " +
      "on the maintenance tick, with lifecycle GC folded in") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.sources.SnapshotTable
    val advisor = new WorkloadAdvisor(spark,
      new Materializations(spark, Some(graft.TempDirs.newDir("advisor_ivf"))))
    val root = java.nio.file.Files.createTempDirectory("advisor_ivf_idx")
      .toFile.getAbsolutePath
    val dim = 8
    def wave(n: Int, off: Long) = {
      val rnd = new scala.util.Random(off + 7)
      (0 until n).map { i =>
        (off + i, Array.tabulate(dim)(d =>
          (if (d % 4 == i % 4) 1.0 else 0.0) + rnd.nextGaussian() * 0.3).toSeq)
      }.toDF("id", "vec")
    }
    IvfIndex.build(wave(100, 0), root, "id", "vec", nCells = 8)
    advisor.registerIvfIndex(root,
      WorkloadAdvisor.IvfPolicy(retrainShare = 0.5, nCells = 8))

    // below the share: the tick leaves the index alone
    IvfIndex.append(wave(10, 5000), root, "id", "vec")
    assert(advisor.maintenanceTick(minCount = 99).indexesRetrained.isEmpty)

    // drift past the share: the tick retrains + GCs with no caller involved
    IvfIndex.append(wave(80, 6000), root, "id", "vec")
    val tick = advisor.maintenanceTick(minCount = 99)
    assert(tick.indexesRetrained.map(_._1) === Seq(root),
      s"drifted index not retrained: $tick")
    val st = new SnapshotTable(spark, root)
    assert(st.history().count() === 1L, "GC should fold into the tick")
    assert(st.read().count() === 190L)
    assert(new SnapshotTable(spark, s"$root/_graft_ivf_centroids")
      .read().select("gen").distinct().count() === 1L)

    // serve still exact from the retrained standing state
    val union = wave(100, 0).unionByName(wave(10, 5000)).unionByName(wave(80, 6000))
    val queries = union.filter(col("id") < 3)
    val served = IvfIndex.topK(spark, root, queries, "id", "vec", k = 5, nprobe = 8)
    val exact = graft.operators.Similarity
      .bruteForceTopK(union, queries, "id", "vec", k = 5)
    assert(served.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      === exact.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")))

    // unregister: later ticks leave it alone even when drifted
    advisor.unregisterIvfIndex(root)
    IvfIndex.append(wave(300, 9000), root, "id", "vec")
    assert(advisor.maintenanceTick(minCount = 99).indexesRetrained.isEmpty)
  }

  test("an appender racing the maintenance tick: every append lands, a " +
      "conflicted heal skips to the next tick, and the heal eventually lands") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val advisor = new WorkloadAdvisor(spark,
      new Materializations(spark, Some(graft.TempDirs.newDir("advisor_race"))))
    val root = java.nio.file.Files.createTempDirectory("advisor_race_store")
      .toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.setSortOrder(Seq("id"), files = 2)
    t.commit(Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("id", "v"))
    (1 to 9).foreach { w =>
      t.commit(Seq.tabulate(5)(i => ((w * 1000 + i).toLong, s"w$w"))
        .toDF("id", "v").coalesce(1), op = "append")
    }
    (1 to 3).foreach(_ => advisor.observe(t.read()).count())

    // ingest keeps landing WHILE the loop ticks: compaction is
    // head-validated, so a mid-rewrite append conflicts the heal — the
    // tick's contract is to skip that store until the next tick, never to
    // crash the loop or to contend with the writer
    val appender = new Thread(() => {
      val mine = new SnapshotTable(spark, root)
      (1 to 6).foreach { w =>
        mine.commit(Seq.tabulate(5)(i => ((w * 100000 + i).toLong, s"r$w"))
          .toDF("id", "v").coalesce(1), op = "append")
        Thread.sleep(20)
      }
    })
    appender.start()
    val healed = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (appender.isAlive)
      healed ++= advisor.maintenanceTick(minCount = 3).compacted
    appender.join()
    // the quiet-period tick: if every racing heal lost, the chain is still
    // pathological and THIS one must land; if one landed mid-race, the
    // store may already be healthy — either way a heal has happened
    healed ++= advisor.maintenanceTick(minCount = 3).compacted
    assert(healed.nonEmpty, "no tick ever healed the store")

    // nothing lost to the race: the base, all 9 fixture waves, and all 6
    // racing appends are present exactly once
    val t2 = new SnapshotTable(spark, root)
    assert(t2.read().count() === 100L + 9 * 5 + 6 * 5)
    assert(t2.read().select("id").distinct().count() === 100L + 9 * 5 + 6 * 5)
    // the heal went through TableMaintenance.maintain: the declared sort
    // order survived every rewrite
    assert(t2.sortOrder === Seq("id"))
  }

  test("registered sync mirrors ride the maintenance tick: export mirrors " +
      "advance the chain O(delta), idle ticks sync nothing, a broken " +
      "mirror logs without stalling the rest") {
    import spark.implicits._
    import graft.sources.{IcebergExport, SnapshotTable}
    val mats = new Materializations(spark,
      Some(java.nio.file.Files.createTempDirectory("sync_mats")
        .toFile.getAbsolutePath))
    val advisor = new WorkloadAdvisor(spark, mats)
    val root = java.nio.file.Files.createTempDirectory("sync_store")
      .toFile.getAbsolutePath
    val chain = java.nio.file.Files.createTempDirectory("sync_chain")
      .toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq.tabulate(40)(i => (i.toLong, s"v$i")).toDF("id", "v"))
    advisor.registerSync(root, chain, direction = "export")
    // a broken registration must not stall the working one
    advisor.registerSync("/nonexistent/graft_broken_store", s"$chain-x")

    val t1 = advisor.maintenanceTick(minCount = 99)
    assert(t1.mirrorsSynced.map(_._1) === Seq(s"$root->$chain"),
      s"export mirror must advance on the tick: $t1")
    assert(IcebergExport.readTable(spark, chain).count() === 40)

    // idle tick: cursors say up to date, nothing syncs
    assert(advisor.maintenanceTick(minCount = 99).mirrorsSynced.isEmpty)

    // a new store commit rides the NEXT tick as one appended snapshot
    st.commit(Seq((100L, "w")).toDF("id", "v"), op = "append")
    val t2 = advisor.maintenanceTick(minCount = 99)
    assert(t2.mirrorsSynced === Seq(s"$root->$chain" -> 1))
    assert(IcebergExport.snapshotIds(spark, chain).size === 2)
    assert(IcebergExport.readTable(spark, chain).count() === 41)

    // import direction: a second store follows the chain autonomously
    val follower = java.nio.file.Files.createTempDirectory("sync_follow")
      .toFile.getAbsolutePath
    advisor.registerSync(follower, chain, direction = "import")
    val t3 = advisor.maintenanceTick(minCount = 99)
    assert(t3.mirrorsSynced.map(_._1).contains(s"$follower->$chain"))
    assert(new SnapshotTable(spark, follower).read().count() === 41)

    advisor.unregisterSync(root, chain)
    st.commit(Seq((200L, "z")).toDF("id", "v"), op = "append")
    val t4 = advisor.maintenanceTick(minCount = 99)
    assert(!t4.mirrorsSynced.exists(_._1 == s"$root->$chain"),
      "unregistered mirror must not sync")
  }
}
