package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.SnapshotTable

/** The streaming READ of the snapshot store ([[SnapshotSource]]): appends
  * stream exactly once in commit order, restarts resume from the
  * checkpoint, compaction is invisible, mutations fail loudly unless
  * skipped — Iceberg's Spark streaming-read contract. */
class SnapshotSourceSpec extends SparkSpec {

  private def drain(root: String, ckpt: String, table: String,
      startVersion: Long = -1L, skipMutations: Boolean = false): Unit = {
    val q = SnapshotStream.readAppends(spark, root, startVersion, skipMutations)
      .writeStream.format("memory").queryName(table)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("appends stream exactly once; a restart resumes at the checkpoint") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_tbl").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_ck").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    // a restartable (file) sink: each run APPENDS only its new batches, so
    // total counts across runs prove exactly-once (a replay double-counts)
    def run(): Unit =
      SnapshotStream.readAppends(spark, root).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()

    (0 until 3).foreach { w =>
      st.commit(Seq.tabulate(10)(j => (w * 10L + j, s"w$w")).toDF("id", "wave"),
        op = "append")
    }
    run()
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq === Seq("id", "wave"))
    assert(got.select("id").as[Long].collect().sorted === (0L until 30L).toArray)

    // two more appends; the same checkpoint streams ONLY them
    (3 until 5).foreach { w =>
      st.commit(Seq.tabulate(10)(j => (w * 10L + j, s"w$w")).toDF("id", "wave"),
        op = "append")
    }
    run()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted
      === (0L until 50L).toArray)

    // nothing new → a no-op run, not a replay
    run()
    assert(spark.read.parquet(out).count() === 50)
  }

  test("compaction and start-version are invisible to the stream") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_cmp").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq.tabulate(5)(j => (j.toLong, "a")).toDF("id", "wave"), op = "append")
    st.commit(Seq.tabulate(5)(j => (5L + j, "b")).toDF("id", "wave"), op = "append")
    st.compact(targetFiles = 1) // rewrites rows 0-9 without changing them
    st.commit(Seq.tabulate(5)(j => (10L + j, "c")).toDF("id", "wave"), op = "append")

    drain(root, Files.createTempDirectory("snapsrc_cmp_ck").toFile.getAbsolutePath,
      "snapsrc_t2")
    val got = spark.table("snapsrc_t2")
    // the compacted copy does NOT re-stream: each row exactly once
    assert(got.count() === 15)
    assert(got.count() === st.read().count())

    // start-version bounds history: only appends AFTER the compact stream
    drain(root, Files.createTempDirectory("snapsrc_sv_ck").toFile.getAbsolutePath,
      "snapsrc_t2b", startVersion = 2L)
    assert(spark.table("snapsrc_t2b").select("id").as[Long].collect().sorted
      === (10L until 15L).toArray)
  }

  test("a mutation commit fails the stream loudly — unless skip-mutations") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_mut").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq.tabulate(5)(j => (j.toLong, "a")).toDF("id", "wave"), op = "append")
    st.commit(Seq.tabulate(3)(j => (100L + j, "x")).toDF("id", "wave")) // overwrite
    st.commit(Seq.tabulate(5)(j => (10L + j, "c")).toDF("id", "wave"), op = "append")

    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, Files.createTempDirectory("snapsrc_mut_ck").toFile.getAbsolutePath,
        "snapsrc_t3")
    }
    assert(err.getMessage.contains("non-append commit") ||
      Option(err.getCause).exists(_.getMessage.contains("non-append commit")))

    drain(root, Files.createTempDirectory("snapsrc_mut_ck2").toFile.getAbsolutePath,
      "snapsrc_t3b", skipMutations = true)
    // both appends stream; the overwrite's rows do NOT (they are not appends)
    assert(spark.table("snapsrc_t3b").select("id").as[Long].collect().sorted
      === ((0L until 5L) ++ (10L until 15L)).toArray)
  }

  test("a wedged stream recovers on the SAME checkpoint via start-version") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_rec").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_rec_ck").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_rec_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((0L, "a")).toDF("id", "wave"), op = "append")     // v0
    st.commit(Seq((100L, "x")).toDF("id", "wave"))                  // v1 overwrite
    st.commit(Seq((2L, "c")).toDF("id", "wave"), op = "append")     // v2
    def run(startVersion: Long): Unit =
      SnapshotStream.readAppends(spark, root, startVersion).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // first run wedges on the mutation — its offset is already in the WAL
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](run(-1L))
    // the error's advertised remedy must WORK on the same checkpoint: the
    // start-version floor applies to the replayed WAL batch too
    run(startVersion = 1L)
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSeq
      === Seq(2L))
  }

  test("max-versions-per-batch paces a backfill into bounded micro-batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_rate").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_rate_ck").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_rate_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    (0 until 6).foreach { w =>
      st.commit(Seq.tabulate(4)(j => (w * 4L + j, s"w$w")).toDF("id", "wave"),
        op = "append")
    }
    SnapshotStream.readAppends(spark, root, maxVersionsPerBatch = Some(2))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // every row exactly once...
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted
      === (0L until 24L).toArray)
    // ...across ≥3 bounded batches (6 versions / 2 per batch), not one union
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(!_.getName.startsWith("."))
    assert(batches >= 3, s"expected a paced backfill, got $batches batch(es)")
  }

  test("mode=cdc streams every commit's keyed changes — equal to batch changes()") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_cdc").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_cdc_ck").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_cdc_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    def drainCdc(): Unit =
      SnapshotStream.readChanges(spark, root, "id").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()

    st.commit(Seq.tabulate(5)(j => (j.toLong, s"v$j", 10L)).toDF("id", "tag", "n")) // v0 seed
    st.commit(Seq.tabulate(3)(j => (10L + j, "new", 20L)).toDF("id", "tag", "n"),
      op = "append")                                                // v1 append
    st.update(col("id") % 2 === 0 && col("id") < 5,
      Map("n" -> (col("n") + lit(1))))                              // v2 cow update
    st.compact(targetFiles = 1)                                     // v3: silent
    st.deleteWhereMor(col("tag") === "new", "id")                   // v4 mor delete
    drainCdc()

    val got = spark.read.parquet(out)
      .select("id", "_change_type", "_commit_version").as[(Long, String, Long)]
      .collect().sorted
    // the batch oracle, window by window (v1's appendDelta shortcut must
    // agree with changes(0,1) — fresh keys only)
    val expected = (
      (0L until 5L).map(i => (i, "insert", 0L)) ++
      st.changes(0, 1, "id").select(col("id"), col("_change_type"))
        .as[(Long, String)].collect().map { case (i, c) => (i, c, 1L) } ++
      st.changes(1, 2, "id").select(col("id"), col("_change_type"))
        .as[(Long, String)].collect().map { case (i, c) => (i, c, 2L) } ++
      st.changes(3, 4, "id").select(col("id"), col("_change_type"))
        .as[(Long, String)].collect().map { case (i, c) => (i, c, 4L) }
    ).sorted
    assert(got === expected)
    assert(!got.exists(_._3 == 3L)) // the compact emitted nothing

    // restart: one more update → ONLY its pre/post pair arrives
    st.update(col("id") === 1L, Map("n" -> lit(99L)))               // v5
    drainCdc()
    val inc = spark.read.parquet(out).where(col("_commit_version") === 5)
      .select("id", "_change_type").as[(Long, String)].collect().sorted
    assert(inc === Array((1L, "update_postimage"), (1L, "update_preimage")))
    assert(spark.read.parquet(out).count() === got.length + 2)
  }

  test("composite-key CDC: row identity spans columns") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_ck2").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_ck2_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    // (tenant, id) is the identity; same id exists under both tenants
    st.commit(Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 1L, 10L), ("b", 2L, 10L))
      .toDF("tenant", "id", "n"))
    st.update(col("tenant") === "a" && col("id") === 1L,
      Map("n" -> lit(11L)))                                       // v1
    st.deleteWhereMor(col("tenant") === "b" && col("id") === 2L,
      Seq("tenant", "id"))                                        // v2
    SnapshotStream.readChanges(spark, root, "tenant,id").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("snapsrc_ck2_ck").toFile.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val got = spark.read.parquet(out)
      .select("tenant", "id", "_change_type", "_commit_version")
      .as[(String, Long, String, Long)].collect().sorted
    // only (a,1) updates — (b,1) shares the id, (a,2) the tenant — and only
    // (b,2) deletes; a single-column key would smear both
    assert(got === Array(
      ("a", 1L, "insert", 0L), ("a", 1L, "update_postimage", 1L),
      ("a", 1L, "update_preimage", 1L), ("a", 2L, "insert", 0L),
      ("b", 1L, "insert", 0L), ("b", 2L, "delete", 2L),
      ("b", 2L, "insert", 0L)))
    // the streamed windows equal the batch composite-key changes()
    val batch = st.changes(1, 2, Seq("tenant", "id"))
      .select("tenant", "id", "_change_type").as[(String, Long, String)]
      .collect().sorted
    assert(batch === Array(("b", 2L, "delete")))
  }

  test("keyless CDC: multiset diffs honor duplicate copies") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_nk").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_nk_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    // a table with NO key — duplicate rows are legal (pos-delete domain)
    st.commit((Seq.fill(3)(("x", 1L)) ++ Seq.fill(2)(("y", 2L)))
      .toDF("tag", "n").coalesce(1))                              // v0
    st.commit(Seq.fill(2)(("x", 1L)).toDF("tag", "n"), op = "append") // v1
    st.deleteWherePos(col("tag") === "x")                         // v2
    SnapshotStream.readChangesKeyless(spark, root).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("snapsrc_nk_ck").toFile.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val got = spark.read.parquet(out)
      .groupBy("tag", "_change_type", "_commit_version").count()
      .as[(String, String, Long, Long)].collect().sorted
    assert(got === Array(
      ("x", "delete", 2L, 5L),  // all five duplicate copies, one row each
      ("x", "insert", 0L, 3L), ("x", "insert", 1L, 2L),
      ("y", "insert", 0L, 2L)))
    // the batch keyless diff agrees window by window
    assert(st.changes(0, 1).collect().map(_.toSeq).toSeq ===
      Seq.fill(2)(Seq("x", 1L, "insert")))
    assert(st.changes(1, 2).count() === 5)

    // copy regeneration crosses the 10k chunk bound exactly (25k copies of
    // ONE distinct row — the low-cardinality shape that must not build a
    // 25k-element array per row)
    val big = new SnapshotTable(spark,
      Files.createTempDirectory("snapsrc_nk_big").toFile.getAbsolutePath)
    big.commit(Seq(("seed", 0L)).toDF("tag", "n"))
    big.commit(spark.range(25000).select(lit("z").as("tag"), lit(9L).as("n")),
      op = "append")
    val d = big.changes(0, 1)
    assert(d.count() === 25000)
    assert(d.distinct().collect().map(_.toSeq).toSeq ===
      Seq(Seq("z", 9L, "insert")))
  }

  test("schema evolution mid-stream: extras drop, missing columns null-fill") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_evo").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_evo_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((0L, "a")).toDF("id", "wave"), op = "append")
    // M4's append-time schema evolution: one delta adds a column the pinned
    // stream schema doesn't know, one omits a column it requires
    st.commit(Seq((1L, "b", 9L)).toDF("id", "wave", "extra"), op = "append")
    st.commit(Seq(Tuple1(2L)).toDF("id"), op = "append")
    spark.readStream.format(classOf[SnapshotSourceProvider].getName)
      .schema("id LONG, wave STRING").load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("snapsrc_evo_ck").toFile.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq === Seq("id", "wave"))
    val rows = got.as[(Long, Option[String])].collect().sortBy(_._1)
    assert(rows === Array((0L, Some("a")), (1L, Some("b")), (2L, None)))
  }

  test("mid-stream type widening: in-range values cast back; an " +
      "out-of-range value fails with the restart-the-stream remedy") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_widen").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_widen_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_widen_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((0L, 7)).toDF("id", "n"), op = "append")   // v0: n is INT
    st.alterColumnType("n", "long")                           // v1: widen
    st.commit(Seq((1L, 9L)).toDF("id", "n"), op = "append")  // v2: fits int
    def run(): Unit =
      spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .schema("id LONG, n INT").load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // in-range widened values conform silently (cast back to the pinned int)
    run()
    assert(spark.read.parquet(out).as[(Long, Int)].collect().sorted
      === Array((0L, 7), (1L, 9)))
    // an out-of-range value must fail the batch with the ACTUAL remedy, not
    // silently wrap or die with a bare cast error
    st.commit(Seq((2L, Int.MaxValue + 10L)).toDF("id", "n"), op = "append")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](run())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains(
      "restart the stream to adopt the evolved schema")), messages(err).mkString("\n"))
  }

  test("a lossy-but-castable value (fractional loss, not overflow) also " +
      "fails with the restart remedy — the guard round-trips, not just " +
      "null-checks") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_frac").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((0L, 2.0)).toDF("id", "n"), op = "append")  // round-trips
    // fresh sink dir per run: a reused parquet sink's _spark_metadata marks
    // batch 0 committed and a fresh-checkpoint re-run would SKIP execution
    def run(): String = {
      val out = Files.createTempDirectory("snapsrc_frac_out").toFile.getAbsolutePath
      spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .schema("id LONG, n INT").load(root) // pinned NARROWER than the store
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("snapsrc_frac_ck").toFile.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      out
    }
    val out1 = run()
    assert(spark.read.parquet(out1).as[(Long, Int)].collect() === Array((0L, 2)))
    // 1.7 try_casts to int 1 WITHOUT error — only the round-trip check
    // catches the silent truncation
    st.commit(Seq((1L, 1.7)).toDF("id", "n"), op = "append")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](run())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains(
      "restart the stream to adopt the evolved schema")), messages(err).mkString("\n"))
  }

  test("mid-stream schema evolution surfaces an OBSERVABLE drift signal: " +
      "the new column waits for a restart, but never silently") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_drift").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_drift_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_drift_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    SnapshotSource.clearSchemaDriftEvents(root)
    st.commit(Seq((0L, "a")).toDF("id", "wave"), op = "append")        // v0
    st.addColumn("extra", "INT")                                       // v1 evolve
    st.commit(Seq((1L, "b", 9)).toDF("id", "wave", "extra"),
      op = "append")                                                   // v2
    def run(ck: String): Unit =
      spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .schema("id LONG, wave STRING").load(root) // pinned pre-evolution
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    run(ckpt)
    // the documented v1 contract holds: rows conform, `extra` waits
    assert(spark.read.parquet(out).columns.toSeq === Seq("id", "wave"))
    assert(spark.read.parquet(out).count() === 2)
    // ... and BOTH drift causes are observable, each with the remedy
    val events = SnapshotSource.schemaDriftEvents(root)
    assert(events.exists(e => e._1 === 1L && e._2.contains("column 'extra'")),
      s"evolve commit not surfaced: $events")
    assert(events.exists(e => e._1 === 2L && e._2.contains("dropped")),
      s"dropped delta column not surfaced: $events")
    assert(events.forall(_._2.contains(
      "restart the stream to adopt the evolved schema")))
    // a replay of the same range (fresh checkpoint) dedupes, never doubles
    val n = events.size
    run(Files.createTempDirectory("snapsrc_drift_ck2").toFile.getAbsolutePath)
    assert(SnapshotSource.schemaDriftEvents(root).size === n)
  }

  test("adopt-schema-on-evolve: a graceful two-run rollover adopts the " +
      "added column from the same checkpoint — no rows lost or duplicated") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_adopt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_adopt_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_adopt_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    SnapshotSource.clearSchemaDriftEvents(root)
    st.commit(Seq((0L, "a"), (1L, "b")).toDF("id", "wave"), op = "append") // v0
    st.commit(Seq((2L, "c")).toDF("id", "wave"), op = "append")            // v1
    st.addColumn("extra", "INT")                                           // v2 evolve
    st.commit(Seq((3L, "d", 30), (4L, "e", 40)).toDF("id", "wave", "extra"),
      op = "append")                                                       // v3

    // Run 1 models the long-lived stream that STARTED before the evolve:
    // its pinned schema is the pre-evolution one. The restarts leave the
    // schema unpinned — re-resolved from the store at run start, which is
    // exactly what the rollover's restart adopts.
    def run(pin: Option[String] = None): Unit = {
      val r = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("adopt-schema-on-evolve", "true")
      pin.foreach(r.schema)
      r.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }

    run(Some("id LONG, wave STRING")) // run 1 drains up to the evolve
                                      // boundary and ENDS — gracefully
    val afterRun1 = spark.read.parquet(out)
    assert(afterRun1.columns.toSeq === Seq("id", "wave"),
      "run 1 must stop AT the boundary, never stream post-evolve data " +
        "under the old schema")
    assert(afterRun1.select("id").as[Long].collect().sorted === Array(0L, 1L, 2L))
    // the boundary is observable while the orchestrator decides to restart
    assert(SnapshotSource.schemaDriftEvents(root)
      .exists(e => e._1 === 2L && e._2.contains("column 'extra'")))

    run() // run 2, SAME checkpoint: evolved schema re-pinned, continues
    val all = spark.read.option("mergeSchema", "true").parquet(out)
    assert(all.columns.sorted === Array("extra", "id", "wave"))
    assert(all.select("id").as[Long].collect().sorted
      === Array(0L, 1L, 2L, 3L, 4L), "rollover lost or duplicated rows")
    assert(all.filter(col("extra").isNotNull).select("id", "extra")
      .as[(Long, Int)].collect().sorted === Array((3L, 30), (4L, 40)))

    // the adopted stream keeps tailing: a later append lands exactly once
    st.commit(Seq((5L, "f", 50)).toDF("id", "wave", "extra"), op = "append") // v4
    run()
    assert(spark.read.option("mergeSchema", "true").parquet(out).count() === 6)
  }

  test("adopt-schema-on-evolve: a mid-stream TYPE WIDENING is a rollover " +
      "boundary too — a >2^31 value flows after the restart instead of " +
      "failing the batch, every row exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_widenroll").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_widenroll_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_widenroll_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    SnapshotSource.clearSchemaDriftEvents(root)
    st.commit(Seq((1, "a"), (2, "b")).toDF("n", "wave"), op = "append")  // v0: n INT
    st.alterColumnType("n", "bigint")                                   // v1 evolve
    // a value NO int can carry — the v1 conform-and-try_cast path FAILS
    // the batch on it; the rollover must make it flow instead
    st.commit(Seq((5000000000L, "c")).toDF("n", "wave"), op = "append") // v2

    def run(pin: Option[String] = None): Unit = {
      val r = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("adopt-schema-on-evolve", "true")
      pin.foreach(r.schema)
      r.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }

    run(Some("n INT, wave STRING")) // run 1: drains up to the widen, ENDS
    val afterRun1 = spark.read.parquet(out)
    assert(afterRun1.schema("n").dataType
      === org.apache.spark.sql.types.IntegerType)
    assert(afterRun1.select("wave").as[String].collect().sorted
      === Array("a", "b"), "run 1 must stop AT the widen boundary")
    // the boundary is observable while the orchestrator restarts
    assert(SnapshotSource.schemaDriftEvents(root)
      .exists(e => e._2.contains("widened column 'n'")))

    run() // run 2, SAME checkpoint: widened schema re-pinned, value flows
    // mergeSchema cannot merge INT/BIGINT parquet files — an explicit
    // read schema applies Spark 4's type widening instead
    def readAll = spark.read.schema("n LONG, wave STRING").parquet(out)
    assert(readAll.select("n").as[Long].collect().sorted
      === Array(1L, 2L, 5000000000L), "rollover lost or duplicated rows")

    // the adopted stream keeps tailing
    st.commit(Seq((7000000000L, "d")).toDF("n", "wave"), op = "append") // v3
    run()
    assert(readAll.count() === 4)
  }

  test("adopt-schema-on-evolve: a NESTED struct ADD is a rollover " +
      "boundary, and pre-add struct deltas RECONCILE under the extended " +
      "schema (appended subfield null-fills) instead of failing analysis") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_nestroll").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_nestroll_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_nestroll_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((1L, 10L)).toDF("id", "a")
      .select(col("id"), struct(col("a")).as("nest")), op = "append")   // v0
    st.addNestedColumn("nest", "b", "STRING")                           // v1
    st.commit(Seq((2L, 20L, "x")).toDF("id", "a", "b")
      .select(col("id"), struct(col("a"), col("b")).as("nest")),
      op = "append")                                                    // v2

    def run(ck: String, pin: Option[String] = None): Unit = {
      val r = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("adopt-schema-on-evolve", "true")
      pin.foreach(r.schema)
      r.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }

    run(ckpt, Some("id BIGINT, nest STRUCT<a: BIGINT>"))
    // run 1 drains up to the nested-add boundary and ends gracefully
    assert(spark.read.schema("id BIGINT, nest STRUCT<a: BIGINT>")
      .parquet(out).count() === 1, "run 1 must stop AT the nested add")
    run(ckpt) // run 2 re-pins the extended struct; v2 flows, exactly once
    val readAll = spark.read
      .schema("id BIGINT, nest STRUCT<a: BIGINT, b: STRING>").parquet(out)
    assert(readAll.select(col("id"), col("nest.a"), col("nest.b"))
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
      === Array((1L, 10L, None), (2L, 20L, Some("x"))))

    // a FRESH stream (pinned to the CURRENT extended schema) replays v0's
    // pre-add delta: conform must reconcile the narrow struct by
    // null-filling the appended subfield, not fail the cast analysis
    val out2 = Files.createTempDirectory("snapsrc_nestroll_o2").toFile.getAbsolutePath
    val ck2 = Files.createTempDirectory("snapsrc_nestroll_c2").toFile.getAbsolutePath
    val r2 = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
      .load(root)
    r2.writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(spark.read
      .schema("id BIGINT, nest STRUCT<a: BIGINT, b: STRING>").parquet(out2)
      .select(col("id"), col("nest.a"), col("nest.b"))
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
      === Array((1L, 10L, None), (2L, 20L, Some("x"))))
  }

  test("adopt-schema-on-evolve: a DEEP nested add (dotted path) is a " +
      "rollover boundary too — the stream stops at it instead of dying on " +
      "a struct-cast analysis error") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_deeproll").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_deeproll_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_deeproll_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((1L, 7L)).toDF("id", "x")
      .select(col("id"),
        struct(struct(col("x")).as("inner")).as("nest")), op = "append") // v0
    st.addNestedColumn("nest", "inner.y", "STRING")                      // v1
    st.commit(Seq((2L, 8L, "y2")).toDF("id", "x", "y")
      .select(col("id"),
        struct(struct(col("x"), col("y")).as("inner")).as("nest")),
      op = "append")                                                     // v2
    def run(pin: Option[String] = None): Unit = {
      val r = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("adopt-schema-on-evolve", "true")
      pin.foreach(r.schema)
      r.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    run(Some("id BIGINT, nest STRUCT<inner: STRUCT<x: BIGINT>>"))
    assert(spark.read.schema("id BIGINT, nest STRUCT<inner: STRUCT<x: BIGINT>>")
      .parquet(out).count() === 1, "run 1 must stop AT the deep add")
    run() // restart adopts; the wide delta flows
    assert(spark.read
      .schema("id BIGINT, nest STRUCT<inner: STRUCT<x: BIGINT, y: STRING>>")
      .parquet(out)
      .select(col("id"), col("nest.inner.y"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
      === Array((1L, None), (2L, Some("y2"))))
  }

  test("adopt-schema-on-evolve: a NESTED RENAME then a NESTED DROP are " +
      "each a rollover boundary, and a pre-rename struct delta reconciles " +
      "BY NAME under the re-pinned schema (renamed subfield null-fills in " +
      "a fresh stream, like a top-level rename)") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_nestren").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_nestren_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_nestren_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((1L, 10L, "x")).toDF("id", "a", "b")
      .select(col("id"), struct(col("a"), col("b")).as("nest")),
      op = "append")                                                    // v0
    st.renameNestedColumn("nest", "b", "c")                             // v1
    st.commit(Seq((2L, 20L, "y")).toDF("id", "a", "c")
      .select(col("id"), struct(col("a"), col("c")).as("nest")),
      op = "append")                                                    // v2
    def run(pin: Option[String] = None): Unit = {
      val r = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("adopt-schema-on-evolve", "true")
      pin.foreach(r.schema)
      r.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    run(Some("id BIGINT, nest STRUCT<a: BIGINT, b: STRING>"))
    // run 1 drains exactly up to the nested-rename boundary
    assert(spark.read.schema("id BIGINT, nest STRUCT<a: BIGINT, b: STRING>")
      .parquet(out).count() === 1, "run 1 must stop AT the nested rename")
    run() // run 2 re-pins the renamed struct; v2 flows, exactly once
    assert(spark.read
      .schema("id BIGINT, nest STRUCT<a: BIGINT, c: STRING>").parquet(out)
      .select(col("id"), col("nest.a"), col("nest.c"))
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
      === Array((1L, 10L, None), (2L, 20L, Some("y"))))

    // a nested DROP is a boundary too: run 3 drains nothing new, run 4
    // adopts the narrowed struct and the post-drop delta flows
    st.dropNestedColumn("nest", "a")                                    // v3
    st.commit(Seq((3L, "z")).toDF("id", "c")
      .select(col("id"), struct(col("c")).as("nest")), op = "append")   // v4
    run()
    assert(spark.read
      .schema("id BIGINT, nest STRUCT<c: STRING>").parquet(out)
      .select(col("id"), col("nest.c"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
      === Array((1L, None), (2L, Some("y")), (3L, Some("z"))))

    // a FRESH stream pinned to the CURRENT schema replays the pre-rename
    // deltas: structReconcile maps by name — the renamed/dropped subfield
    // values null-fill, exactly the top-level-rename conform semantic
    val out2 = Files.createTempDirectory("snapsrc_nestren_o2").toFile.getAbsolutePath
    val ck2 = Files.createTempDirectory("snapsrc_nestren_c2").toFile.getAbsolutePath
    spark.readStream.format(classOf[SnapshotSourceProvider].getName)
      .load(root)
      .writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(spark.read
      .schema("id BIGINT, nest STRUCT<c: STRING>").parquet(out2)
      .select(col("id"), col("nest.c"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
      === Array((1L, None), (2L, Some("y")), (3L, Some("z"))))
  }

  test("adopt-schema-on-evolve: a widened-then-DROPPED column is STILL a " +
      "rollover boundary — the restart's re-pinned schema drops it, so " +
      "out-of-range values never fail the batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_widendrop").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_widendrop_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_widendrop_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((1, "a"), (2, "b")).toDF("n", "wave"), op = "append")  // v0
    st.alterColumnType("n", "bigint")                                   // v1
    st.commit(Seq((5000000000L, "c")).toDF("n", "wave"), op = "append") // v2
    st.dropColumn("n")                                                  // v3
    def run(pin: Option[String] = None): Unit = {
      val r = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("adopt-schema-on-evolve", "true")
      pin.foreach(r.schema)
      r.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    run(Some("n INT, wave STRING")) // drains to the widen boundary, ENDS
    assert(spark.read.schema("wave STRING").parquet(out)
      .as[String].collect().sorted === Array("a", "b"))
    // restart: the re-pinned schema LACKS n (dropped), so v2's delta
    // conforms by dropping the column — the >2^31 value never errors
    run()
    assert(spark.read.schema("wave STRING").parquet(out)
      .as[String].collect().sorted === Array("a", "b", "c"))
  }

  test("adopt-schema-on-evolve: a NESTED widen whose parent struct is " +
      "later DROPPED is STILL a rollover boundary (r20 review) — the " +
      "restart's re-pinned schema lacks the struct, so the out-of-range " +
      "subfield value conforms by dropping instead of failing the batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_nwdrop").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_nwdrop_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("snapsrc_nwdrop_ck").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((1L, 7, "a")).toDF("id", "q", "wave")
      .select(col("id"), struct(col("q")).as("nest"), col("wave")),
      op = "append")                                                   // v0
    st.alterNestedColumnType("nest", "q", "BIGINT")                    // v1
    st.commit(Seq((2L, 5000000000L, "b")).toDF("id", "q", "wave")
      .select(col("id"), struct(col("q")).as("nest"), col("wave")),
      op = "append")                                                   // v2
    st.dropColumn("nest")                                              // v3
    def run(pin: Option[String] = None): Unit = {
      val r = spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("adopt-schema-on-evolve", "true")
      pin.foreach(r.schema)
      r.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    run(Some("id BIGINT, nest STRUCT<q: INT>, wave STRING"))
    // run 1 stops AT the nested widen instead of raising on the >2^31 value
    assert(spark.read.schema("wave STRING").parquet(out)
      .as[String].collect().sorted === Array("a"))
    run() // restart: the re-pinned schema LACKS nest; v2's delta conforms
    assert(spark.read.schema("wave STRING").parquet(out)
      .as[String].collect().sorted === Array("a", "b"))
  }

  test("adopt-schema-on-evolve ignores an added-then-DROPPED column: the " +
      "rollover never wedges on history a restart cannot adopt") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_adoptdrop").toFile.getAbsolutePath
    val out = Files.createTempDirectory("snapsrc_adoptdrop_out").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commit(Seq((0L, "a")).toDF("id", "wave"), op = "append")          // v0
    st.addColumn("gone", "INT")                                          // v1 evolve
    st.commit(Seq((1L, "b", 7)).toDF("id", "wave", "gone"), op = "append") // v2
    st.dropColumn("gone")                                                // v3 evolve
    st.commit(Seq((2L, "c")).toDF("id", "wave"), op = "append")          // v4
    spark.readStream.format(classOf[SnapshotSourceProvider].getName)
      .option("adopt-schema-on-evolve", "true")
      .load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("snapsrc_adoptdrop_ck").toFile.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // one run drains EVERYTHING: the dropped column is not a boundary —
    // its delta conforms (v1 behavior) instead of wedging the rollover
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted
      === Array(0L, 1L, 2L))
  }

  test("a partitioned store streams without leaking hidden columns") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapsrc_part").toFile.getAbsolutePath
    val st = new SnapshotTable(spark, root)
    st.commitPartitioned(
      Seq.tabulate(6)(j => (j.toLong, s"k${j % 2}")).toDF("id", "tag"),
      Seq("tag"), op = "append")
    st.commit(Seq.tabulate(6)(j => (10L + j, s"k${j % 3}")).toDF("id", "tag"),
      op = "append")
    drain(root, Files.createTempDirectory("snapsrc_part_ck").toFile.getAbsolutePath,
      "snapsrc_t4")
    val got = spark.table("snapsrc_t4")
    assert(got.columns.toSeq === Seq("id", "tag"))
    assert(got.count() === 12)
    assert(got.groupBy("tag").count().where(col("tag") === "k0")
      .head.getLong(1) === 5L) // 3 from wave 1 (j%2) + 2 from wave 2 (j%3)
  }
}
