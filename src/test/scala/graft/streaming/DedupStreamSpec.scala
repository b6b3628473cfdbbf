package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Dedup

/** Streamed dedup-index maintenance ≡ one-shot batch recompute, on the real
  * documents table: wave 1 (base docs) and wave 2 (perturbed near-dup
  * copies) arrive as separate micro-batches through a file source; the
  * final standing state must equal the full-corpus batch chain exactly. */
class DedupStreamSpec extends SparkSpec {

  private val thr = 0.5

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def wave2 = docs.filter(col("doc_id") % 10 === 0)
    .withColumn("doc_id", col("doc_id") + lit(1000000L))
    .withColumn("text", concat(col("text"), lit(" appended marker token")))

  private def runWave(inDir: String, stateDir: String, ckDir: String): Unit = {
    val stream = spark.readStream.schema(docs.schema).parquet(inDir)
    val q = DedupStream.maintain(stream, stateDir, ckDir,
        threshold = thr, k = 128, bands = 32)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "stream did not drain in time")
  }

  test("two streamed waves produce byte-identical state to a batch recompute") {
    val in = Files.createTempDirectory("dedup_stream_in").toFile.getAbsolutePath
    val state = Files.createTempDirectory("dedup_stream_state").toFile.getAbsolutePath
    val ck = Files.createTempDirectory("dedup_stream_ck").toFile.getAbsolutePath

    docs.write.mode("append").parquet(in)
    runWave(in, state, ck)
    assert(DedupStream.readState(spark, state).isDefined, "wave-1 state missing")

    wave2.write.mode("append").parquet(in)
    runWave(in, state, ck)

    val (idx, cc) = DedupStream.readState(spark, state).get
    val full = docs.unionByName(wave2)
    val fullIdx = Dedup.dedupIndex(full, "doc_id", "text", k = 128)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fullCC = Dedup.connectedComponents(
      Dedup.nearDupPairsFromIndex(fullIdx, thr, k = 128, bands = 32),
      "id_a", "id_b")

    assert(idx.count() === full.count(), "index must cover every ingested doc")
    assert(idx.exceptAll(fullIdx).isEmpty && fullIdx.exceptAll(idx).isEmpty,
      "streamed index diverged from batch index")
    assert(cc.exceptAll(fullCC).isEmpty && fullCC.exceptAll(cc).isEmpty,
      "streamed components diverged from batch components")
    assert(cc.count() > docs.count() / 20, "fixture must produce real clusters")
    fullIdx.unpersist()
  }

  test("replayed micro-batch is idempotent (at-least-once -> exactly-once state)") {
    import spark.implicits._
    val state = Files.createTempDirectory("dedup_replay_state").toFile.getAbsolutePath
    val w1 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val w2 = Seq((3L, "alpha beta gamma delta epsilon eta")).toDF("doc_id", "text")
    val fn = DedupStream.maintainIndex(state, "doc_id", "text",
      threshold = 0.3, k = 32, bands = 8)
    fn(w1, 0L); fn(w2, 1L)
    val once = DedupStream.readState(spark, state).get._2.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fn(w2, 1L) // crash-replay of the last batch
    val twice = DedupStream.readState(spark, state).get._2.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once === twice)
    assert(DedupStream.latestCommitted(spark, state, Long.MaxValue) === Some(1L))
    // and the replayed batch read its PREDECESSOR, not its own output
    assert(DedupStream.latestCommitted(spark, state, 1L) === Some(0L))
  }

  test("versions store index DELTAS, superseded state is garbage-collected") {
    import spark.implicits._
    val state = Files.createTempDirectory("dedup_gc_state").toFile.getAbsolutePath
    val waves = Seq(
      Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta epsilon zeta")),
      Seq((3L, "alpha beta gamma delta epsilon eta")),
      Seq((4L, "omega psi chi phi upsilon")))
    val fn = DedupStream.maintainIndex(state, "doc_id", "text",
      threshold = 0.3, k = 32, bands = 8)
    waves.zipWithIndex.foreach { case (w, i) =>
      fn(w.toDF("doc_id", "text"), i.toLong)
    }
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    // every batch's index delta is retained (union = standing index) …
    assert(Set("idx_0", "idx_1", "idx_2").subsetOf(names))
    // … the committed version and its replay-predecessor survive, older
    // label tables are GC'd
    assert(names.contains("v_2") && names.contains("v_1"))
    assert(!names.contains("v_0"), s"v_0 not collected: $names")
    // a delta dir holds ONLY its own batch's docs (per-batch index I/O)
    assert(spark.read.parquet(s"$state/idx_2").count() === 1)
    // and the read path reassembles the full index through the manifest
    val (idx, cc) = DedupStream.readState(spark, state).get
    assert(idx.count() === 4)
    assert(cc.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("decontamination tap writes per-batch reports off the standing filter") {
    import spark.implicits._
    val root = Files.createTempDirectory("dedup_tap").toFile.getAbsolutePath
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val tap = DedupStream.DecontamTap(eval, s"$root/filter", "eval_v1",
      s"$root/reports", n = 5)
    val fn = DedupStream.maintainIndex(s"$root/state", "doc_id", "text",
      threshold = 0.3, k = 32, bands = 8, tap = Some(tap))
    // batch 0 contaminated (shares the 5-gram run), batch 1 clean
    fn(Seq((1L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text"), 0L)
    fn(Seq((2L, "nothing in common with anything above at all")).toDF("doc_id", "text"), 1L)
    val b0 = spark.read.parquet(s"$root/reports/b_0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(b0.toSeq === Seq((100L, 1L, 2L)))
    assert(spark.read.parquet(s"$root/reports/b_1").count() === 0L)
    // the standing filter was committed once and is reloadable
    assert(graft.operators.Decontaminate
      .loadEvalFilter(spark, s"$root/filter", "eval_v1").exists(_.isDefined))
  }

  test("gate tap writes per-wave quality/language/PII reports ≡ the batch forms") {
    val root = Files.createTempDirectory("dedup_gates").toFile.getAbsolutePath
    val docs = sf("documents")
    val fn = DedupStream.maintainIndex(s"$root/state", "doc_id", "text",
      threshold = 0.5, k = 32, bands = 8,
      gates = Some(DedupStream.GateTap(s"$root/gates")))
    val wave0 = docs.filter(col("doc_id") % 2 === 0)
    val wave1 = docs.filter(col("doc_id") % 2 === 1)
    fn(wave0, 0L)
    fn(wave1, 1L)

    // streamed per-wave report ≡ the batch q52/q84-grain aggregation of the
    // same wave, row for row
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(spark.read.parquet(s"$root/gates/b_0")) ===
      rows(DedupStream.gateReport(wave0, "text", "source")))
    assert(rows(spark.read.parquet(s"$root/gates/b_1")) ===
      rows(DedupStream.gateReport(wave1, "text", "source")))
    // report columns carry every gate the batch surface exposes
    assert(spark.read.parquet(s"$root/gates/b_0").columns.toSeq ===
      Seq("source", "n_docs", "avg_quality", "n_langs", "n_emails", "n_phones"))

    // replay of wave 1 (at-least-once delivery) overwrites to the identical
    // report — the tap is idempotent like the dedup state itself
    val before = rows(spark.read.parquet(s"$root/gates/b_1"))
    fn(wave1, 1L)
    assert(rows(spark.read.parquet(s"$root/gates/b_1")) === before)
  }

  test("gate tap takes a configured gate set: Gopher repetition rides the same fold") {
    val root = Files.createTempDirectory("dedup_gates_cfg").toFile.getAbsolutePath
    val docs = sf("documents")
    // default gates PLUS the q83 Gopher repetition gate plus a bespoke one —
    // no DedupStream change needed (VERDICT r9 #6)
    val gateSet = DedupStream.defaultGates("text") :+
      DedupStream.gopherGate("text") :+
      ("n_long" -> sum(when(length(col("text")) > 200, 1).otherwise(0)).cast("long"))
    val fn = DedupStream.maintainIndex(s"$root/state", "doc_id", "text",
      threshold = 0.5, k = 32, bands = 8,
      gates = Some(DedupStream.GateTap(s"$root/gates", gates = gateSet)))
    val wave0 = docs.filter(col("doc_id") % 2 === 0)
    val wave1 = docs.filter(col("doc_id") % 2 === 1)
    fn(wave0, 0L)
    fn(wave1, 1L)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // streamed custom report ≡ its batch form per wave
    assert(rows(spark.read.parquet(s"$root/gates/b_0")) ===
      rows(DedupStream.gateReport(wave0, "text", "source", gateSet)))
    assert(rows(spark.read.parquet(s"$root/gates/b_1")) ===
      rows(DedupStream.gateReport(wave1, "text", "source", gateSet)))
    assert(spark.read.parquet(s"$root/gates/b_0").columns.toSeq ===
      Seq("source", "n_docs", "avg_quality", "n_langs", "n_emails", "n_phones",
        "n_repetitive", "n_long"))
    // the Gopher column agrees with the standalone q83 projection
    val viaQ83 = wave0
      .select(col("source"),
        (graft.functions.TextFunctions.topTokenCount(
          graft.functions.TextFunctions.tokens(col("text"))) * 10 >
          size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
          .as("rep"))
      .groupBy("source").agg(sum(when(col("rep"), 1).otherwise(0)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.read.parquet(s"$root/gates/b_0")
      .select("source", "n_repetitive").collect()
      .foreach(r => assert(r.getLong(1) === viaQ83(r.getString(0))))
  }

  test("maintain() drives a real checkpointed stream end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("dedup_maintain").toFile.getAbsolutePath
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDS().toDF("doc_id", "text", "source")

    val q = DedupStream.maintain(docs, s"$root/state", s"$root/ckpt",
        gates = Some(DedupStream.GateTap(s"$root/gates")))
      .start()
    try {
      // wave 0: two near-dup docs + one distinct
      input.addData(
        (1L, "alpha beta gamma delta epsilon zeta", "web"),
        (2L, "alpha beta gamma delta epsilon eta", "web"),
        (3L, "completely different content here now", "books"))
      q.processAllAvailable()
      // wave 1: a near-dup of doc 1 arrives later, via the delta path
      input.addData((4L, "alpha beta gamma delta epsilon theta", "web"))
      q.processAllAvailable()
    } finally q.stop()

    // committed state: all four docs indexed, 1-2-4 clustered together
    val (idx, cc) = DedupStream.readState(spark, s"$root/state").get
    assert(idx.count() === 4)
    val roots = cc.select("id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots(2L) == roots(1L) && roots(4L) == roots(1L))
    assert(!roots.get(3L).exists(_ == roots(1L)))
    // per-wave gate reports committed by the same stream
    assert(spark.read.parquet(s"$root/gates/b_0")
      .select("source").as[String].collect().toSet === Set("web", "books"))
    assert(spark.read.parquet(s"$root/gates/b_1").count() === 1L)
  }
}
