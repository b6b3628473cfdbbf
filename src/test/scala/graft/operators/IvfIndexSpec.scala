package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotTable

/** The persisted IVF ANN index: standing state in a snapshot store, served
  * with per-query cell probing + file skipping, maintained O(delta) per
  * ingest wave with a metadata-only retrain policy — the q92 dedup-index
  * pattern applied to similarity search. */
class IvfIndexSpec extends SparkSpec {

  private val Dim = 8

  /** Deterministic pseudo-random unit-ish vectors around 4 cluster
    * directions — clusterable (IVF pruning has signal) but fully seeded. */
  private def wave(n: Int, idOffset: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(idOffset + 7)
    (0 until n).map { i =>
      val center = Array.tabulate(Dim)(d =>
        if (d % 4 == i % 4) 1.0 else 0.0)
      val v = center.map(_ + rnd.nextGaussian() * 0.3)
      (idOffset + i, v.toSeq)
    }.toDF("id", "vec")
  }

  private def newRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toFile.getAbsolutePath

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("probe-all serve from the standing index equals exact brute force") {
    val root = newRoot("ivfidx_exact")
    val corpus = wave(120, 0)
    val queries = corpus.filter(col("id") < 6)
    IvfIndex.build(corpus, root, "id", "vec", nCells = 8)
    val served = IvfIndex.topK(spark, root, queries, "id", "vec", k = 5, nprobe = 8)
    val exact = Similarity.bruteForceTopK(corpus, queries, "id", "vec", k = 5)
    assert(sortedRows(served) === sortedRows(exact))
  }

  test("a pruned serve reads ONLY the probed cells' files") {
    val root = newRoot("ivfidx_prune")
    IvfIndex.build(wave(200, 0), root, "id", "vec", nCells = 8)
    val oneQuery = wave(200, 0).filter(col("id") === 0L)
    val got = IvfIndex.topK(spark, root, oneQuery, "id", "vec", k = 3, nprobe = 2)
    assert(got.count() > 0)
    val (kept, total) = IvfIndex.lastPruneStats
    assert(total === 8L, s"one file per cell expected: $kept/$total")
    assert(kept <= 2L, s"nprobe=2 must read at most 2 of 8 cell files: $kept/$total")
  }

  test("two-wave incremental append: O(delta) commit, no row lost or " +
      "duplicated, exactness preserved over the union") {
    import spark.implicits._
    val root = newRoot("ivfidx_incr")
    val w1 = wave(100, 0)
    val w2 = wave(60, 1000)
    IvfIndex.build(w1, root, "id", "vec", nCells = 8)
    IvfIndex.append(w2, root, "id", "vec")

    val st = new SnapshotTable(spark, root)
    // the delta commit is an APPEND holding only wave 2 (O(delta)): the log
    // records the running total, and the chain is base + one delta dir
    val hist = st.history().select("operation", "row_count")
      .as[(String, Long)].collect()
    assert(hist.map(_._1).toSeq === Seq("overwrite", "append"))
    assert(hist.last._2 === 160L)
    // index content: every id exactly once
    val ids = st.read().select("id").as[Long].collect().sorted
    assert(ids === (w1.select("id").as[Long].collect() ++
      w2.select("id").as[Long].collect()).sorted)
    assert(ids.distinct.length === ids.length)

    // exactness invariant survives the wave: probe-all == brute force on
    // the UNION corpus, including cross-wave neighbors
    val union = w1.unionByName(w2)
    val queries = union.filter(col("id") < 3 || col("id") >= 1057)
    val served = IvfIndex.topK(spark, root, queries, "id", "vec", k = 5, nprobe = 8)
    val exact = Similarity.bruteForceTopK(union, queries, "id", "vec", k = 5)
    assert(sortedRows(served) === sortedRows(exact))

    // and the pruned path still skips files across the chain (base files +
    // delta files per cell — probing 2 cells reads at most 2 of each)
    IvfIndex.topK(spark, root, union.filter(col("id") === 0L),
      "id", "vec", k = 3, nprobe = 2).count()
    val (kept, total) = IvfIndex.lastPruneStats
    assert(total === 16L, s"8 base + 8 delta cell files expected: $kept/$total")
    assert(kept <= 4L, s"nprobe=2 must read at most 2+2 files: $kept/$total")
  }

  test("a rebuild racing an ingest wave is head-validated: the wave is " +
      "never silently erased from the index") {
    val root = newRoot("ivfidx_race")
    IvfIndex.build(wave(100, 0), root, "id", "vec", nCells = 8)
    IvfIndex.append(wave(80, 5000), root, "id", "vec")

    // inject a concurrent ingest wave into the rebuild's window (between
    // its centroid commit and its assignment overwrite): the head moved,
    // so the overwrite must CONFLICT rather than erase the wave
    @volatile var injected = false
    IvfIndex.beforeAssignCommit = () =>
      if (!injected) {
        injected = true
        IvfIndex.append(wave(10, 9000), root, "id", "vec")
      }
    try
      intercept[graft.sources.SnapshotTable.CommitConflictException] {
        IvfIndex.maintain(spark, root, retrainShare = 0.5, nCells = 8)
      }
    finally IvfIndex.beforeAssignCommit = () => ()
    assert(injected)

    // nothing lost; the retry (next tick) lands the rebuild over ALL rows
    val st = new graft.sources.SnapshotTable(spark, root)
    assert(st.read().count() === 190)
    assert(IvfIndex.maintain(spark, root, retrainShare = 0.5, nCells = 8).nonEmpty)
    assert(new graft.sources.SnapshotTable(spark, root).read().count() === 190)
  }

  test("a half-landed rebuild (crash between the centroid and assignment " +
      "commits) never mispairs a serve: the standing generation keeps serving") {
    val root = newRoot("ivfidx_crash")
    val corpus = wave(120, 0)
    IvfIndex.build(corpus, root, "id", "vec", nCells = 8)
    IvfIndex.append(wave(80, 5000), root, "id", "vec")

    // crash the rebuild AFTER its centroid generation lands but BEFORE the
    // assignment commit — the classic torn two-store write
    IvfIndex.beforeAssignCommit =
      () => throw new RuntimeException("injected crash")
    try
      intercept[RuntimeException] {
        IvfIndex.maintain(spark, root, retrainShare = 0.5, nCells = 8)
      }
    finally IvfIndex.beforeAssignCommit = () => ()

    // the serve pairs by the generation the STANDING assignment references,
    // not the centroid head: probe-all still equals exact brute force
    val union = corpus.unionByName(wave(80, 5000))
    val queries = union.filter(col("id") < 4)
    assert(sortedRows(IvfIndex.topK(spark, root, queries, "id", "vec",
        k = 5, nprobe = 8))
      === sortedRows(Similarity.bruteForceTopK(union, queries, "id", "vec", k = 5)))
    // and O(delta) appends keep pairing with the standing generation too
    IvfIndex.append(wave(10, 9000), root, "id", "vec")
    assert(new graft.sources.SnapshotTable(spark, root).read().count() === 210)
  }

  test("maintain: metadata-only drift policy retrains past the threshold, " +
      "not below it, and the rebuild folds the chain") {
    import spark.implicits._
    val root = newRoot("ivfidx_maint")
    IvfIndex.build(wave(100, 0), root, "id", "vec", nCells = 8)
    IvfIndex.append(wave(10, 5000), root, "id", "vec")
    // 10% drift < 50% threshold: healthy, nothing rewritten
    assert(IvfIndex.maintain(spark, root, retrainShare = 0.5, nCells = 8).isEmpty)

    IvfIndex.append(wave(80, 6000), root, "id", "vec")
    // 90/100 appended since training: retrain + reassign as one new base
    val rebuilt = IvfIndex.maintain(spark, root, retrainShare = 0.5, nCells = 8)
    assert(rebuilt.nonEmpty)
    val st = new SnapshotTable(spark, root)
    assert(st.history().select("operation").as[String].collect().last
      === "overwrite")
    assert(st.read().count() === 190)

    // post-rebuild: exactness and single-chain pruning both hold
    val union = wave(100, 0).unionByName(wave(10, 5000)).unionByName(wave(80, 6000))
    val queries = union.filter(col("id") < 4)
    val served = IvfIndex.topK(spark, root, queries, "id", "vec", k = 5, nprobe = 8)
    val exact = Similarity.bruteForceTopK(union, queries, "id", "vec", k = 5)
    assert(sortedRows(served) === sortedRows(exact))
    IvfIndex.topK(spark, root, union.filter(col("id") === 0L),
      "id", "vec", k = 3, nprobe = 2).count()
    val (kept, total) = IvfIndex.lastPruneStats
    assert(total === 8L, s"the rebuild should fold to one file per cell: $kept/$total")
    assert(kept <= 2L, s"nprobe=2 over the folded base: $kept/$total")

    // LIFECYCLE GC folded into maintain: the superseded pre-rebuild
    // assignment snapshots are expired (standing chain only) and the
    // centroid store holds ONLY the generation the standing assignment
    // references — generations do not accrue per retrain
    assert(new SnapshotTable(spark, root).history().count() === 1L,
      "pre-rebuild assignment snapshots should be expired by maintain")
    val cgens = new SnapshotTable(spark, s"$root/_graft_ivf_centroids")
      .read().select("gen").distinct().count()
    assert(cgens === 1L, s"unreferenced centroid generations survived: $cgens")
  }

  test("gc drops unreferenced centroid generations and expired assignment " +
      "versions while the standing generation keeps serving exactly") {
    import spark.implicits._
    val root = newRoot("ivfidx_gc")
    val w1 = wave(100, 0)
    IvfIndex.build(w1, root, "id", "vec", nCells = 8)
    // a crashed rebuild's debris: a centroid generation no assignment
    // references (the documented harmless leak — until GC collects it)
    new SnapshotTable(spark, s"$root/_graft_ivf_centroids").commit(
      Seq.tabulate(8)(i => ("deadbeef", i, Seq.fill(Dim)(0.5))).toDF("gen", "cell", "vec"),
      op = "append")
    // plus real history: an append wave, then a full rebuild
    IvfIndex.append(wave(60, 1000), root, "id", "vec")
    IvfIndex.build(w1.unionByName(wave(60, 1000)), root, "id", "vec", nCells = 8)

    val cst = new SnapshotTable(spark, s"$root/_graft_ivf_centroids")
    assert(cst.read().select("gen").distinct().count() >= 3L,
      "fixture should hold debris + superseded + standing generations")
    val (droppedGens, expired) = IvfIndex.gc(spark, root)
    assert(droppedGens >= 2, s"dropped $droppedGens generations")
    assert(expired >= 1, s"expired $expired assignment versions")
    assert(new SnapshotTable(spark, s"$root/_graft_ivf_centroids")
      .read().select("gen").distinct().count() === 1L)
    assert(new SnapshotTable(spark, root).history().count() === 1L)

    // serve unaffected: probe-all equals brute force after GC
    val union = w1.unionByName(wave(60, 1000))
    val queries = union.filter(col("id") < 4)
    val served = IvfIndex.topK(spark, root, queries, "id", "vec", k = 5, nprobe = 8)
    val exact = Similarity.bruteForceTopK(union, queries, "id", "vec", k = 5)
    assert(sortedRows(served) === sortedRows(exact))
    // idempotent: a second pass finds nothing dead
    assert(IvfIndex.gc(spark, root) === ((0, 0)))
  }
}
