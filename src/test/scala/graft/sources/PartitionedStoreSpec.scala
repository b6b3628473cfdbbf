package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned snapshot stores (Iceberg partition specs — the reference
  * partitions every workshop table: clinicdata.sql:51, finance_example.sql:25):
  * identity and hidden `days(ts)` layouts inside each version dir, partition
  * pruning on reads, and manifest-served partition metadata. */
class PartitionedStoreSpec extends SparkSpec {

  test("identity partitioning: hive layout, spec inherited by appends, pruning") {
    import spark.implicits._
    val root = Files.createTempDirectory("pstore_id").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    def batch(tag: String, n: Int) = Seq.tabulate(n)(i =>
      (i.toLong, Seq("eu", "us", "ap")(i % 3), s"$tag$i")).toDF("id", "region", "v")
    t.commitPartitioned(batch("a", 30).coalesce(1), Seq("region"))
    // layout: v=0/region=eu/part-*.parquet
    assert(Files.isDirectory(Paths.get(root, "v=0", "region=eu")))
    assert(t.partitionSpec === Seq("region"))
    // a plain append INHERITS the spec — the whole chain stays partitioned
    t.commit(batch("b", 12).coalesce(1), op = "append")
    assert(Files.isDirectory(Paths.get(root, "v=1", "region=us")))
    assert(t.read().count() === 42)
    // partition pruning on a plain read: Spark's own PartitionFilters
    val plan = t.read().filter(col("region") === "eu")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("region"),
      s"no partition filter in plan:\n$plan")
    // file skipping sees partition values as per-file stats
    val got = t.readWhere(col("region") === "ap")
    assert(got.count() === 14)
    val (kept, total) = t.lastPruneStats
    assert(total === 6L && kept === 2L, s"kept=$kept total=$total")
    // content identical to the unpruned path
    assert(got.as[(Long, String, String)].collect().toSet ===
      t.read().filter(col("region") === "ap")
        .as[(Long, String, String)].collect().toSet)
  }

  test("hidden days(ts) partitioning: readers never see the day column; " +
      "timestamp predicates prune day files") {
    import spark.implicits._
    val root = Files.createTempDirectory("pstore_day").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2025-03-$day%02d $h%02d:30:00")
    val rows = for (d <- 1 to 4; h <- Seq(1, 13)) yield (d * 100L + h, ts(d, h))
    t.commitPartitioned(rows.toDF("id", "event_ts").coalesce(1),
      Seq("days(event_ts)"))
    // hive layout on the HIDDEN derived column; user schema untouched
    assert(Files.isDirectory(Paths.get(root, "v=0", "graft__day=2025-03-02")))
    assert(t.read().columns.toSeq === Seq("id", "event_ts"))
    assert(t.read().count() === 8)
    // a timestamp predicate prunes to the matching day partitions via the
    // manifest's day-range stats (hidden partitioning: the user predicate
    // stays on event_ts — nobody queries graft__day)
    val got = t.readWhere(col("event_ts") >= lit("2025-03-03 00:00:00").cast("timestamp") &&
      col("event_ts") < lit("2025-03-04 00:00:00").cast("timestamp"))
    assert(got.as[(Long, java.sql.Timestamp)].collect().map(_._1).toSet ===
      Set(301L, 313L))
    val (kept, total) = t.lastPruneStats
    assert(total === 4L && kept === 1L, s"kept=$kept total=$total")
    // appends + mutations keep the layout; compaction preserves it too
    t.commit(Seq((501L, ts(1, 5))).toDF("id", "event_ts"), op = "append")
    assert(Files.isDirectory(Paths.get(root, "v=1", "graft__day=2025-03-01")))
    t.updateMor(col("id") === 301L,
      Map("event_ts" -> (col("event_ts") + expr("INTERVAL 1 HOUR"))), "id")
    assert(t.read().count() === 9)
    assert(t.read().filter(col("id") === 301L)
      .select(hour(col("event_ts"))).as[Int].head() === 2)
    t.compact(targetFiles = 1)
    assert(Files.isDirectory(Paths.get(root,
      s"v=${t.currentVersion.get}", "graft__day=2025-03-04")))
    assert(t.read().count() === 9)
    assert(t.read().columns.toSeq.sorted === Seq("event_ts", "id"))
  }

  test("partition-spec evolution: reads keep working, later writes use the new spec") {
    import spark.implicits._
    val root = Files.createTempDirectory("pstore_evolve").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    def batch(tag: String, off: Int, n: Int) = Seq.tabulate(n)(i =>
      ((off + i).toLong, Seq("eu", "us", "ap")(i % 3), s"$tag$i"))
      .toDF("id", "region", "v")
    t.commit(batch("a", 0, 12).coalesce(1))                 // v0: unpartitioned
    t.addPartitionField("region")                           // v1: metadata-only
    assert(t.partitionSpec === Seq("region"))
    // the r12 regression: the partition evolve op persisted in the commit
    // log made every later resolution throw 'bad evolve op' — the table
    // must stay readable immediately after the spec change
    assert(t.read().count() === 12)
    t.commit(batch("b", 100, 6).coalesce(1), op = "append") // v2: new layout
    assert(Files.isDirectory(Paths.get(root, "v=2", "region=eu")))
    assert(t.read().count() === 18)
    // a FRESH instance replays the full log (no cached state to hide a bad op)
    assert(new SnapshotTable(spark, root).read().count() === 18)
    // time travel BEFORE the evolve sees the original table
    assert(t.read(Some(0L)).count() === 12)
    // mixed-layout pruning stays sound: files carry stats from the layout
    // they were written under
    val got = t.readWhere(col("region") === "eu")
    assert(got.count() === t.read().filter(col("region") === "eu").count())
    t.dropPartitionField("region")                          // v3: back to flat
    assert(t.partitionSpec === Nil)
    t.commit(batch("c", 200, 3).coalesce(1), op = "append") // v4: unpartitioned
    assert(!Files.isDirectory(Paths.get(root, "v=4", "region=eu")))
    assert(t.read().count() === 21)
    // the changelog across the spec boundary reports DATA changes only (the
    // two layout-only evolve commits contribute nothing to the diff)
    val ch = t.changes(0L, 4L, "id")
    assert(ch.filter(col("_change_type") === "insert").count() === 9)
    assert(ch.count() === 9)
    // history surfaces the two evolve commits
    assert(t.history().count() === 5)
  }

  test("bucket(N, key) transform: point lookups prune to one bucket file") {
    import spark.implicits._
    val root = Files.createTempDirectory("pstore_bucket").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    val df = Seq.tabulate(400)(i => (i.toLong, s"v$i")).toDF("id", "v")
    t.commitPartitioned(df.coalesce(1), Seq("bucket(8, id)"))
    // hive layout on the HIDDEN bucket column; user schema untouched
    val dirs = Paths.get(root, "v=0").toFile.list()
      .count(_.startsWith("graft__bucket="))
    assert(dirs === 8, s"expected 8 bucket dirs, saw $dirs")
    assert(t.read().columns.toSeq === Seq("id", "v"))
    assert(t.read().count() === 400)
    // a key-equality readWhere derives the bucket conjunct: footer min/max
    // of a hashed key spans everything, so ONLY the transform can prune
    val got = t.readWhere(col("id") === 123L)
    assert(got.as[(Long, String)].collect().toSeq === Seq((123L, "v123")))
    assert(t.lastPruneStats === ((1L, 8L)))
    // IN prunes to at most one file per probed key
    assert(t.readWhere(col("id").isin(5L, 300L)).count() === 2)
    assert(t.lastPruneStats._1 <= 2L)
    // the PLAIN read path prunes the same way (ManifestFileIndex)
    SnapshotTable.resetScanStats(root)
    assert(t.read().filter(col("id") === 42L).count() === 1)
    assert(SnapshotTable.scanStats(root) === ((1L, 8L)))
    // appends inherit the bucket layout and the lookup stays pruned
    t.commit(Seq((1000L, "x")).toDF("id", "v"), op = "append")
    SnapshotTable.resetScanStats(root)
    assert(t.read().filter(col("id") === 1000L).count() === 1)
    val (k2, total2) = SnapshotTable.scanStats(root)
    assert(total2 === 9L && k2 <= 2L, s"kept=$k2 total=$total2")
    // results ≡ unpruned, wrong-bucket probes return empty not wrong
    assert(t.read().filter(col("id") === 9999L).count() === 0)
  }

  test("truncate(W, col) transform clusters; ranges prune via tight footers") {
    import spark.implicits._
    val root = Files.createTempDirectory("pstore_trunc").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commitPartitioned(Seq.tabulate(300)(i => (i.toLong, s"n$i"))
      .toDF("id", "v").coalesce(1), Seq("truncate(100, id)"))
    val dirs = Paths.get(root, "v=0").toFile.list()
      .count(_.startsWith("graft__trunc="))
    assert(dirs === 3, s"expected 3 truncation dirs, saw $dirs")
    assert(t.read().columns.toSeq === Seq("id", "v"))
    assert(t.read().count() === 300)
    // truncation is ORDER-PRESERVING: each file's footer id-range is tight,
    // so a range predicate prunes with no transform-aware logic at all
    SnapshotTable.resetScanStats(root)
    assert(t.read().filter(col("id").between(120L, 130L)).count() === 11)
    assert(SnapshotTable.scanStats(root) === ((1L, 3L)))
    // string truncation: W-char prefixes cluster lexicographic ranges
    val r2 = Files.createTempDirectory("pstore_truncs").toFile.getAbsolutePath
    val t2 = new SnapshotTable(spark, r2)
    t2.commitPartitioned(Seq("alpha", "amber", "beta", "bravo", "gamma")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
      .coalesce(1), Seq("truncate(1, w)"))
    SnapshotTable.resetScanStats(r2)
    assert(t2.read().filter(col("w") >= "b" && col("w") < "c").count() === 2)
    assert(SnapshotTable.scanStats(r2) === ((1L, 3L)))
  }

  test("table_partitions serves partition-grain rows from manifests, zero footer reads") {
    import spark.implicits._
    val root = Files.createTempDirectory("pstore_meta").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commitPartitioned(Seq.tabulate(20)(i =>
      (i.toLong, if (i % 2 == 0) "eu" else "us")).toDF("id", "region")
      .coalesce(1), Seq("region"))
    t.commit(Seq((100L, "eu")).toDF("id", "region"), op = "append")
    spark.conf.set("graft.snapshot.parts.demo", root)
    val before = MetadataFunctions.footerReads.get()
    val parts = MetadataFunctions.tablePartitions(spark, "parts.demo")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(MetadataFunctions.footerReads.get() === before,
      "partition metadata must come from manifests, not footer opens")
    assert(parts === List(("region=eu", 2L, 11L), ("region=us", 1L, 10L)))
    // snapshot metadata resolves the versioned root THROUGH partition dirs
    t.read().createOrReplaceTempView("pstore_meta_view")
    assert(MetadataFunctions.tableSnapshot(spark, "pstore_meta_view")
      .count() === 2)
  }
}
