package graft.sources

import java.nio.file.{Files => JFiles, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Optimistic-concurrency commit protocol (Iceberg's atomic-swap contract,
  * SURVEY §3.1 step 5): versions are claimed by create-exclusive marker
  * files, so concurrent writers always land DISTINCT versions; operations
  * that derived their data from a snapshot read raise
  * [[SnapshotTable.CommitConflictException]] when the head moved under them. */
class CommitConcurrencySpec extends SparkSpec {

  test("a version claimed by a foreign writer is never reused (no lost update)") {
    import spark.implicits._
    val root = JFiles.createTempDirectory("occ_claim").toFile.getAbsolutePath
    val a = new SnapshotTable(spark, root)
    a.commit(Seq((1L, "a")).toDF("id", "v")) // v0
    // a second process has CLAIMED v1 (its marker exists, its log line is
    // still in flight) — our commit must skip to v2, never steal v1's dir
    JFiles.createFile(Paths.get(root, "_graft_commits", "v=1"))
    val va = a.commit(Seq((2L, "b")).toDF("id", "v"), op = "append")
    assert(va === 2L)
    assert(a.read().count() === 2)
    // the foreign writer's line lands late: out-of-order log lines are
    // sorted by version at read, and its version is exactly the claimed one
    Seq((99L, "z")).toDF("id", "v").write.parquet(s"$root/v=1")
    JFiles.writeString(Paths.get(root, "_graft_meta.jsonl"),
      s"1,${System.currentTimeMillis()},append,1\n",
      java.nio.file.StandardOpenOption.APPEND)
    val fresh = new SnapshotTable(spark, root)
    assert(fresh.history().orderBy("version").collect().map(_.getLong(0)).toSeq
      === Seq(0L, 1L, 2L))
  }

  test("a read-dependent commit raises CommitConflictException on a moved head") {
    import spark.implicits._
    val root = JFiles.createTempDirectory("occ_conflict").toFile.getAbsolutePath
    val a = new SnapshotTable(spark, root)
    val b = new SnapshotTable(spark, root)
    a.commit(Seq.tabulate(10)(i => (i.toLong, s"v$i")).toDF("id", "v")) // v0
    // writer A plans a cow mutation against head v0 …
    val planned = a.currentVersion
    val survivors = a.read().filter(col("id") >= 5L)
    // … but writer B commits first
    b.commit(Seq((100L, "x")).toDF("id", "v"), op = "append")
    val ex = intercept[SnapshotTable.CommitConflictException](
      a.commit(survivors, "cow-delete", Some(planned)))
    assert(ex.getMessage.contains("re-read and retry"))
    // nothing landed: the table still has B's state, and a retry that
    // re-reads succeeds (the Iceberg retry loop)
    assert(a.history().count() === 2)
    assert(a.read().count() === 11)
    a.deleteWhere(col("id") < 5L) // fresh read → fresh expected head → ok
    assert(a.read().count() === 6)
    // plain appends never conflict (they commute), even with a stale view
    val vA = a.commit(Seq((200L, "y")).toDF("id", "v"), op = "append")
    assert(vA === a.currentVersion.get)
    assert(a.read().count() === 7)
  }

  test("a writer landing during the write window conflicts AND the lost " +
      "claim is fully released (no orphaned marker/dir/manifest)") {
    import spark.implicits._
    val root = JFiles.createTempDirectory("occ_window").toFile.getAbsolutePath
    val a = new SnapshotTable(spark, root)
    a.commit(Seq.tabulate(10)(i => (i.toLong, s"v$i")).toDF("id", "v")) // v0
    // a cross-process writer commits DURING a's write window — between a's
    // data write and its final head validation. The test seam injects it on
    // the same thread (withRootLock is reentrant there), exactly where a
    // foreign process would slip past the in-JVM lock.
    a.beforeFinalHeadCheck = () => {
      a.beforeFinalHeadCheck = () => () // fire once
      new SnapshotTable(spark, root)
        .commit(Seq((100L, "x")).toDF("id", "v"), op = "append")
    }
    intercept[SnapshotTable.CommitConflictException](
      a.deleteWhereMor(col("id") < 3L, "id"))
    // a claimed v1; the foreign writer claimed v2. The lost claim must be
    // fully released: marker, data dir and manifest all gone (nothing for
    // maintenance to ever orphan-collect), and the claim number is free.
    assert(!JFiles.exists(Paths.get(root, "v=1")), "conflicted data dir leaked")
    assert(!JFiles.exists(Paths.get(root, "_graft_commits", "v=1")),
      "conflicted claim marker leaked")
    assert(!JFiles.exists(Paths.get(root, "_graft_manifest", "v=1.tsv")),
      "conflicted manifest leaked")
    val fresh = new SnapshotTable(spark, root)
    assert(fresh.read().count() === 11)
    // the standard Iceberg retry: re-read, re-derive, commit clean
    fresh.deleteWhereMor(col("id") < 3L, "id")
    assert(fresh.read().count() === 8)
    assert(fresh.history().orderBy("version").collect().map(_.getLong(0)).toSeq
      === Seq(0L, 2L, 3L))
  }

  test("concurrent threaded appends all land with distinct versions") {
    import spark.implicits._
    val root = JFiles.createTempDirectory("occ_threads").toFile.getAbsolutePath
    new SnapshotTable(spark, root).commit(Seq((0L, "seed")).toDF("id", "v"))
    val versions = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val threads = (1 to 6).map { k =>
      new Thread(() => {
        val t = new SnapshotTable(spark, root) // each writer its own instance
        versions.add(t.commit(
          Seq((k.toLong, s"w$k")).toDF("id", "v"), op = "append"))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(versions.asScala.size === 6, "every append landed a distinct version")
    val t = new SnapshotTable(spark, root)
    assert(t.read().count() === 7)
    assert(t.history().count() === 7)
    // the commit log's cumulative row counts are consistent at the head
    assert(t.history().orderBy("version").collect().last.getLong(3) === 7L)
  }

  test("a claim on a SPENT version number (marker self-GC'd after logging) " +
      "re-validates against the log and moves past it") {
    import spark.implicits._
    val root = JFiles.createTempDirectory("occ_respent").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commit(Seq((0L, "seed")).toDF("id", "v"))                 // v0
    t.commit(Seq((1L, "a")).toDF("id", "v"), op = "append")     // v1
    // simulate the race the marker self-GC opens: our writer read the log
    // (head v1), a FOREIGN process then logs v2 and GC's its own marker —
    // so our create-exclusive on marker v=2 SUCCEEDS even though v2 is
    // spent. The post-create re-validation must release it and move on.
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    t.afterMarkerClaim = { claimed =>
      if (fired.getAndIncrement() == 0) {
        assert(claimed === 2L, s"expected first claim on spent v2, got $claimed")
        // the foreign commit: a metadata-only pointer line (resolvable) with
        // its marker already self-GC'd — appended directly, as another
        // process would
        JFiles.writeString(Paths.get(root, "_graft_meta.jsonl"),
          s"2,${System.currentTimeMillis()},asof:0:foreign,1\n",
          java.nio.file.StandardOpenOption.APPEND)
      }
    }
    val mine = t.commit(Seq((2L, "b")).toDF("id", "v"), op = "append")
    t.afterMarkerClaim = _ => ()
    assert(fired.get() >= 2, "the claim loop must have retried after the release")
    assert(mine === 3L, s"spent v2 must not be kept; landed $mine")
    // the spent number's marker was released, ours self-GC'd after logging
    assert(Option(Paths.get(root, "_graft_commits").toFile.list())
      .map(_.toSeq).getOrElse(Nil) === Nil)
    // nothing was lost: the foreign pointer (a rollback to v0's 1-row
    // content) resolves as the base under our append — 2 rows at head
    val fresh = new SnapshotTable(spark, root)
    assert(fresh.read().as[(Long, String)].collect().toSet ===
      Set((0L, "seed"), (2L, "b")))
    assert(fresh.currentVersion === Some(3L))
    assert(fresh.read(Some(2L)).count() === 1) // the foreign asof:0 pointer
  }
}
