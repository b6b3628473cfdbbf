package graft.sources

import java.nio.file.{Files => JFiles, Paths => JPaths}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the r16 commit-record ledger and claim arbiter: the
  * shared log CACHE on scheme'd roots may be arbitrarily stale — any
  * subset of its lines lost, in any order — and every reader-visible view
  * must be invariant, because the per-version records are the commit
  * points. The arbiter must arbitrate exactly one winner per (root,
  * version) under full thread contention. */
class LedgerPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: ANY subset of log-cache lines may be lost (any order) — " +
      "history, content, and the next claim are invariant") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = JFiles.createTempDirectory("ledger_prop").toFile.getAbsolutePath
    val root = s"graftfs://$local"
    val t = new SnapshotTable(spark, root)
    t.commit(Seq.tabulate(30)(i => (i.toLong, s"v$i")).toDF("id", "v"))  // v0
    (1 to 4).foreach { w =>                                              // v1..v4
      t.commit(Seq.tabulate(5)(i => ((w * 100 + i).toLong, s"w$w"))
        .toDF("id", "v"), op = "append")
    }
    t.deleteWhereMor(col("id") < 3L, "id")                               // v5
    val cachePath = JPaths.get(local, "_graft_meta.jsonl")
    val fullCache = JFiles.readString(cachePath)
    val lines = fullCache.linesIterator.toSeq
    assert(lines.size === 6)
    val expectHistory = t.history().select("version", "operation", "row_count")
      .as[(Long, String, Long)].collect().toSet
    val expectRows = t.read().select("id").as[Long].collect().sorted

    val subsetGen = Gen.someOf(lines.indices).flatMap(keep =>
      Gen.oneOf(true, false).map(shuffle => (keep.toSet, shuffle)))
    samples(subsetGen, 12).foreach { case (keep, shuffle) =>
      val kept = lines.zipWithIndex.collect { case (l, i) if keep(i) => l }
      val arranged = if (shuffle) kept.reverse else kept
      JFiles.writeString(cachePath,
        if (arranged.isEmpty) "" else arranged.mkString("", "\n", "\n"))
      val fresh = new SnapshotTable(spark, root)
      assert(fresh.history().select("version", "operation", "row_count")
        .as[(Long, String, Long)].collect().toSet === expectHistory,
        s"history drifted for kept=$keep shuffled=$shuffle")
      assert(fresh.read().select("id").as[Long].collect().sorted === expectRows,
        s"content drifted for kept=$keep shuffled=$shuffle")
    }

    // even with the cache GONE, the next commit claims PAST the ledger head
    JFiles.deleteIfExists(cachePath)
    val next = new SnapshotTable(spark, root)
      .commit(Seq((9999L, "post")).toDF("id", "v"), op = "append")
    assert(next === 6L, s"claim did not resume past the ledger head: $next")
    assert(new SnapshotTable(spark, root).read().count() === expectRows.length + 1)
  }

  test("property: the claim arbiter admits exactly ONE winner per version " +
      "under full contention, and release makes a version reclaimable") {
    val arb = new SnapshotTable.InProcessClaimArbiter
    // 32 threads race every version: one winner each, ever
    (0 until 50).foreach { v =>
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 32).map(_ => new Thread(() =>
        if (arb.tryClaim("r", v.toLong)) wins.incrementAndGet()))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(wins.get() === 1, s"version $v had ${wins.get()} winners")
    }
    assert(arb.maxClaimed("r") === 49L)
    // release → reclaimable exactly once again
    arb.release("r", 49L)
    assert(arb.maxClaimed("r") === 48L)
    assert(arb.tryClaim("r", 49L) && !arb.tryClaim("r", 49L))
    // roots are independent namespaces
    assert(arb.maxClaimed("other") === -1L)
    assert(arb.tryClaim("other", 7L))
    assert(arb.maxClaimed("other") === 7L)
  }
}
