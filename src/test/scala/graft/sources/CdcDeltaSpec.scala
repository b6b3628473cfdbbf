package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** O(delta) CDC for merge-on-read commits ([[SnapshotTable.changesFromCommit]]):
  * change rows derive from the commit's OWN delete/replacement files —
  * pre-images from a PRUNED semi-joined read of the previous snapshot,
  * post-images from the commit's dir — and must be row-identical to the
  * full two-snapshot [[SnapshotTable.changes]] diff in every mode. */
class CdcDeltaSpec extends SparkSpec {

  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))

  private def docs(n: Int) =
    Seq.tabulate(n)(i => (i.toLong, s"text-$i", (i % 7).toLong))
      .toDF("id", "text", "n")

  test("updateMor / deleteWhereMor / deleteWherePos / mergeIntoMor change " +
      "rows equal the full-snapshot diff, keyed and keyless") {
    val root = Files.createTempDirectory("cdcdelta_eq").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commit(docs(100))                                                    // v0
    t.updateMor(col("id") < 5L, Map("n" -> (col("n") + 100L)), "id")       // v1
    t.deleteWhereMor(col("id") >= 90L, "id")                               // v2
    t.deleteWherePos(col("id") === 50L)                                    // v3
    t.mergeIntoMor(
      Seq((10L, "merged-10", 999L), (200L, "merged-200", 999L)).toDF("id", "text", "n"),
      "id",
      matched = Seq((None, Some(Map("text" -> lit("M"), "n" -> lit(999L))))),
      notMatched = Seq((None, None)))                                      // v4
    (1L to 4L).foreach { v =>
      val fastKeyed = t.changesFromCommit(v, Seq("id"))
      assert(fastKeyed.isDefined, s"v=$v should take the commit-derived path")
      assert(sortedRows(fastKeyed.get) === sortedRows(t.changes(v - 1, v, "id")),
        s"keyed fast path diverges at v=$v")
      val fastKeyless = t.changesFromCommit(v, Nil)
      assert(sortedRows(fastKeyless.get) === sortedRows(t.changes(v - 1, v)),
        s"keyless fast path diverges at v=$v")
    }
    // cow commits have no delta representation: the fast path declines
    t.update(col("id") === 7L, Map("n" -> lit(0L)))                        // v5
    assert(t.changesFromCommit(5L, Seq("id")).isEmpty)
    assert(sortedRows(t.changesForCommit(5L, Seq("id")))
      === sortedRows(t.changes(4L, 5L, "id")), "changesForCommit fallback")
  }

  test("the pre-image read PRUNES via inlined key conjuncts: a mor update " +
      "on a range-clustered base scans the matching files only") {
    val root = Files.createTempDirectory("cdcdelta_prune").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.setSortOrder(Seq("id"), files = 8)
    t.commit(docs(400))                                                    // v0: 8 range files
    assert(new java.io.File(s"$root/v=0").listFiles()
      .count(f => f.getName.endsWith(".parquet")) === 8)
    t.updateMor(col("id") < 3L, Map("n" -> lit(555L)), "id")               // v1
    val fast = t.changesForCommit(1L, Seq("id"))
    val (kept, total) = t.lastPruneStats
    assert(total >= 8L && kept < total,
      s"pre-image scan should prune the clustered base: $kept/$total")
    assert(sortedRows(fast) === sortedRows(t.changes(0L, 1L, "id")))
    // ids 0-2 live in ONE of the 8 disjoint ranges
    assert(kept <= total - 7L, s"expected ~1 of 8 base files, got $kept/$total")
  }

  test("a claimed-key set past the inline bound still derives (unpruned " +
      "one-pass scan), identical rows") {
    val root = Files.createTempDirectory("cdcdelta_big").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commit(docs(3000))                                                   // v0
    t.deleteWhereMor(col("id") % 2 === 0L, "id")  // 1500 keys > inline bound
    val fast = t.changesFromCommit(1L, Seq("id"))
    assert(fast.isDefined)
    assert(fast.get.count() === 1500L)
    assert(sortedRows(fast.get) === sortedRows(t.changes(0L, 1L, "id")))
  }
}
