package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sort-order-aware compaction (Iceberg's rewrite_data_files sort/zorder
  * strategies): compacting a store with a declared write order re-CLUSTERS
  * the rewrite, so healing never destroys the manifest min/max tightness
  * file skipping depends on — and a zorder(…) order keeps EVERY clustering
  * column's per-file ranges tight, not just the leading one. */
class SortedCompactionSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int) =
    Seq.tabulate(n)(i => (i.toLong, s"text-$i", (i % 7).toLong))
      .toDF("id", "text", "n")

  test("compactSorted re-clusters an unclustered chain: pruning goes from " +
      "scan-everything to 1-of-N; analyze stays quiet afterwards") {
    val root = Files.createTempDirectory("sorted_cmp").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commit(docs(500).repartition(2))                   // unclustered base
    (1 to 6).foreach { w =>                              // full-range waves
      t.commit(docs(500).filter(col("id") % 7 === w.toLong).coalesce(1),
        op = "append")
    }
    val expected = t.read().select("id").as[Long].collect().sorted
    t.readWhere(col("id") < 5L).count()
    val (keptB, totalB) = t.lastPruneStats
    assert(totalB === 8L && keptB > totalB / 2,
      s"unclustered chain should scan most files: $keptB/$totalB")

    t.compactSorted(targetFiles = 8, order = Seq("id"))
    assert(t.read().select("id").as[Long].collect().sorted === expected)
    assert(t.readWhere(col("id") < 5L).select("id").as[Long].collect().sorted
      === expected.filter(_ < 5L))
    val (keptA, totalA) = t.lastPruneStats
    assert(totalA === 8L && keptA === 1L,
      s"sorted rewrite should prune to one range file: $keptA/$totalA")

    // the pinned layout is healthy — a maintenance tick must NOT re-rewrite
    assert(TableMaintenance.analyze(spark, root).isEmpty,
      "a store at its pinned sorted layout re-flagged as small-files")
  }

  test("zorder compaction keeps per-file ranges tight on EVERY clustering " +
      "column — predicates on either column prune") {
    val root = Files.createTempDirectory("zorder_cmp").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"),
        (col("id") % 5).as("payload"))
    t.commit(grid.repartition(4))                        // unclustered
    t.readWhere(col("x") < 8L && col("y") < 8L).count()
    val (keptB, totalB) = t.lastPruneStats
    assert(keptB === totalB, s"unclustered grid cannot prune: $keptB/$totalB")

    t.compactSorted(targetFiles = 16, order = Seq("zorder(x, y)"))
    val sel = t.readWhere(col("x") < 8L && col("y") < 8L)
    assert(sel.count() === 64L)
    val (keptA, totalA) = t.lastPruneStats
    assert(totalA === 16L && keptA <= totalA / 4,
      s"z-order should confine a 1/64-space predicate to few files: $keptA/$totalA")

    // the NON-leading dimension prunes too — the property a linear sort on
    // x alone cannot give
    t.readWhere(col("y") < 8L).count()
    val (keptY, totalY) = t.lastPruneStats
    assert(keptY < totalY, s"y-only predicate should prune z-ordered files: " +
      s"$keptY/$totalY")
  }

  test("an order whose column schema evolution removed falls back to " +
      "bin-packing — compaction keeps file-count control") {
    val root = Files.createTempDirectory("sorted_gone").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.setSortOrder(Seq("id"), files = 4)
    t.commit(docs(200))
    t.renameColumn("id", "doc_key") // the declared order now names nothing
    val expected = t.read().count()
    t.compact(targetFiles = 2)
    assert(t.read().count() === expected)
    val (perDir, _) = t.layoutStats()
    assert(perDir.size === 1 && perDir.head._2.size <= 2,
      s"fallback bin-pack lost file-count control: ${perDir.map(_._2.size)}")
  }

  test("maintain inherits the declared order: the autonomous tick heals the " +
      "chain WITHOUT destroying clustering") {
    val root = Files.createTempDirectory("maint_sorted").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.setSortOrder(Seq("id"), files = 4)
    t.commit(docs(400))                                  // 4 range files
    (1 to 9).foreach { w =>
      t.commit(docs(400).filter(col("id") % 11 === w.toLong).coalesce(1),
        op = "append")
    }
    val expected = t.read().count()
    assert(TableMaintenance.maintain(spark, root).isDefined)
    val t2 = new SnapshotTable(spark, root)
    assert(t2.read().count() === expected)
    t2.readWhere(col("id") < 5L).count()
    val (kept, total) = t2.lastPruneStats
    assert(total === 4L && kept === 1L,
      s"maintenance rewrite lost the declared clustering: $kept/$total")
    assert(TableMaintenance.analyze(spark, root).isEmpty, "tick not idempotent")
  }
}
