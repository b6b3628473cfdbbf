package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotTableSpec extends SparkSpec {

  test("commit / read latest / VERSION AS OF / history / append") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    val v0 = t.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val v1 = t.commit(Seq((1, "a2"), (2, "b"), (3, "c")).toDF("id", "v"))
    assert(v0 === 0L && v1 === 1L)
    assert(t.read().count() === 3)                       // latest
    assert(t.read(Some(0L)).count() === 2)               // VERSION AS OF 0
    val v2 = t.commit(Seq((4, "d")).toDF("id", "v"), op = "append")
    assert(t.read(Some(v2)).count() === 4)
    val h = t.history().collect()
    assert(h.length === 3)
    assert(h.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    assert(h.map(_.getString(2)).toSeq === Seq("overwrite", "overwrite", "append"))
    // TIMESTAMP AS OF: at the first commit's timestamp → v0 content
    val t0 = h(0).getLong(1)
    assert(t.readAsOfTimestamp(t0).count() === 2)
  }

  test("expireSnapshots drops old versions; compact rewrites files") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap2").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    (1 to 4).foreach(i => t.commit(Seq.tabulate(i * 10)(j => (j, s"r$j")).toDF("id", "v")))
    val expired = t.expireSnapshots(keep = 2)
    assert(expired === Seq(0L, 1L))
    assert(t.history().count() === 2)
    assert(t.read().count() === 40)
    intercept[Exception](t.read(Some(0L)).count()) // expired version is gone
    val cv = t.compact(targetFiles = 1)
    assert(t.read(Some(cv)).count() === 40)
    assert(t.history().filter(col("operation") === "compact").count() === 1)
  }

  test("append with evolved schema widens columns and null-fills history") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap3").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commit(Seq((1, "a")).toDF("id", "v"))
    // evolved: new column `score`, and `v` missing entirely
    t.commit(Seq((2, 0.9)).toDF("id", "score"), op = "append")
    val latest = t.read()
    assert(latest.columns.toSet === Set("id", "v", "score"))
    val rows = latest.orderBy("id").collect()
    assert(rows(0).getString(1) === "a" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) === 0.9)
    // time travel still returns the ORIGINAL schema for the old version
    assert(t.read(Some(0L)).columns.toSet === Set("id", "v"))
  }
}
