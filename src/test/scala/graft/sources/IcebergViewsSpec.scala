package graft.sources

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Iceberg VIEW spec interchange: public view metadata round-trips,
  * create-or-replace versions the definition, and historical versions
  * time-travel — the semantic-layer handoff direction. */
class IcebergViewsSpec extends SparkSpec {

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ==
      b.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("view metadata round-trips with the spec's required fields, " +
      "replace appends a VERSION (definition time travel), identical " +
      "re-export is a no-op, and table/view chains refuse crosswise") {
    import spark.implicits._
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "g")
      .createOrReplaceTempView("icev_src")
    val dir = JFiles.createTempDirectory("icev_view").toFile.getAbsolutePath
    val sql1 = "SELECT g, count(*) AS n FROM icev_src GROUP BY g"
    assert(IcebergViews.exportView(spark, dir, sql1) === 1)
    // idempotent: the same current SQL mints no new version
    assert(IcebergViews.exportView(spark, dir, sql1) === 1)
    assert(IcebergViews.versionIds(spark, dir) === Seq(1))

    val meta = org.json4s.jackson.JsonMethods.parse(JFiles.readString(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json")))
    Seq("view-uuid", "format-version", "location", "current-version-id",
      "versions", "version-log", "schemas")
      .foreach(k => assert((meta \ k) != JNothing, s"view metadata missing $k"))
    assert((meta \ "format-version").extract[Int] === 1)
    val rep = ((meta \ "versions").children.head \ "representations").children.head
    assert((rep \ "type") === JString("sql"))
    assert((rep \ "dialect") === JString("spark"))
    assert((rep \ "sql") === JString(sql1))
    // the recorded schema is the ANALYZED schema
    assert(((meta \ "schemas").children.head \ "fields").children.map(f =>
      (f \ "name").extract[String]) === List("g", "n"))

    // evaluates identically to the direct SQL
    assert(sameRows(IcebergViews.readView(spark, dir), spark.sql(sql1)))

    // REPLACE: a new SQL appends version 2; version 1 stays readable
    val sql2 = "SELECT g FROM icev_src WHERE id > 1"
    assert(IcebergViews.exportView(spark, dir, sql2) === 2)
    assert(IcebergViews.versionIds(spark, dir) === Seq(1, 2))
    assert(sameRows(IcebergViews.readView(spark, dir), spark.sql(sql2)))
    assert(sameRows(IcebergViews.readViewAt(spark, dir, 1), spark.sql(sql1)))
    val meta2 = org.json4s.jackson.JsonMethods.parse(JFiles.readString(
      java.nio.file.Paths.get(s"$dir/metadata/v2.metadata.json")))
    assert((meta2 \ "version-log").children.size === 2)

    // catalog tie-in: a recorded SQL view exports under destRoot/<name>
    Catalog.createOrReplaceView(spark, "icev_cat",
      "SELECT count(*) AS n FROM icev_src")
    val root2 = JFiles.createTempDirectory("icev_cat").toFile.getAbsolutePath
    assert(IcebergViews.exportCatalogViews(spark, root2, Seq("icev_cat"))
      === Seq("icev_cat"))
    assert(IcebergViews.readView(spark, s"$root2/icev_cat")
      .as[Long].collect() === Array(3L))

    // a TABLE chain is not a view (and a view chain is not a table)
    val tdir = JFiles.createTempDirectory("icev_tbl").toFile.getAbsolutePath
    IcebergExport.export(Seq((1L, "x")).toDF("id", "v"), tdir)
    assertThrows[IllegalArgumentException](IcebergViews.readView(spark, tdir))
    assertThrows[Exception](IcebergExport.readTable(spark, dir).collect())
  }
}
