package graft.sources

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Iceberg v2 export: spec-shaped metadata (table metadata JSON, Avro
  * manifest list + manifests with the published field ids), and the
  * independent metadata-chain read path proving round-trip equality. */
class IcebergExportSpec extends SparkSpec {

  private def mutatedStore(): (String, Long) = {
    import spark.implicits._
    val root = JFiles.createTempDirectory("iceexp_store").toFile.getAbsolutePath
    val t = new SnapshotTable(spark, root)
    t.commit(Seq.tabulate(100)(i => (i.toLong, s"v$i", (i % 5).toLong))
      .toDF("id", "v", "n"))                                            // v0
    t.commit(Seq.tabulate(20)(i => (1000L + i, s"w$i", 7L))
      .toDF("id", "v", "n"), op = "append")                             // v1
    t.deleteWhereMor(col("id") % 10 === 0L, "id")                       // v2
    (root, t.read().count())
  }

  test("round trip: an exported mutated snapshot reads back IDENTICALLY " +
      "through the Iceberg metadata chain alone") {
    import spark.implicits._
    val (root, expectRows) = mutatedStore()
    val dest = JFiles.createTempDirectory("iceexp_dest").toFile.getAbsolutePath
    val receipt = IcebergExport.exportStore(spark, root, dest)
    assert(receipt.rows === expectRows)

    // the reader walks version-hint → metadata.json → manifest list →
    // manifests → files; it shares no bookkeeping with the store
    val back = IcebergExport.readTable(spark, dest)
    val src = new SnapshotTable(spark, root).read()
    assert(back.select("id", "v", "n").as[(Long, String, Long)].collect().sorted
      === src.select("id", "v", "n").as[(Long, String, Long)].collect().sorted)
    // the export FOLDED the delta chain + mor delete file: no deleted id
    // survives, and planned record counts agree with the data
    assert(back.filter(col("id") % 10 === 0L).count() === 0)
    assert(IcebergExport.plannedFiles(spark, dest).map(_._2).sum === expectRows)
  }

  test("the layout is the published Iceberg v2 shape: HadoopCatalog files, " +
      "spec'd Avro metadata keys, required table-metadata fields") {
    import spark.implicits._
    val dest = JFiles.createTempDirectory("iceexp_shape").toFile.getAbsolutePath
    IcebergExport.export(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dest)

    val meta = new java.io.File(s"$dest/metadata")
    val names = meta.listFiles().map(_.getName).sorted
    assert(names.contains("v1.metadata.json"))
    assert(names.contains("version-hint.text"))
    assert(names.exists(n => n.startsWith("snap-") && n.endsWith(".avro")),
      s"manifest list missing: ${names.mkString(",")}")
    assert(names.exists(n => n.endsWith("-m0.avro")),
      s"manifest missing: ${names.mkString(",")}")
    assert(JFiles.readString(
      java.nio.file.Paths.get(s"$dest/metadata/version-hint.text")).trim === "1")

    // required v2 table-metadata fields (Iceberg spec §"Table Metadata")
    val json = JFiles.readString(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json"))
    Seq("\"format-version\": 2", "table-uuid", "last-sequence-number",
      "last-column-id", "schemas", "current-schema-id", "partition-specs",
      "default-spec-id", "sort-orders", "default-sort-order-id",
      "current-snapshot-id", "manifest-list", "snapshot-log")
      .foreach(k => assert(json.contains(k), s"metadata.json missing $k"))
    // schema fields carry ids and required-ness
    assert(json.contains("\"schema-id\":0"))
    assert(json.contains("\"id\":1,\"name\":\"id\""))

    // the manifest avro carries the spec's file-level metadata keys
    val manifest = meta.listFiles().find(_.getName.endsWith("-m0.avro")).get
    val rd = new org.apache.avro.file.DataFileReader(manifest,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericData.Record]())
    try {
      assert(new String(rd.getMeta("format-version")) === "2")
      assert(new String(rd.getMeta("content")) === "data")
      assert(new String(rd.getMeta("partition-spec-id")) === "0")
      assert(new String(rd.getMeta("schema")).contains("\"type\":\"struct\""))
      val entry = rd.next()
      assert(entry.get("status") === 1)
      val df0 = entry.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericData.Record]
      assert(df0.get("file_format").toString === "PARQUET")
      assert(df0.get("record_count").asInstanceOf[Long] > 0L)
      // the spec's field ids ride the Avro schema
      assert(rd.getSchema.getField("data_file").getObjectProp("field-id") === 2)
      assert(df0.getSchema.getField("file_path").getObjectProp("field-id") === 100)
    } finally rd.close()

    // the manifest LIST carries the snapshot linkage
    val list = meta.listFiles().find(_.getName.startsWith("snap-")).get
    val lr = new org.apache.avro.file.DataFileReader(list,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericData.Record]())
    try {
      val mf = lr.next()
      assert(mf.get("added_rows_count") === 3L)
      assert(mf.get("sequence_number") === 1L)
      assert(lr.getSchema.getField("manifest_path").getObjectProp("field-id") === 500)
    } finally lr.close()
  }

  test("export + metadata-chain read operate on a scheme'd (Hadoop FS) " +
      "destination") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = JFiles.createTempDirectory("iceexp_rem").toFile.getAbsolutePath
    val dest = s"graftfs://$local"
    IcebergExport.export(
      Seq.tabulate(50)(i => (i.toLong, s"r$i")).toDF("id", "v"), dest)
    val back = IcebergExport.readTable(spark, dest)
    assert(back.count() === 50)
    assert(back.select(sum("id")).head.getLong(0) === (0 until 50).sum.toLong)
    assert(!JFiles.exists(java.nio.file.Paths.get("graftfs:")),
      "a java.nio path escaped the Hadoop FS seam")
  }

  test("arrays and nested structs export with element/field ids and round-trip") {
    import spark.implicits._
    val dest = JFiles.createTempDirectory("iceexp_types").toFile.getAbsolutePath
    val df = Seq((1L, Seq(0.5, 1.5), ("x", 9L)), (2L, Seq(2.5), ("y", 8L)))
      .toDF("id", "vec", "meta")

    // a column name with a quote must not corrupt the metadata JSON
    val destQ = JFiles.createTempDirectory("iceexp_quote").toFile.getAbsolutePath
    IcebergExport.export(Seq((1L, "z")).toDF("id", "a\"b"), destQ)
    assert(IcebergExport.readTable(spark, destQ).count() === 1)
    IcebergExport.export(df, dest)
    val json = JFiles.readString(
      java.nio.file.Paths.get(s"$dest/metadata/v1.metadata.json"))
    assert(json.contains("\"type\":\"list\"") && json.contains("element-id"))
    val back = IcebergExport.readTable(spark, dest)
    assert(back.select("id", "vec").as[(Long, Seq[Double])].collect().sortBy(_._1)
      === Array((1L, Seq(0.5, 1.5)), (2L, Seq(2.5))))
    assert(back.select("meta._2").as[Long].collect().sorted === Array(8L, 9L))
  }
}
