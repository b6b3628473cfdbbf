package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Export a snapshot (any DataFrame — typically a [[SnapshotTable]]'s
  * RESOLVED current content) as an **Apache Iceberg v2 table directory**,
  * and read such a directory back purely from its Iceberg metadata.
  *
  * The reference workshop's tables ARE Iceberg tables (readme.md:357-369,
  * spark.py:52-59); the sandbox has no Iceberg runtime jars, so the store
  * side of this engine reproduces the SEMANTICS on versioned parquet. This
  * exporter closes the remaining interchange gap as far as the environment
  * allows: it writes the public Iceberg table format (HadoopCatalog
  * layout) so a real Iceberg reader outside this sandbox can open the
  * result —
  *
  *   dest/
  *     data/…parquet                          (the snapshot's rows)
  *     metadata/v1.metadata.json              (table metadata, spec §"Table Metadata")
  *     metadata/snap-<id>-1-<uuid>.avro       (manifest LIST, spec §"Snapshots")
  *     metadata/<uuid>-m0.avro                (manifest, spec §"Manifests")
  *     metadata/version-hint.text             (HadoopCatalog current-version pointer)
  *
  * Field ids, Avro record layouts (`manifest_entry`/`manifest_file` with
  * the spec's field-id properties), file-level metadata keys, and the
  * metadata.json shape follow the published Apache Iceberg spec
  * (https://iceberg.apache.org/spec/, format version 2). Bounds/stats maps
  * are spec-OPTIONAL and omitted; record_count and file_size_in_bytes are
  * real (parquet footers).
  *
  * [[readTable]] is the independent verification path: it re-opens the
  * export using ONLY the Iceberg metadata chain (version-hint →
  * metadata.json → manifest list → manifests → data files) — shared
  * bookkeeping with the writer is nil, so a round-trip equality against
  * the source snapshot pins the export's self-consistency (q128).
  *
  * Scope: unpartitioned data layout (the export is a materializing copy of
  * one resolved snapshot — delta chains and merge-on-read delete files are
  * FOLDED by the resolution, which is exactly what a cross-engine handoff
  * wants), primitive + array/struct column types. */
object IcebergExport {

  /** One export's receipt: the snapshot id written and the planned files. */
  final case class Export(snapshotId: Long, dataFiles: Seq[String], rows: Long)

  /** JSON string escape for interpolated names/paths — a column name with
    * a quote or backslash (legal in Spark) must not corrupt metadata.json
    * or the manifest's embedded schema. */
  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  // ── Iceberg schema JSON from a Spark schema (spec §"Schemas") ──────────

  private def icebergType(dt: DataType, nextId: () => Int): String = dt match {
    case BooleanType => "\"boolean\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case StringType => "\"string\""
    case BinaryType => "\"binary\""
    case DateType => "\"date\""
    case _: TimestampType => "\"timestamptz\""
    case d: DecimalType => s""""decimal(${d.precision}, ${d.scale})""""
    case ArrayType(elem, containsNull) =>
      val id = nextId()
      s"""{"type":"list","element-id":$id,"element":${icebergType(elem, nextId)},"element-required":${!containsNull}}"""
    case StructType(fields) =>
      val fs = fields.map { f =>
        val id = nextId()
        s"""{"id":$id,"name":"${jsonEsc(f.name)}","required":${!f.nullable},"type":${icebergType(f.dataType, nextId)}}"""
      }
      s"""{"type":"struct","fields":[${fs.mkString(",")}]}"""
    case other => throw new IllegalArgumentException(
      s"iceberg export: unsupported type ${other.simpleString}")
  }

  /** (schema json with schema-id, last column/element id assigned). */
  private def icebergSchema(schema: StructType): (String, Int) = {
    var last = 0
    val nextId = () => { last += 1; last }
    val body = icebergType(schema, nextId)
    (body.replaceFirst("""\{"type":"struct"""",
      """{"type":"struct","schema-id":0"""), last)
  }

  // ── the spec's Avro record layouts (field-id properties included) ──────

  private val ManifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104}
      ]},"field-id":2}]}""")

  private val ManifestFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514}]}""")

  private def writeAvro(spark: SparkSession, path: Path, schema: Schema,
      meta: Map[String, String], rows: Seq[GenericData.Record]): Long = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    var closed = false
    try {
      val w = new DataFileWriter(new GenericDatumWriter[GenericData.Record](schema))
      meta.foreach { case (k, v) => w.setMeta(k, v) }
      w.create(schema, out)
      try rows.foreach(w.append)
      finally { w.close(); closed = true } // closes the FS stream too
    } finally
      // a failure before the writer owned the stream must not leak it
      if (!closed)
        try out.close() catch { case scala.util.control.NonFatal(_) => () }
    fs.getFileStatus(path).getLen
  }

  private def readAvro(spark: SparkSession, path: Path): Seq[GenericData.Record] = {
    val in = new FsInput(path, spark.sparkContext.hadoopConfiguration)
    val r = new DataFileReader(in, new GenericDatumReader[GenericData.Record]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[GenericData.Record]
      while (r.hasNext) buf += r.next()
      buf.toSeq
    } finally r.close()
  }

  // ── export ──────────────────────────────────────────────────────────────

  /** Write `df` as an Iceberg v2 table at `destDir` (fresh table, one
    * snapshot). Deterministic layout except timestamps and the snapshot id. */
  def export(df: DataFrame, destDir: String): Export = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(hconf)
    val location = fs.makeQualified(dest).toString

    // 1. the data files (a materializing copy of the resolved snapshot)
    df.write.mode("overwrite").parquet(s"$destDir/data")
    val dataDir = new Path(s"$destDir/data")
    val files = {
      val it = fs.listFiles(dataDir, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
          buf += ((fs.makeQualified(st.getPath).toString, st.getLen))
      }
      buf.toSeq.sortBy(_._1)
    }
    val counts = files.map { case (p, _) =>
      SnapshotTable.footerRecordCount(new Path(p), hconf)
    }
    val rowsTotal = counts.sum

    val snapshotId = math.abs(java.util.UUID
      .nameUUIDFromBytes(location.getBytes("UTF-8"))
      .getMostSignificantBits)
    val nowMs = System.currentTimeMillis()
    val (schemaJson, lastColumnId) = icebergSchema(df.schema)

    // 2. the manifest (spec §"Manifests": one ADDED entry per data file)
    val dataFileSchema = ManifestEntrySchema.getField("data_file").schema()
    val partitionSchema = dataFileSchema.getField("partition").schema()
    val entries = files.zip(counts).map { case ((p, len), n) =>
      val dfRec = new GenericData.Record(dataFileSchema)
      dfRec.put("content", 0) // DATA
      dfRec.put("file_path", p)
      dfRec.put("file_format", "PARQUET")
      dfRec.put("partition", new GenericData.Record(partitionSchema))
      dfRec.put("record_count", n)
      dfRec.put("file_size_in_bytes", len)
      val e = new GenericData.Record(ManifestEntrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", 1L)
      e.put("file_sequence_number", 1L)
      e.put("data_file", dfRec)
      e
    }
    val manifestName = java.util.UUID
      .nameUUIDFromBytes(s"$location#m0".getBytes("UTF-8")).toString + "-m0.avro"
    val manifestPath = new Path(s"$destDir/metadata/$manifestName")
    val manifestLen = writeAvro(spark, manifestPath, ManifestEntrySchema,
      Map("schema" -> schemaJson,
        "partition-spec" -> "[]", "partition-spec-id" -> "0",
        "format-version" -> "2", "content" -> "data"),
      entries)

    // 3. the manifest list (spec §"Snapshots")
    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", fs.makeQualified(manifestPath).toString)
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0) // data
    mf.put("sequence_number", 1L)
    mf.put("min_sequence_number", 1L)
    mf.put("added_snapshot_id", snapshotId)
    mf.put("added_files_count", files.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", rowsTotal)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val listName = s"snap-$snapshotId-1-" + java.util.UUID
      .nameUUIDFromBytes(s"$location#list".getBytes("UTF-8")).toString + ".avro"
    val listPath = new Path(s"$destDir/metadata/$listName")
    writeAvro(spark, listPath, ManifestFileSchema,
      Map("snapshot-id" -> snapshotId.toString,
        "sequence-number" -> "1", "format-version" -> "2"),
      Seq(mf))

    // 4. table metadata + the HadoopCatalog version hint
    val metadataJson =
      s"""{
  "format-version": 2,
  "table-uuid": "${java.util.UUID.nameUUIDFromBytes(location.getBytes("UTF-8"))}",
  "location": "${jsonEsc(location)}",
  "last-sequence-number": 1,
  "last-updated-ms": $nowMs,
  "last-column-id": $lastColumnId,
  "current-schema-id": 0,
  "schemas": [$schemaJson],
  "default-spec-id": 0,
  "partition-specs": [{"spec-id": 0, "fields": []}],
  "last-partition-id": 999,
  "default-sort-order-id": 0,
  "sort-orders": [{"order-id": 0, "fields": []}],
  "properties": {"write.format.default": "parquet"},
  "current-snapshot-id": $snapshotId,
  "snapshots": [{
    "snapshot-id": $snapshotId,
    "sequence-number": 1,
    "timestamp-ms": $nowMs,
    "summary": {"operation": "append",
      "added-data-files": "${files.size}",
      "added-records": "$rowsTotal",
      "total-records": "$rowsTotal",
      "total-data-files": "${files.size}"},
    "manifest-list": "${jsonEsc(fs.makeQualified(listPath).toString)}",
    "schema-id": 0
  }],
  "snapshot-log": [{"timestamp-ms": $nowMs, "snapshot-id": $snapshotId}],
  "metadata-log": []
}
"""
    writeString(fs, new Path(s"$destDir/metadata/v1.metadata.json"), metadataJson)
    writeString(fs, new Path(s"$destDir/metadata/version-hint.text"), "1")
    Export(snapshotId, files.map(_._1), rowsTotal)
  }

  /** Export a [[SnapshotTable]]'s current resolved content. */
  def exportStore(spark: SparkSession, storeRoot: String, destDir: String): Export =
    export(new SnapshotTable(spark, storeRoot).read(), destDir)

  private def writeString(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  // ── the independent read path (metadata chain only) ────────────────────

  /** The data files the current snapshot plans, resolved ONLY through the
    * Iceberg metadata chain: version-hint → vN.metadata.json →
    * current-snapshot-id → manifest-list avro → manifest avro entries
    * (live statuses). Returns (path, record_count) per file. */
  def plannedFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(hconf)
    def readStr(p: Path): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val v = readStr(new Path(s"$dir/metadata/version-hint.text")).trim.toInt
    val meta = JsonMethods.parse(readStr(new Path(s"$dir/metadata/v$v.metadata.json")))
    val snapId = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").children.find(s =>
      (s \ "snapshot-id").extract[Long] == snapId).getOrElse(
      throw new IllegalStateException(s"current snapshot $snapId not in metadata"))
    val listPath = (snap \ "manifest-list").extract[String]
    val manifests = readAvro(spark, new Path(listPath))
      .map(_.get("manifest_path").toString)
    manifests.flatMap { m =>
      readAvro(spark, new Path(m))
        .filter(_.get("status").asInstanceOf[Int] != 2) // 2 = DELETED
        .map { e =>
          val d = e.get("data_file").asInstanceOf[GenericData.Record]
          (d.get("file_path").toString,
            d.get("record_count").asInstanceOf[Long])
        }
    }
  }

  /** Read an exported table back purely from its Iceberg metadata. */
  def readTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(plannedFiles(spark, dir).map(_._1): _*)
}
