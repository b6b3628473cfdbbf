package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The Apache Iceberg VIEW spec (format-version 1) as a file-based
  * interchange surface — the reference's semantic layer is ~40 views
  * (readme.md:307-315, clinicdata.sql:134-163) which its engine stores in
  * an Iceberg catalog; this writes the PUBLIC view metadata shape
  * (https://iceberg.apache.org/view-spec/) so a foreign engine reads the
  * same definitions, and reads it back independently:
  *
  *   dest/metadata/vN.metadata.json   (view metadata: view-uuid, schemas,
  *                                     versions w/ SQL representations,
  *                                     version-log)
  *   dest/metadata/version-hint.text  (HadoopCatalog-style pointer, the
  *                                     same convention as the table export)
  *
  * Each [[exportView]] call appends a view VERSION (the spec's
  * create-or-replace history): `current-version-id` advances, previous
  * versions stay listed, `version-log` records the succession — so
  * [[readViewAt]] time-travels the DEFINITION, not just the data. The
  * recorded schema is the ANALYZED schema of the SQL at export time
  * (the spec's requirement), derived with the table exporter's own
  * field-id assignment.
  *
  * [[readView]] re-analyzes the current version's Spark-dialect SQL in the
  * session — the view evaluates against the session's current catalog
  * state, exactly a view's semantics. A metadata chain written by a table
  * export is refused loudly (and vice versa: [[IcebergExport.readTable]]
  * fails on a view chain's missing table fields). */
object IcebergViews {

  private def hintPath(dir: String) = new Path(s"$dir/metadata/version-hint.text")

  private def readStr(spark: SparkSession, p: Path): String = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def writeStr(spark: SparkSession, p: Path, s: String): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = hintPath(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def currentMeta(spark: SparkSession, dir: String): (Int, JValue) = {
    val v = readStr(spark, hintPath(dir)).trim.toInt
    (v, JsonMethods.parse(
      readStr(spark, new Path(s"$dir/metadata/v$v.metadata.json"))))
  }

  /** Write (or version-advance) the Iceberg view metadata for `sql` at
    * `destDir`. Re-exporting the SAME current SQL is a no-op (no spurious
    * versions); a changed SQL appends a new view version. `extraReps`
    * (r20) carries additional (dialect, sql) representation pairs — the
    * spec's multi-representation list; the spark dialect stays the
    * canonical one (it is what [[readView]] re-analyzes and what the
    * idempotence check compares). Returns the current version id. */
  def exportView(spark: SparkSession, destDir: String, sql: String,
      defaultNamespace: Seq[String] = Nil,
      extraReps: Seq[(String, String)] = Nil): Int = {
    implicit val fmts: Formats = DefaultFormats
    require(!extraReps.exists(_._1 == "spark"),
      "extraReps carries NON-spark dialects; the spark representation is " +
        "the sql parameter")
    val analyzed = spark.sql(sql) // analysis errors surface BEFORE any write
    val nowMs = System.currentTimeMillis()
    val prev: Option[(Int, JValue)] =
      if (exists(spark, destDir)) Some(currentMeta(spark, destDir)) else None
    prev.foreach { case (_, meta) =>
      require((meta \ "view-uuid") != JNothing,
        s"$destDir holds a TABLE metadata chain, not a view")
      val curId = (meta \ "current-version-id").extract[Int]
      val curSql = (meta \ "versions").children
        .find(v => (v \ "version-id").extract[Int] == curId)
        .flatMap(v => (v \ "representations").children.find(r =>
          (r \ "dialect") == JString("spark")))
        .map(r => (r \ "sql").extract[String])
      if (curSql.contains(sql)) return curId // idempotent re-export
    }
    val (schemaJson, _, _) = IcebergExport.icebergSchema(analyzed.schema)
    val newVersionId = prev.map { case (_, meta) =>
      (meta \ "versions").children
        .map(v => (v \ "version-id").extract[Int]).max + 1
    }.getOrElse(1)
    // schema ids advance with versions (each version records its analyzed
    // schema; identical re-analysis still gets its own entry per version)
    val schemaId = newVersionId - 1
    val schemaAst = JsonMethods.parse(schemaJson)
      .merge(JObject("schema-id" -> JInt(schemaId)))
    val newVersion: JValue = JObject(
      "version-id" -> JInt(newVersionId),
      "timestamp-ms" -> JInt(nowMs),
      "schema-id" -> JInt(schemaId),
      "summary" -> JObject("engine-name" -> JString("graft"),
        "operation" -> JString(if (prev.isEmpty) "create" else "replace")),
      "representations" -> JArray(
        (("spark" -> sql) +: extraReps).map { case (d, s) =>
          JObject(
            "type" -> JString("sql"),
            "sql" -> JString(s),
            "dialect" -> JString(d)): JValue
        }.toList),
      "default-namespace" -> JArray(
        defaultNamespace.map(n => JString(n): JValue).toList))
    val fsDest = new Path(destDir)
    val fs = fsDest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val location = prev.map(p => (p._2 \ "location").extract[String])
      .getOrElse(fs.makeQualified(fsDest).toString)
    val prevVersions = prev.map(p => (p._2 \ "versions").children).getOrElse(Nil)
    val prevSchemas = prev.map(p => (p._2 \ "schemas").children).getOrElse(Nil)
    val prevLog = prev.map(p => (p._2 \ "version-log").children).getOrElse(Nil)
    val meta = JObject(
      "view-uuid" -> JString(java.util.UUID
        .nameUUIDFromBytes(("view:" + location).getBytes("UTF-8")).toString),
      "format-version" -> JInt(1),
      "location" -> JString(location),
      "current-version-id" -> JInt(newVersionId),
      "versions" -> JArray((prevVersions :+ newVersion).toList),
      "version-log" -> JArray((prevLog :+ (JObject(
        "timestamp-ms" -> JInt(nowMs),
        "version-id" -> JInt(newVersionId)): JValue)).toList),
      "schemas" -> JArray((prevSchemas :+ schemaAst).toList),
      "properties" -> JObject())
    val fileV = prev.map(_._1 + 1).getOrElse(1)
    writeStr(spark, new Path(s"$destDir/metadata/v$fileV.metadata.json"),
      JsonMethods.pretty(JsonMethods.render(meta)) + "\n")
    writeStr(spark, hintPath(destDir), fileV.toString)
    newVersionId
  }

  /** The Spark-dialect SQL of one view version (default: current). */
  def viewSql(spark: SparkSession, dir: String,
      versionId: Option[Int] = None): String = {
    implicit val fmts: Formats = DefaultFormats
    val (_, meta) = currentMeta(spark, dir)
    require((meta \ "view-uuid") != JNothing,
      s"$dir holds a TABLE metadata chain, not a view")
    val id = versionId.getOrElse((meta \ "current-version-id").extract[Int])
    val version = (meta \ "versions").children
      .find(v => (v \ "version-id").extract[Int] == id)
      .getOrElse(throw new IllegalArgumentException(
        s"view version $id not in the metadata at $dir"))
    (version \ "representations").children
      .find(r => (r \ "dialect") == JString("spark"))
      .map(r => (r \ "sql").extract[String])
      .getOrElse(throw new IllegalStateException(
        s"view version $id has no spark-dialect representation"))
  }

  /** Evaluate the view: re-analyze its current SQL in this session. */
  def readView(spark: SparkSession, dir: String): DataFrame =
    spark.sql(viewSql(spark, dir))

  /** Evaluate a HISTORICAL view version (definition time travel). */
  def readViewAt(spark: SparkSession, dir: String, versionId: Int): DataFrame =
    spark.sql(viewSql(spark, dir, Some(versionId)))

  /** View version ids, oldest first. */
  def versionIds(spark: SparkSession, dir: String): Seq[Int] = {
    implicit val fmts: Formats = DefaultFormats
    val (_, meta) = currentMeta(spark, dir)
    (meta \ "versions").children.map(v => (v \ "version-id").extract[Int])
  }

  /** ALL representations (dialect, sql) of one view version, spark
    * first — the spec's multi-representation list (r20). */
  def viewRepresentations(spark: SparkSession, dir: String,
      versionId: Option[Int] = None): Seq[(String, String)] = {
    implicit val fmts: Formats = DefaultFormats
    val (_, meta) = currentMeta(spark, dir)
    require((meta \ "view-uuid") != JNothing,
      s"$dir holds a TABLE metadata chain, not a view")
    val id = versionId.getOrElse((meta \ "current-version-id").extract[Int])
    val version = (meta \ "versions").children
      .find(v => (v \ "version-id").extract[Int] == id)
      .getOrElse(throw new IllegalArgumentException(
        s"view version $id not in the metadata at $dir"))
    (version \ "representations").children.map(r =>
      (r \ "dialect").extract[String] -> (r \ "sql").extract[String])
  }

  /** Export every recorded catalog view (created via
    * [[Catalog.createOrReplaceView]] — SQL text, a derived DataFrame
    * definition, or a script view with its original-dialect text) under
    * `destRoot/<name>` — the semantic-layer handoff: a foreign engine
    * opens each definition from public view metadata, non-spark dialects
    * included. Returns the exported names. */
  def exportCatalogViews(spark: SparkSession, destRoot: String,
      names: Seq[String] = Nil): Seq[String] = {
    val all = Catalog.recordedViewRepresentations(spark) // keyed lowercase
                                             // (temp-view names are
                                             // case-insensitive)
    val todo =
      if (names.isEmpty) all.keys.toSeq.sorted else names.map(_.toLowerCase)
    todo.map { n =>
      val reps = all.getOrElse(n, throw new IllegalArgumentException(
        s"no recorded or derivable SQL for view $n — it was created from " +
          "a DataFrame whose plan is outside the derivable grammar; " +
          "re-create it with Catalog.createOrReplaceView(spark, name, sql)"))
      val sql = reps.collectFirst { case ("spark", s) => s }.get
      exportView(spark, s"$destRoot/$n", sql,
        extraReps = reps.filterNot(_._1 == "spark"))
      n
    }
  }
}
