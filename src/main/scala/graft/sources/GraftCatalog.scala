package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource-v2 `TableCatalog` + `SupportsNamespaces` with REAL nested
  * namespaces over a parquet warehouse — the engine-native analog of the
  * reference's Iceberg REST catalog hierarchy (semantics.sql:8-23 creates
  * `dremio.semantics.raw/silver/gold/...`; readme.md:128-180 reads
  * multi-part paths). Registered via
  * `spark.sql.catalog.<name> = graft.sources.GraftCatalog`, after which
  * `CREATE NAMESPACE <name>.a.b.c`, `CREATE TABLE <name>.a.b.c.t`,
  * INSERT/CTAS/SELECT on 3+-part identifiers all resolve natively — no
  * flattening.
  *
  * Layout: a namespace is a directory tree under the `warehouse` option's
  * root; a table is a leaf directory holding parquet files plus a
  * `_graft_schema.json` sidecar carrying the declared schema (so empty
  * tables scan with their declared columns, exactly like a metastore
  * entry). Reads and writes go through Spark's own v2 `ParquetTable`
  * (vectorized scan, distributed write, TRUNCATE capability) — this class
  * only resolves identifiers to paths, so every data-path property
  * (pushdown, pruning, AQE) is stock Spark.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: Path = _
  private var fs: FileSystem = _

  private val SchemaFile = "_graft_schema.json"
  private val RedirectFile = "_graft_location"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_catalog_$name")
    root = new Path(wh)
    fs = root.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
  }

  override def name(): String = catalogName

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(root)((p, part) => new Path(p, part))
  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)
  /** The directory holding the table's files: the warehouse position, or the
    * user's `LOCATION` recorded in a redirect sidecar (external tables). */
  private def dataDir(ident: Identifier): Path = {
    val dir = tablePath(ident)
    val rf = new Path(dir, RedirectFile)
    if (fs.exists(rf)) {
      val in = fs.open(rf)
      val loc = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      new Path(loc)
    } else dir
  }
  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, SchemaFile)) || fs.exists(new Path(p, RedirectFile))

  // --- namespaces -----------------------------------------------------------

  override def namespaceExists(ns: Array[String]): Boolean = {
    val p = nsPath(ns)
    ns.isEmpty || (fs.exists(p) && fs.getFileStatus(p).isDirectory && !isTableDir(p))
  }

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(root).filter(st => st.isDirectory && !isTableDir(st.getPath))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(nsPath(ns))
      .filter(st => st.isDirectory && !isTableDir(st.getPath))
      .map(st => ns :+ st.getPath.getName)
  }

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Map("location" -> nsPath(ns).toString).asJava
  }

  override def createNamespace(ns: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(ns) && ns.nonEmpty) throw new NamespaceAlreadyExistsException(ns)
    fs.mkdirs(nsPath(ns)) // implicit parents, like an object-store catalog
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("GraftCatalog: ALTER NAMESPACE")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    val p = nsPath(ns)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw NonEmptyNamespaceException(ns, "namespace is not empty", None)
    fs.delete(p, true)
  }

  // --- tables ---------------------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(nsPath(ns)).filter(st => st.isDirectory && isTableDir(st.getPath))
      .map(st => Identifier.of(ns, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = isTableDir(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!isTableDir(tablePath(ident)))
      throw new NoSuchTableException(ident.namespace :+ ident.name)
    val dir = dataDir(ident)
    val schema = {
      val in = fs.open(new Path(dir, SchemaFile))
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
    }
    ParquetTable(ident.toString, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(dir.toString), Some(schema),
      classOf[ParquetFileFormat])
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException((ident.namespace :+ ident.name).mkString("."))
    // PARTITIONED BY (days(ts)) / (col): the v2 parquet write path doesn't
    // lay out transform partitions, so the clause is recorded as declared
    // intent (the same contract as the scripted Dremio PARTITION BY path) and
    // the table is created unpartitioned; day-grain pruning is provided by
    // Catalog.ctasDayPartitioned + HiddenPartitionPruning.
    if (partitions.nonEmpty)
      Catalog.recordPartitionIntent(
        s"$catalogName.${(ident.namespace :+ ident.name).mkString(".")}",
        partitions.map(_.describe()).mkString(", "))
    val provider = Option(properties.get(TableCatalog.PROP_PROVIDER))
    require(provider.forall(_.equalsIgnoreCase("parquet")),
      s"GraftCatalog stores parquet; got USING ${provider.get}")
    val dir = tablePath(ident)
    fs.mkdirs(dir)
    val location = Option(properties.get(TableCatalog.PROP_LOCATION))
    val target = location.map { loc =>
      val out = fs.create(new Path(dir, RedirectFile), true)
      try out.write(loc.getBytes("UTF-8")) finally out.close()
      val lp = new Path(loc); fs.mkdirs(lp); lp
    }.getOrElse(dir)
    val schema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
    val out = fs.create(new Path(target, SchemaFile), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("GraftCatalog: ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = {
    if (!isTableDir(tablePath(ident))) false
    else {
      val dd = dataDir(ident)
      if (dd != tablePath(ident)) fs.delete(dd, true) // external data dir too
      fs.delete(tablePath(ident), true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent.namespace :+ oldIdent.name)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException((newIdent.namespace :+ newIdent.name).mkString("."))
    fs.mkdirs(nsPath(newIdent.namespace))
    fs.rename(tablePath(oldIdent), tablePath(newIdent))
  }
}
