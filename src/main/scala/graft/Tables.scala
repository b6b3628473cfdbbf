package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * At production scale these are catalog-resolved partitioned tables (the
  * reference resolves them through an Iceberg REST catalog,
  * /root/reference/spark.py:26-28); the loader keeps call sites identical
  * (`Tables(spark, dir, "lineitem")`) so a catalog-backed resolver can be
  * swapped in without touching any query. Parquet scans go through Spark's
  * vectorized reader, so filter/column pushdown behave the same either way.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Loaded frames per session — resolving a table is a catalog lookup, not
    * a fresh file listing + parquet footer read per call (a real catalog
    * caches metadata the same way; re-listing 10 tables per query was pure
    * driver-side overhead in the bench). Weak keys: dropping a session
    * releases its plans. */
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(String, String), DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[(String, String), DataFrame]
        cache.put(spark, m)
      }
      m
    }
    perSession.synchronized {
      perSession.getOrElseUpdate((dir, name), load(spark, dir, name))
    }
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
    // read nanos as long and truncate to microsecond TimestampType. Integer
    // `div` keeps full precision (a double division would lose bits past
    // 2^53 — epoch-nanos are ~1.7e18).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The driver regenerates testdata with whatever parquet writer it has;
    // pyarrow writes timestamps with isAdjustedToUTC=false, which Spark >=3.4
    // infers as TIMESTAMP_NTZ — a type that forbids epoch casts and breaks
    // java.sql.Timestamp encoders. The session is pinned UTC, so reading the
    // same micros as session-zone TimestampType is value-identical; doing it
    // via schema inference (not a post-scan cast) keeps filter pushdown and
    // the vectorized reader on the ts columns.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // the shim only applies when the file really stores NANOS (surfaced as
    // long under nanosAsLong) — a rewritten events table (ScaleUp, CTAS)
    // stores regular TIMESTAMP(MICROS) and must pass through untouched
    val shimmed =
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      else df
    normalizeNtz(shimmed)
  }

  /** Last-resort NTZ guard: if a frame still carries TIMESTAMP_NTZ columns
    * (inference conf ignored, or an upstream already materialized the NTZ
    * schema), cast them to session-zone TimestampType (UTC session → same
    * micros). Recurses into struct/array/map types (ADVICE r9: a nested NTZ
    * field — possible if a future testdata regen nests timestamps — must
    * not slip through the guard that exists for exactly that drift). A
    * whole-column cast to the rewritten type converts every nested
    * occurrence in one expression. Normally a no-op — the inferTimestampNTZ
    * conf above handles it at schema-inference time, which is cheaper
    * (pushdown survives). */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    def rewrite(dt: DataType): DataType = dt match {
      case TimestampNTZType => TimestampType
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = rewrite(f.dataType))))
      case a: ArrayType => a.copy(elementType = rewrite(a.elementType))
      case m: MapType =>
        m.copy(keyType = rewrite(m.keyType), valueType = rewrite(m.valueType))
      case other => other
    }
    val rewritten = df.schema.fields.map(f => f -> rewrite(f.dataType))
    if (rewritten.forall { case (f, dt) => f.dataType == dt }) df
    else df.select(rewritten.map { case (f, dt) =>
      if (f.dataType == dt) col(f.name) else col(f.name).cast(dt).as(f.name)
    }.toSeq: _*)
  }

  /** Which dir each session's temp views currently point at. */
  private val registeredDir = new java.util.WeakHashMap[SparkSession, String]()

  /** Register every table as a temp view so `spark.sql` queries (SQL-surface
    * parity with the reference's pipelines) resolve bare table names.
    * Idempotent per (session, dir): views persist in the session, so
    * re-registering on every query invocation would only repeat catalog
    * churn; switching dirs re-points the views. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    registeredDir.synchronized {
      if (registeredDir.get(spark) != dir) {
        all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
        registeredDir.put(spark, dir)
      }
    }
}
