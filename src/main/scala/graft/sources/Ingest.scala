package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion surface mirroring the reference (SURVEY.md §2.2/§2.3):
  *  - `copyInto` = Dremio `COPY INTO t FROM dir REGEX r FILE_FORMAT csv`
  *    (COPY INTO EXAMPLE/example.sql:13-21): bulk-load files matching a
  *    regex into an existing table, header-mapped to the target schema.
  *  - `listFiles` = `TABLE(LIST_FILES('@src/prefix'))` (ai_generate.sql:19-21):
  *    one row per file with path/size/mtime and the content handle.
  *
  * Scale: both are plain Spark sources — file listing distributes via the
  * InMemoryFileIndex, CSV parsing is per-file parallel, and binaryFile
  * prunes `content` unless projected.
  */
object Ingest {

  /** Header-mapped CSV bulk load into an existing table's schema; returns the
    * loaded DataFrame and appends it to `targetTable` (saveAsTable append).
    * `fileRegex` filters file *names*, as the reference's REGEX option does. */
  def copyInto(spark: SparkSession, targetTable: String, sourceDir: String,
               fileRegex: String = ".*\\.csv", sep: String = ",",
               header: Boolean = true): DataFrame = {
    val target = spark.table(targetTable)
    // Hadoop FS listing, not java.io — works on any scheme (s3a://, hdfs://,
    // file://), matching the reference's object-storage source ('@s3/...').
    val path = new org.apache.hadoop.fs.Path(sourceDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.matches(fileRegex))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"copyInto: no files in $sourceDir matching $fileRegex")
    // TRUE header mapping (the Dremio COPY INTO contract). A single
    // spark.read.csv over many files takes column ORDER from the first file
    // and binds the rest positionally (their header line is merely skipped),
    // so files with re-ordered headers would be silently mismapped. Group
    // files by their actual header line (one cheap first-line read each) and
    // issue one scan per distinct header, binding each group's columns to the
    // target schema BY NAME with casts. The usual case — all files share one
    // header — stays a single multi-file scan.
    val df =
      if (!header) {
        // No header to map: positional binding against the declared schema
        // is the contract (Dremio EXTRACT_HEADER FALSE).
        spark.read.schema(target.schema).option("header", "false")
          .option("sep", sep).csv(files: _*)
      } else {
        val byHeader = files.map { f =>
          val in = fs.open(new org.apache.hadoop.fs.Path(f))
          val line =
            try new java.io.BufferedReader(
              new java.io.InputStreamReader(in, "UTF-8")).readLine()
            finally in.close()
          (if (line == null) "" else line) -> f
        }.groupBy(_._1).toSeq.sortBy(_._1)
        byHeader.map { case (_, group) =>
          val raw = spark.read
            .option("header", "true").option("sep", sep)
            .csv(group.map(_._2): _*)
          target.schema.fields.foreach { f =>
            require(raw.columns.contains(f.name),
              s"copyInto: source files ${group.map(_._2)} missing header column '${f.name}'")
          }
          raw.select(target.schema.fields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
        }.reduce(_ unionByName _)
      }
    df.write.mode("append").insertInto(targetTable)
    df
  }

  /** Continuous COPY INTO: the streaming form of [[copyInto]] for data that
    * keeps arriving (the training-pipeline ingestion pattern — new dump files
    * land in a prefix and must flow into the table exactly once). Spark's
    * file stream source tracks processed files in the checkpoint, giving
    * exactly-once appends per file with no manual bookkeeping; `maxFilesPerTrigger`
    * bounds each micro-batch so a backlog of thousands of files drains in
    * controlled increments instead of one giant batch. Unlike the batch
    * path, the streaming CSV source binds files POSITIONALLY against the
    * declared schema (header lines are only skipped) — files must share the
    * table's column order; use batch [[copyInto]] for header-order-varying
    * backfills. Returns the started query — callers own its lifecycle. */
  def copyIntoStream(spark: SparkSession, targetTable: String, sourceDir: String,
                     checkpointDir: String, sep: String = ",",
                     header: Boolean = true,
                     maxFilesPerTrigger: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    val target = spark.table(targetTable)
    val stream = spark.readStream
      .schema(target.schema)
      .option("header", header.toString)
      .option("sep", sep)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(sourceDir)
      .select(target.schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").insertInto(targetTable)
        // the micro-batch runs in a cloned session; invalidate the CALLER
        // session's cached relation so its readers see the new files
        spark.catalog.refreshTable(targetTable)
      }
      .start()
  }

  /** One row per file under `dir`: path, modificationTime, length, content.
    * `pathGlobFilter` narrows like the reference's `WHERE file['path'] LIKE`;
    * `recursive` descends prefixes like an object-store listing. */
  def listFiles(spark: SparkSession, dir: String, glob: String = "*",
                recursive: Boolean = false): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)

  /** Metadata-only variant (never reads content bytes — parquet/binaryFile
    * column pruning keeps this cheap at any scale). */
  def listFileMeta(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    listFiles(spark, dir, glob).select(col("path"), col("length"), col("modificationTime"))
}
