package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lightweight snapshot/time-travel table (SURVEY.md §2.3 S3/S4, §2.11 X2):
  * the reference exposes Iceberg snapshot metadata (`table_snapshot`,
  * `table_history`) and time travel (`AT SNAPSHOT`/`VERSION AS OF`). The
  * Iceberg runtime isn't shipped in this environment, so this implements the
  * same contract over versioned parquet directories:
  *
  *   root/v=N/part-*.parquet     one immutable directory per committed version
  *   root/_graft_meta.jsonl      append-only commit log (version, ts, op, rows)
  *
  * Readers pin a version (time travel) or read latest; `history()` surfaces
  * the commit log as a DataFrame; `expireSnapshots` mirrors Iceberg's
  * expire_snapshots maintenance procedure. Commits are last-writer-wins on
  * the driver — single-writer semantics, like the workshop's single pipeline
  * process; a real multi-writer deployment would use Iceberg's atomic swap.
  */
final class SnapshotTable(spark: SparkSession, root: String) {

  private def metaPath = Paths.get(root, "_graft_meta.jsonl")

  private def readMeta(): Seq[(Long, Long, String, Long)] =
    if (!Files.exists(metaPath)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(metaPath).asScala.toSeq.filter(_.nonEmpty).map { line =>
        val m = line.split(",", 4)
        (m(0).toLong, m(1).toLong, m(2), m(3).toLong)
      }
    }

  def currentVersion: Option[Long] = readMeta().lastOption.map(_._1)

  /** Commit a new snapshot (append = previous data + df; overwrite = df).
    * Appends support SCHEMA EVOLUTION (the Iceberg behavior this mirrors):
    * new columns may appear and old columns may be absent — the union is by
    * name with missing columns null-filled, and the committed snapshot
    * carries the widened schema. */
  def commit(df: DataFrame, op: String = "overwrite"): Long = {
    val prev = currentVersion
    val next = prev.map(_ + 1).getOrElse(0L)
    val data = (op, prev) match {
      case ("append", Some(v)) =>
        read(Some(v)).unionByName(df, allowMissingColumns = true)
      case _ => df
    }
    data.write.mode("overwrite").parquet(s"$root/v=$next")
    val rows = spark.read.parquet(s"$root/v=$next").count()
    Files.createDirectories(Paths.get(root))
    Files.writeString(metaPath,
      s"$next,${System.currentTimeMillis()},$op,$rows\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    next
  }

  /** Read latest, or `VERSION AS OF` when a version is given. */
  def read(versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.orElse(currentVersion)
      .getOrElse(throw new IllegalStateException(s"no snapshots at $root"))
    spark.read.parquet(s"$root/v=$v")
  }

  /** `TIMESTAMP AS OF`: latest snapshot committed at or before tsMillis. */
  def readAsOfTimestamp(tsMillis: Long): DataFrame = {
    val v = readMeta().filter(_._2 <= tsMillis).lastOption
      .getOrElse(throw new IllegalStateException(s"no snapshot at or before $tsMillis"))
    read(Some(v._1))
  }

  /** S3/S4 — snapshot/history metadata as a DataFrame. */
  def history(): DataFrame = {
    import spark.implicits._
    readMeta().toDF("version", "committed_at_ms", "operation", "row_count")
      .withColumn("committed_at", timestamp_millis(col("committed_at_ms")))
  }

  /** X2 — expire old snapshots, keeping the most recent `keep` versions
    * (mirror of Iceberg's expire_snapshots). */
  def expireSnapshots(keep: Int): Seq[Long] = {
    val meta = readMeta()
    val expire = meta.dropRight(keep).map(_._1)
    expire.foreach { v =>
      val dir = Paths.get(root, s"v=$v")
      if (Files.exists(dir)) {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
    val remaining = meta.takeRight(keep)
    val content = remaining.map { case (v, t, o, r) => s"$v,$t,$o,$r" }
      .mkString("", "\n", if (remaining.nonEmpty) "\n" else "")
    Files.writeString(metaPath, content,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    expire
  }

  /** X2 — compaction (mirror of rewrite_data_files bin-packing): rewrite the
    * current version's data as `targetFiles` files in a new snapshot. */
  def compact(targetFiles: Int): Long =
    commit(read().coalesce(targetFiles), op = "compact")
}
