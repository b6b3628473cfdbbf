package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.SnapshotTable

/** Structured-Streaming ingest into the versioned snapshot store: each
  * micro-batch lands as an O(DELTA) append commit (SURVEY.md §2.3 M4 + the
  * reference's continuous-ingest posture — spark.py:88-89 append cost model,
  * readme.md's snapshot history accruing one entry per write).
  *
  * EXACTLY-ONCE across crashes: foreachBatch gives at-least-once delivery —
  * a crash between the commit and the checkpoint ack replays the batch — so
  * the store keeps a `batchId → version` ledger beside the commit log and a
  * replayed batch is SKIPPED, returning its original version. The dedup key
  * is Spark's own monotonically-increasing batchId from the checkpoint, the
  * same idempotent-sink recipe Iceberg's Spark streaming writer uses.
  *
  * At 100 TB: each micro-batch writes only its own rows (delta dir +
  * manifest), the table's read side unions live deltas (batched into one
  * scan node per same-schema run), and `compact()` is the maintenance story
  * for delta buildup — identical economics to an Iceberg streaming append.
  */
object SnapshotStream {

  private def ledgerPath(root: String) =
    Paths.get(root, "_graft_stream_batches.jsonl")

  /** Committed `batchId → version` ledger (append-only, line = "id,version"). */
  private[streaming] def committedBatches(root: String): Map[Long, Long] =
    if (!Files.exists(ledgerPath(root))) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(ledgerPath(root)).asScala.filter(_.nonEmpty).map { l =>
        val p = l.split(",", 2); p(0).toLong -> p(1).toLong
      }.toMap
    }

  /** Commit one micro-batch as an append UNLESS `batchId` already committed
    * (the crash-replay case) — returns the batch's version either way. */
  def commitStreamBatch(st: SnapshotTable, root: String,
                        df: DataFrame, batchId: Long): Long =
    committedBatches(root).get(batchId) match {
      case Some(v) => v // replayed batch: its data is already a snapshot
      case None =>
        val v = st.commit(df, op = "append")
        Files.writeString(ledgerPath(root), s"$batchId,$v\n",
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        v
    }

  /** Run `stream` into the store at `root`, one append commit per
    * micro-batch, exactly-once under restart. AvailableNow by default: drain
    * what exists and stop (the test/batch-backfill trigger); pass a
    * processing-time trigger for continuous tailing. */
  def appendStream(st: SnapshotTable, root: String, stream: DataFrame,
                   checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitStreamBatch(st, root, batch, batchId); ()
      }
      .start()
}
