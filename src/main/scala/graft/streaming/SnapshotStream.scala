package graft.streaming

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
  * each streaming append is committed with its micro-batch id stamped INTO
  * the commit-log operation (`append@<batchId>`). The commit-log line IS the
  * dedup record: there is no second ledger write for a crash to fall
  * between, and a replayed batch finds its own commit and returns the
  * original version. The id is Spark's monotonically-increasing batchId from
  * the checkpoint, the same idempotent-sink recipe Iceberg's Spark streaming
  * writer uses.
  *
  * At 100 TB: each micro-batch writes only its own rows (delta dir +
  * manifest), the table's read side unions live deltas (batched into one
  * scan node per same-schema run), and `compact()` is the maintenance story
  * for delta buildup — identical economics to an Iceberg streaming append.
  */
object SnapshotStream {

  /** Committed `batchId → version`, read straight from the commit log (one
    * source of truth — a `append@<id>` op per streamed batch). */
  def committedBatches(st: SnapshotTable): Map[Long, Long] =
    st.history().collect().flatMap { r =>
      val op = r.getAs[String]("operation")
      if (op.startsWith("append@"))
        Some(op.stripPrefix("append@").toLong -> r.getAs[Long]("version"))
      else None
    }.toMap

  /** Commit one micro-batch as an append UNLESS `batchId` already committed
    * (the crash-replay case) — returns the batch's version either way. */
  def commitStreamBatch(st: SnapshotTable, df: DataFrame, batchId: Long): Long =
    committedBatches(st).get(batchId) match {
      case Some(v) => v // replayed batch: its data is already a snapshot
      case None    => st.commit(df, op = s"append@$batchId")
    }

  /** Run `stream` into the store, one append commit per micro-batch,
    * exactly-once under restart. AvailableNow by default: drain what exists
    * and stop (the test/batch-backfill trigger); pass a processing-time
    * trigger for continuous tailing. */
  def appendStream(st: SnapshotTable, stream: DataFrame, checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitStreamBatch(st, batch, batchId); ()
      }
      .start()
}
