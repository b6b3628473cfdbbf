package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** Continuous dedup-index maintenance: the streaming form of q92's
  * incremental path. A document stream (corpus ingest waves) drives a
  * `foreachBatch` sink that, per micro-batch, indexes ONLY the batch
  * (`Dedup.dedupIndex` is a per-doc pure projection, so a batch never needs
  * the rest of the corpus to index), generates delta-vs-standing candidate
  * pairs on the banded LSH keys, and folds the new edges into the standing
  * components with the root-contracted merge — per-batch cost O(batch),
  * never a corpus rescan. Reference behavior class: autonomous incremental
  * reflection refresh (readme.md:381-389) applied to continuous ingestion.
  *
  * State layout (crash-safe, replay-idempotent):
  * `stateDir/v_<batchId>/{index,components,_COMMIT}` — a version directory
  * is written completely before its `_COMMIT` marker, and readers resolve
  * the newest COMMITTED version below the current batch id. A micro-batch
  * replayed after a crash recomputes from the same predecessor state and
  * overwrites its own (possibly partial) version directory, so at-least-once
  * batch delivery yields exactly-once state.
  *
  * Scale notes (100 TB): the standing index/components live in parquet, not
  * executor memory — state size is bounded by the corpus, not the stream;
  * the per-batch joins are the same banded equi-joins as the batch path
  * (PlanAuditSpec's no-cartesian guarantee applies); and the component merge
  * touches O(batch) labels, so a hot ingest day never re-clusters settled
  * documents. DedupStreamSpec proves two-wave streamed state ≡ one-shot
  * batch recompute on the real documents table, byte-for-byte.
  */
object DedupStream {

  private def commitMarker(dir: String, v: Long) =
    new java.io.File(s"$dir/v_$v/_COMMIT")

  /** Newest committed version strictly below `before` (replay safety: a
    * re-delivered batch must not read the state it wrote itself). */
  private[streaming] def latestCommitted(stateDir: String,
                                         before: Long): Option[Long] = {
    val d = new java.io.File(stateDir)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v_"))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("v_").toLong).toOption)
      .filter(v => v < before && commitMarker(stateDir, v).exists())
      .sorted.lastOption
  }

  /** Read the newest committed (index, components) state, if any. */
  def readState(spark: SparkSession, stateDir: String,
                before: Long = Long.MaxValue): Option[(DataFrame, DataFrame)] =
    latestCommitted(stateDir, before).map { v =>
      (spark.read.parquet(s"$stateDir/v_$v/index"),
        spark.read.parquet(s"$stateDir/v_$v/components"))
    }

  /** The `foreachBatch` function: fold one micro-batch of documents
    * (`idCol`, `textCol` columns) into the standing dedup state. */
  def maintainIndex(stateDir: String, idCol: String, textCol: String,
                    threshold: Double = 0.5, k: Int = 128, bands: Int = 32,
                    shingleN: Int = 3): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val batchIdx = Dedup.dedupIndex(batch, idCol, textCol, k, shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val out = s"$stateDir/v_$batchId"
        val (index, components) = readState(spark, stateDir, batchId) match {
          case None =>
            val pairs = Dedup.nearDupPairsFromIndex(batchIdx, threshold, k, bands)
            (batchIdx, Dedup.connectedComponents(pairs, "id_a", "id_b"))
          case Some((oldIdx, oldCC)) =>
            val delta = Dedup.nearDupPairsDelta(oldIdx, batchIdx, threshold, k, bands)
            (oldIdx.unionByName(batchIdx), Dedup.mergeComponents(oldCC, delta))
        }
        // version dir fully written before the commit marker appears
        index.write.mode("overwrite").parquet(s"$out/index")
        components.write.mode("overwrite").parquet(s"$out/components")
        val marker = commitMarker(stateDir, batchId)
        if (!marker.exists()) require(marker.createNewFile(), s"commit $marker")
      } finally batchIdx.unpersist()
  }

  /** Wire a streaming document source into the maintenance sink. The caller
    * owns trigger/checkpoint choice; `Trigger.AvailableNow` + re-running on
    * the same checkpoint is the batch-wave ingest pattern. */
  def maintain(docs: DataFrame, stateDir: String, checkpointDir: String,
               idCol: String = "doc_id", textCol: String = "text",
               threshold: Double = 0.5, k: Int = 128, bands: Int = 32)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(maintainIndex(stateDir, idCol, textCol, threshold, k, bands))
}
