package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining — turning a corpus of variable-length
  * documents into fixed-token-budget training sequences. Two standard
  * semantics, both deterministic and both scalable:
  *
  *  - [[chunkAssign]] — GPT-style concatenation chunking: documents are laid
  *    end-to-end in a stable order and the stream is cut every `seqLen`
  *    tokens; documents may straddle a chunk boundary. Pure window math —
  *    one shuffle on the shard key, then a per-shard sort, all
  *    whole-stage-codegen.
  *  - [[packGreedy]] — greedy first-fit-in-order packing: a document never
  *    straddles; a new pack opens when the next document would overflow the
  *    budget. Inherently a sequential scan per shard, so it runs as ONE
  *    `repartition(shard) + sortWithinPartitions + mapPartitions` linear
  *    pass with O(1) state — the Spark pattern for order-dependent
  *    per-group logic that windows cannot express.
  *
  * Sharding bounds both the sort and the sequential scan: with documents
  * hash-sharded (see [[Sampling.splitBucket]]), each shard is an independent
  * packing problem, so 100 TB parallelizes across executors and no single
  * task sees more than corpus/nShards tokens. Reference behavior: the
  * workshop curates raw corpora into training-ready tables
  * (readme.md:307-335); packing is the step its downstream consumers run.
  */
object Packing {

  /** Stable shard in [0, nShards): content-hash bucket of the key, so shard
    * membership is reproducible across runs/engines (md5, same as the
    * split/sampling operators). */
  def shardOf(key: Column, nShards: Int): Column = {
    require(nShards > 0)
    Sampling.splitBucket(key) % nShards
  }

  /** Concatenation-order chunk assignment. Input: one row per document with
    * a shard, an order key (document id) and a token count. Output adds:
    *  - `start_off`   — the document's first-token offset in its shard's
    *                    concatenated token stream;
    *  - `first_chunk` / `last_chunk` — `floor(offset / seqLen)` of the first
    *                    and last token;
    *  - `straddles`   — whether the document crosses a chunk boundary.
    */
  def chunkAssign(df: DataFrame, id: Column, tokens: Column, shard: Column,
                  seqLen: Long): DataFrame = {
    require(seqLen > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val start = sum(col("n_tokens")).over(w) - col("n_tokens")
    df.select(shard.cast("long").as("shard"), id.cast("long").as("doc_id"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("start_off", start)
      .withColumn("first_chunk", floor(col("start_off") / seqLen))
      .withColumn("last_chunk",
        floor((col("start_off") + col("n_tokens") - 1) / seqLen))
      .withColumn("straddles", col("first_chunk") =!= col("last_chunk"))
  }

  /** Greedy first-fit-in-order packing. Documents are visited in `id` order
    * within each shard; a running token total accumulates until adding the
    * next document would exceed `budget`, which closes the pack and opens
    * the next (`pack_id` restarts at 0 per shard). A document larger than
    * the budget gets a pack of its own. Output: (shard, doc_id, n_tokens,
    * pack_id).
    *
    * One shuffle (repartition on shard), one per-partition sort, one linear
    * scan — the same cost shape as a groupBy, with no driver state and no
    * per-group materialization (the iterator streams).
    *
    * Token counts must be positive: a zero/negative count has no packing
    * semantics (the "would this doc overflow?" test degenerates), so such
    * rows are rejected rather than silently diverging from the recursive
    * reference definition. */
  def packGreedy(df: DataFrame, id: Column, tokens: Column, shard: Column,
                 budget: Long): DataFrame = {
    require(budget > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(shard.cast("long").as("shard"), id.cast("long").as("doc_id"),
        tokens.cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        // Shards are contiguous after the sort; reset state on shard change.
        var curShard = Long.MinValue
        var acc = 0L
        var pack = 0L
        it.map { case (sh, docId, tok) =>
          require(tok > 0, s"packGreedy: doc $docId has non-positive token count $tok")
          if (sh != curShard) { curShard = sh; acc = 0L; pack = 0L }
          if (acc > 0 && acc + tok > budget) { pack += 1; acc = 0L }
          acc += tok
          (sh, docId, tok, pack)
        }
      }
      .toDF("shard", "doc_id", "n_tokens", "pack_id")
  }
}
