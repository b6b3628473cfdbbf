package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Train/eval decontamination — the overlap check every LLM training
  * pipeline runs before shipping a split: an eval document that shares a
  * long-enough n-gram with any training document leaks the benchmark into
  * the training set (reference behavior class: the workshop's
  * quality/reconciliation gates, applied to the ML-data domain).
  *
  * Scale design (100 TB): both corpora project to (docId, distinct shingle
  * HASH) map-side — 8-byte keys, never shingle strings — then ONE shuffle
  * equi-join on the hash keyed by shingle. No all-pairs document compare
  * exists anywhere: cost is linear in total shingle count, like the
  * MinHash bucket joins ([[Dedup]]). A 64-bit hash collision could in
  * principle link two unrelated docs (~n²/2⁶⁴ for n distinct shingles);
  * flagged docs are meant for removal or manual review, where a
  * false-positive rate of that order is immaterial.
  */
object Decontaminate {

  /** Shingle-hash projection: one row per (id, distinct n-gram hash). */
  private def grams(df: DataFrame, idCol: String, textCol: String,
                    n: Int, idAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
        explode(array_distinct(transform(
          shingles(tokens(col(textCol)), n), g => xxhash64(g)))).as("__g"))

  /** For each eval doc sharing at least one n-token shingle with the
    * training corpus: how many train docs it collides with and how many
    * distinct shingles leak. Eval docs with no overlap are absent (clean). */
  def overlapReport(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 5): DataFrame = {
    val tr = grams(train, idCol, textCol, n, "__train_id")
    val te = grams(eval, idCol, textCol, n, "__eval_id")
    te.join(tr, "__g")
      .groupBy(col("__eval_id").as("eval_doc"))
      .agg(countDistinct(col("__train_id")).as("n_train_docs"),
        countDistinct(col("__g")).as("n_shared_shingles"))
  }

  /** [[overlapReport]] with a Bloom pre-filter on the TRAIN side — the
    * 100 TB formulation. The plain report shuffles every train shingle
    * hash into the equi-join, but decontamination is wildly asymmetric:
    * eval benchmarks are MBs–GBs while the training corpus is the 100 TB
    * side, and almost none of its shingles match anything. Building a
    * Bloom filter over the EVAL shingle hashes (size `numBits/8` bytes —
    * independent of train volume) and probing it map-side BEFORE the
    * shuffle cuts the train-side shuffle from |train shingles| rows to
    * |true overlap| + fpp·|train shingles|.
    *
    * Results are IDENTICAL to [[overlapReport]]: a false positive merely
    * sends one extra row into the exact equi-join, where it fails to
    * match. q93 registers this path under q80's oracle, so the identity
    * is driver-hash-checked, not just asserted.
    *
    * The driver collects only the serialized filter (bounded by
    * `expectedEvalShingles` — like IVF's bounded training sample, never
    * data-proportional). Falls back to the plain report if the native
    * Bloom expressions cannot be installed in this session.
    */
  def overlapReportBloom(spark: org.apache.spark.sql.SparkSession,
                         train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 5,
                         expectedEvalShingles: Long = 1L << 20,
                         bitsPerItem: Int = 8): DataFrame = {
    import graft.functions.BloomFunctions
    val tr = grams(train, idCol, textCol, n, "__train_id")
    // Persisted: the eval side (small by premise) feeds the filter build AND
    // the join; without it the shingle projection runs twice.
    val te = grams(eval, idCol, textCol, n, "__eval_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val numBits = expectedEvalShingles * bitsPerItem
    val filtered = BloomFunctions.bloomAgg(spark)(col("__g"), expectedEvalShingles, numBits)
      .flatMap { agg =>
        val bytes = te.select(agg).head.getAs[Array[Byte]](0)
        // Empty eval corpus → null filter → nothing can overlap.
        if (bytes == null) Some(tr.limit(0))
        else BloomFunctions.mightContain(spark)(lit(bytes), col("__g"))
          .map(tr.filter)
      }
      .getOrElse(tr)
    te.join(filtered, "__g")
      .groupBy(col("__eval_id").as("eval_doc"))
      .agg(countDistinct(col("__train_id")).as("n_train_docs"),
        countDistinct(col("__g")).as("n_shared_shingles"))
  }
}
