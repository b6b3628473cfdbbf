package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact baseline. The *query* set broadcasts (it is
  *    small by construction); the corpus never shuffles — each partition
  *    scores its rows against the broadcast queries, then a single top-k
  *    window per query reduces. Correct at any corpus size; cost is
  *    O(|corpus| × |queries|).
  *  - `lshTopK` — scale path: random-hyperplane signatures, banded buckets,
  *    equi-join corpus↔queries on (band, bucket) so only same-bucket rows are
  *    scored. Recall tunable via bands/bits; candidates verified with exact
  *    cosine so returned similarities are true values.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row. Output:
    * query_id, neighbor_id, sim (rounded to 6), rank (1-based). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val cos = graft.functions.NativeVectorExpressions.cosineFast(corpus.sparkSession) _
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cos(col("__qv"), col("__cv")).as("__sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("__sim"), 6).as("sim"), col("rank"))
  }

  /** LSH-bucketed approximate top-k. Same output shape as bruteForceTopK;
    * a query's result may have fewer than k rows if its buckets are sparse. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, nBits: Int = 16,
              bands: Int = 4, seed: Long = 42L): DataFrame = {
    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs),
          hyperplaneBits(asDouble(col(vecCol)), dim, nBits, seed).as("__bits"))
        .select(col(idAs), col(vecAs),
          explode(bandBuckets(col("__bits"), nBits, bands)).as("__bb"))
        .select(col(idAs), col(vecAs), col("__bb.band"), col("__bb.bucket"))
    val c = banded(corpus, "neighbor_id", "__cv")
    val q = banded(queries, "query_id", "__qv")
    val cands = c.join(q, Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"), col("__cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val cos = graft.functions.NativeVectorExpressions.cosineFast(corpus.sparkSession) _
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id"))
    cands.withColumn("__sim", cos(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("__sim"), 6).as("sim"), col("rank"))
  }

  /** All pairs with cosine ≥ threshold — embedding-based near-duplicate
    * detection. Exact (cross-product within id order); use the LSH variant
    * for corpora where O(n²) is prohibitive. */
  def cosinePairsAbove(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val cos = graft.functions.NativeVectorExpressions.cosineFast(df.sparkSession) _
    val a = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("__va"))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cos(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }
}
