package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out helpers for the 100 TB design goal: skew-salted joins and
  * bucketed co-located tables. These don't change semantics — they change
  * shuffle behavior, which is the difference between a job finishing and a
  * straggler task holding 2% of executors for hours.
  */
object ScaleOps {

  /** Skew-salted equi join (left big/skewed, right smaller but not
    * broadcastable): the left side gets a random salt in [0, buckets), the
    * right side is replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows spread over `buckets` reducers instead
    * of one. AQE's skew-join handles moderate skew automatically; explicit
    * salting is for pathological keys known in advance.
    *
    * Join type is inner/left-preserving equi join on `key` — enforced:
    * the right side is replicated once per salt, so right/full-outer would
    * emit every unmatched right row `buckets` times.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedEquiJoin: joinType '$joinType' would duplicate unmatched right rows " +
        "(right side is replicated per salt); use inner/left/left_semi/left_anti")
    val salted = left.withColumn("__salt", (rand(42) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write both sides bucketed on the join key: subsequent joins between the
    * two tables are co-located — SortMergeJoin without an Exchange on either
    * side (verify with .explain: no "Exchange hashpartitioning" above the
    * scans). This is the DISTRIBUTE BY (retail.sql:134) idea made durable. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Key-distribution profile — the operational tool for deciding between
    * broadcast / AQE / explicit salting: top-n heaviest keys with their share
    * of all rows. ONE scan of `df`: the total comes from an unpartitioned
    * window over the (already tiny, post-aggregation) per-key counts, not a
    * second pass over the raw data. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .withColumn("share", round(col("n_rows") /
        sum(col("n_rows")).over(Window.partitionBy()), 6))
      .orderBy(col("n_rows").desc)
      .limit(topN)
  }
}
