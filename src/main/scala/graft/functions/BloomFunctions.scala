package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Session-registered access to Spark's native Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same kernels
  * Catalyst's runtime row-level filtering injects into shuffle joins).
  *
  * Why expose them directly instead of relying on
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`: the optimizer's
  * injection is heuristic (creation-side size thresholds, selectivity
  * estimates) and silently declines when its cost model says no. A
  * decontamination join KNOWS its shape — the eval corpus is orders of
  * magnitude smaller than the training corpus — so building the filter
  * explicitly makes the map-side pruning deterministic, plan-assertable,
  * and available to any operator, not just the shapes the rule covers.
  *
  * Both functions stay inside whole-stage codegen (`BloomFilterMightContain`
  * implements `doGenCode`); the serialized filter rides the plan as a
  * foldable binary literal, shipped once per executor via the task
  * broadcast, bounded by `numBits/8` bytes regardless of data volume.
  */
object BloomFunctions {

  private val installedSessions =
    java.util.Collections.newSetFromMap(new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def install(spark: SparkSession): Boolean = synchronized {
    if (installedSessions.contains(spark)) true
    else try {
      val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      registry.registerFunction(FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        (exprs: Seq[Expression]) => BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0))
      registry.registerFunction(FunctionIdentifier("graft_bloom_contains"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_contains"),
        (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1)))
      installedSessions.add(spark)
      true
    } catch { case _: Throwable => false }
  }

  /** Aggregate a LongType column into a serialized Bloom filter (binary).
    * `numBits` defaults to 8 bits/item → ~2% false-positive rate. */
  def bloomAgg(spark: SparkSession)(keys: Column, expectedItems: Long,
                                    numBits: Long): Option[Column] =
    if (install(spark))
      Some(call_function("graft_bloom_agg", keys,
        org.apache.spark.sql.functions.lit(expectedItems),
        org.apache.spark.sql.functions.lit(numBits)))
    else None

  /** Membership probe of a LongType key against a serialized filter (a
    * foldable binary column — pass `lit(bytes)`). */
  def mightContain(spark: SparkSession)(bloom: Column, key: Column): Option[Column] =
    if (install(spark)) Some(call_function("graft_bloom_contains", bloom, key))
    else None
}
