package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

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
  * Both functions stay inside whole-stage codegen; the serialized filter is
  * a reference-object field on [[BloomProbe]] (shipped once per stage via
  * the task closure, never a plan literal), bounded by `numBits/8` bytes
  * regardless of data volume.
  */
object BloomFunctions {

  /** Membership probe whose serialized filter is a REFERENCE-OBJECT FIELD,
    * not a child `Literal`. A literal-carried filter (the
    * `BloomFilterMightContain` contract) embeds numBits/8 bytes — ~1 MB at
    * the decontamination default — into the expression tree: every
    * optimizer/canonicalization pass walks it, the task binary re-ships it
    * per stage, and plan strings explode to MBs. Measured on q93: ~1.2 s of
    * the 1.9 s warm run was this driver-side plan handling. Here the bytes
    * live on the expression instance (shipped once via the task closure's
    * reference object, exactly like the NativeTextExpressions kernels), the
    * filter deserializes lazily once per executor instance, and probe
    * results are bit-identical — same spark-sketch `BloomFilter`, same
    * `mightContainLong`. */
  case class BloomProbe(child: Expression, bytes: Array[Byte])
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint key")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_probe"
    // keep the plan string small: never print the payload
    override def toString: String = s"graft_bloom_probe($child, ${bytes.length}B)"

    @transient private lazy val filter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))

    override def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbe].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = ((java.lang.Boolean) $self.nullSafeEval($c)).booleanValue();")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

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
      registry.registerFunction(FunctionIdentifier("graft_bloom_probe"),
        new ExpressionInfo(classOf[BloomProbe].getName, "graft_bloom_probe"),
        (exprs: Seq[Expression]) => BloomProbe(exprs(1), exprs(0) match {
          case Literal(b: Array[Byte], BinaryType) => b
          case other => throw new IllegalArgumentException(
            s"graft_bloom_probe: first arg must be a binary literal, got $other")
        }))
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

  /** Membership probe for a driver-held serialized filter: the bytes end up
    * a reference-object field on [[BloomProbe]] (the literal exists only for
    * the one analysis step that unwraps it), so the optimized plan never
    * carries the payload. Results are identical to the literal form. */
  def probe(spark: SparkSession)(bytes: Array[Byte], key: Column): Option[Column] =
    if (install(spark))
      Some(call_function("graft_bloom_probe",
        org.apache.spark.sql.functions.lit(bytes), key))
    else None
}
