package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the dedup pipeline.
  *
  * The declarative formulation (nested `transform`/`array_min` higher-order
  * functions) evaluates interpreted per element: k=32 permutations × ~50
  * shingles × rows was ~100 s for 5.5k docs — unusable at scale. These
  * expressions do the same math in one tight primitive-array loop per row
  * (~µs/row).
  *
  * Each implements `doGenCode` as a reference-object call into the
  * JIT-compiled kernel (ONE virtual call per row): children stay inside
  * whole-stage codegen — no interpreted re-evaluation of inputs, and
  * Catalyst's subexpression elimination applies, so a projection computing
  * both `shingle_hashes(text)` and `minhash_sig(shingle_hashes(text))`
  * hashes the shingles ONCE per row.
  *
  * Hashing is FNV-1a64 (public-domain constant set) — stable across engines
  * and JVMs; MinHash permutations are universal hashes in a 31-bit domain
  * (no long overflow under ANSI).
  */
object NativeTextExpressions {

  private[functions] def fnv1a64(s: String): Long = graft.util.Hashing.fnv1a64(s)

  /** word-n-gram shingle hashes of a string: lowercase, whitespace tokenize,
    * hash each n-gram, distinct, order of first appearance. */
  case class WordShingleHashes(child: Expression, n: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = text.toLowerCase.trim.split("\\s+")
      if (toks.length < n) new GenericArrayData(Array.empty[Long])
      else {
        val seen = new java.util.LinkedHashSet[java.lang.Long]()
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          seen.add(fnv1a64(sb.toString))
          i += 1
        }
        val out = new Array[Long](seen.size)
        val it = seen.iterator(); var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        new GenericArrayData(out)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("shingleKernel", this, classOf[WordShingleHashes].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-permutation MinHash signature over an array<long> of shingle hashes:
    * sig[j] = min over shingles of ((h mod p) * a_j + b_j) mod p,
    * p = 2^31-1. Empty shingle set → array of p (sentinel max). */
  case class MinHashSig(child: Expression, k: Int, seed: Long)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long>, got $t")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    private val p = 2147483647L // 2^31 - 1

    @transient private lazy val (as, bs) = {
      val rnd = new scala.util.Random(seed)
      (Array.fill(k)(rnd.nextInt(Int.MaxValue - 1).toLong + 1),
        Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong))
    }

    override def nullSafeEval(input: Any): Any = {
      val hashes = input.asInstanceOf[ArrayData].toLongArray()
      val mins = Array.fill(k)(p)
      var i = 0
      while (i < hashes.length) {
        val h = ((hashes(i) % p) + p) % p
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("minhashKernel", this, classOf[MinHashSig].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact Jaccard between two array<long> hash sets (sorted-merge-free:
    * hash-set probe of the smaller side). */
  case class LongSetJaccard(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true; case _ => false
      })) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long> inputs")
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def prettyName: String = "long_set_jaccard"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData].toLongArray()
      val ys = b.asInstanceOf[ArrayData].toLongArray()
      if (xs.isEmpty && ys.isEmpty) 0.0
      else {
        val set = new java.util.HashSet[java.lang.Long](xs.length * 2)
        xs.foreach(set.add(_))
        val nx = set.size
        var inter = 0
        val seenY = new java.util.HashSet[java.lang.Long](ys.length * 2)
        ys.foreach { y => if (seenY.add(y) && set.contains(y)) inter += 1 }
        val union = nx + seenY.size - inter
        if (union == 0) 0.0 else inter.toDouble / union
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("jaccardKernel", this, classOf[LongSetJaccard].getName)
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = ((java.lang.Double) $self.nullSafeEval($a, $b)).doubleValue();")
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  private val installedSessions =
    java.util.Collections.newSetFromMap(new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def install(spark: SparkSession): Boolean = synchronized {
    if (installedSessions.contains(spark)) true
    else try {
      val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      def intLit(e: Expression): Int = e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()
      def longLit(e: Expression): Long = e.asInstanceOf[Literal].value.asInstanceOf[Number].longValue()
      registry.registerFunction(FunctionIdentifier("shingle_hashes"),
        new ExpressionInfo(classOf[WordShingleHashes].getName, "shingle_hashes"),
        (exprs: Seq[Expression]) => WordShingleHashes(exprs(0), intLit(exprs(1))))
      registry.registerFunction(FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (exprs: Seq[Expression]) => MinHashSig(exprs(0), intLit(exprs(1)), longLit(exprs(2))))
      registry.registerFunction(FunctionIdentifier("long_set_jaccard"),
        new ExpressionInfo(classOf[LongSetJaccard].getName, "long_set_jaccard"),
        (exprs: Seq[Expression]) => LongSetJaccard(exprs(0), exprs(1)))
      installedSessions.add(spark)
      true
    } catch { case _: Throwable => false }
  }

  def shingleHashes(spark: SparkSession)(text: Column, n: Int): Option[Column] =
    if (install(spark)) Some(call_function("shingle_hashes", text, org.apache.spark.sql.functions.lit(n)))
    else None

  def minhashSig(spark: SparkSession)(hashes: Column, k: Int, seed: Long): Option[Column] =
    if (install(spark)) Some(call_function("minhash_sig", hashes,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(seed)))
    else None

  def longSetJaccard(spark: SparkSession)(a: Column, b: Column): Option[Column] =
    if (install(spark)) Some(call_function("long_set_jaccard", a, b))
    else None
}
