package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>`/`array<double>` columns using
  * Spark higher-order functions (`zip_with`/`aggregate`) — sequential,
  * deterministic summation, no UDF, no shuffle. For the 100 TB path the same
  * expressions run inside the scan stage; a codegen'd Catalyst Expression is
  * the next optimization step if profiles show HOF overhead dominating.
  */
object VectorFunctions {

  /** Cast to double before any arithmetic so accumulation error and oracle
    * comparisons are well-defined. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def vdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def vnorm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; null-safe on zero vectors (returns null, as DuckDB
    * list_cosine_similarity yields NaN/err — callers filter). */
  def cosine(a: Column, b: Column): Column = {
    val d = vdot(a, b); val na = vnorm(a); val nb = vnorm(b)
    when(na > 0 && nb > 0, d / (na * nb))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH: `nBits` sign bits of dots
    * with seeded Gaussian hyperplanes, packed into a long. Deterministic:
    * hyperplanes come from a fixed-seed RNG at plan-build time and enter the
    * plan as literals (broadcast-free, executor-local).
    *
    * Scale path for ANN: bucket by bands of these bits, join within buckets —
    * turns the O(n²) all-pairs cosine into a shuffle on bucket keys.
    */
  def hyperplaneBits(v: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(vdot(v, planeLit) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Split an nBits hyperplane signature into `bands` band-bucket values for
    * banded LSH (any band match → candidate pair). */
  def bandBuckets(bits: Column, nBits: Int, bands: Int): Column = {
    val r = nBits / bands
    val mask = (1L << r) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), shiftright(bits, b * r).bitwiseAND(lit(mask)).as("bucket"))
    }: _*)
  }
}
