package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge cases for the native kernels: nulls, empty arrays, length
  * mismatches, and agreement with the declarative HOF formulations. */
class NativeExpressionsSpec extends SparkSpec {

  test("vec_cosine: agrees with HOF cosine bit-for-bit on real embeddings") {
    assume(NativeVectorExpressions.install(spark))
    import VectorFunctions._
    val e = sf("embeddings").limit(50)
      .select(asDouble(col("embedding")).as("v"))
    val paired = e.withColumn("w", reverse(col("v")))
    val rows = paired.select(
      cosine(col("v"), col("w")).as("hof"),
      call_function("vec_cosine", col("v"), col("w")).as("native")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("vec_cosine: null input → null, zero vector → null, length mismatch → min-length prefix") {
    assume(NativeVectorExpressions.install(spark))
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))),
      (None, Some(Seq(1.0, 2.0))),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))),
      (Some(Seq(1.0, 0.0, 5.0)), Some(Seq(1.0, 0.0)))).toDF("a", "b")
    val out = df.select(call_function("vec_cosine", col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))           // zero norm guarded
    assert(math.abs(out(3).getDouble(0) - 1.0) < 1e-12) // prefix [1,0]·[1,0]
  }

  test("shingle_hashes: empty and short strings yield empty arrays; dedup within doc") {
    assume(NativeTextExpressions.install(spark))
    import spark.implicits._
    val df = Seq("", "one two", "a b c a b c a b c").toDF("t")
      .selectExpr("shingle_hashes(t, 3) AS h")
    val out = df.collect().map(_.getSeq[Long](0))
    assert(out(0).isEmpty)
    assert(out(1).isEmpty)               // 2 tokens < n=3
    // 7 raw 3-grams but only 3 distinct ("a b c","b c a","c a b")
    assert(out(2).length === 3)
  }

  test("minhash_sig: empty shingle set → sentinel signature; deterministic across calls") {
    assume(NativeTextExpressions.install(spark))
    import spark.implicits._
    val df = Seq((Seq.empty[Long], Seq(42L, 7L))).toDF("e", "h")
      .selectExpr("minhash_sig(e, 8, 42L) AS se", "minhash_sig(h, 8, 42L) AS sh",
        "minhash_sig(h, 8, 42L) AS sh2")
    val r = df.head
    assert(r.getSeq[Long](0).forall(_ == 2147483647L))
    assert(r.getSeq[Long](1) === r.getSeq[Long](2))
  }

  test("long_set_jaccard agrees with the declarative string-set jaccard") {
    assume(NativeTextExpressions.install(spark))
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L), Seq(1L, 2L, 2L)),   // duplicates inside inputs
      (Seq.empty[Long], Seq.empty[Long])).toDF("x", "y")
    val out = df.selectExpr("long_set_jaccard(x, y) AS j").as[Double].collect()
    assert(out(0) === 0.5)
    assert(out(1) === 1.0)
    assert(out(2) === 0.0)
  }

  test("hyperplane_bits: native kernel is bit-identical to the HOF formulation") {
    assume(NativeVectorExpressions.install(spark))
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val e = sf("embeddings").limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      NativeVectorExpressions.hyperplaneBitsFast(spark)(col("v"), 64, 64, 42L).as("native"),
      VectorFunctions.hyperplaneBits(col("v"), 64, 64, 42L).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // and nBits < 64 variants agree too
    val both16 = e.select(
      NativeVectorExpressions.hyperplaneBitsFast(spark)(col("v"), 64, 16, 7L).as("native"),
      VectorFunctions.hyperplaneBits(col("v"), 64, 16, 7L).as("hof"))
    assert(both16.filter(col("native") =!= col("hof")).count() === 0)
  }
}
