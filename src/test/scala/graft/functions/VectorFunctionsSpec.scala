package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {

  test("int8 quantization: max element hits ±127, error bounded by s/2") {
    import spark.implicits._
    val df = Seq(Seq(0.3, -1.2, 0.75, 0.0), Seq(2.0, -2.0, 1.0, 0.5))
      .toDF("v").select(asDouble(col("v")).as("v"))
      .withColumn("s", int8Scale(col("v")))
      .withColumn("qv", int8Quantize(col("v"), col("s")))
    df.collect().foreach { r =>
      val v = r.getSeq[Double](0); val s = r.getDouble(1)
      val qv = r.getSeq[Double](2)
      assert(s === v.map(math.abs).max / 127.0)
      // grid values are exact integers in [-127, 127]; the extreme is hit
      assert(qv.forall(q => q == math.floor(q) && math.abs(q) <= 127.0))
      assert(qv.map(math.abs).max === 127.0)
      // dequantized error is at most half a grid step per element
      v.zip(qv).foreach { case (x, q) => assert(math.abs(q * s - x) <= s / 2 + 1e-12) }
    }
  }

  test("int8 quantization maps the zero vector to all-zeros, not NaN") {
    import spark.implicits._
    val r = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .select(asDouble(col("v")).as("v"))
      .withColumn("s", int8Scale(col("v")))
      .select(int8Quantize(col("v"), col("s"))).head.getSeq[Double](0)
    assert(r === Seq(0.0, 0.0, 0.0))
  }

  test("quantized cosine tracks exact cosine closely on real embeddings") {
    val e = sf("embeddings").limit(200)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("s", int8Scale(col("v")))
      .withColumn("qv", int8Quantize(col("v"), col("s")))
    val a = e.select(col("vec_id"), col("v").as("va"), col("qv").as("qa"))
    val b = e.select((col("vec_id") - 1).as("vec_id"),
      col("v").as("vb"), col("qv").as("qb"))
    val errs = a.join(b, "vec_id")
      .select(abs(cosine(col("qa"), col("qb")) - cosine(col("va"), col("vb"))))
      .collect().map(_.getDouble(0))
    assert(errs.nonEmpty)
    // int8 keeps cosine error well under 1% on unit-ish embeddings
    assert(errs.max < 0.01, s"max quantized-cosine error ${errs.max}")
  }
}
