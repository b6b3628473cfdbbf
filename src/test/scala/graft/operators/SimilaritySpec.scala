package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

class SimilaritySpec extends SparkSpec {

  test("cosine matches hand-computed values") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))).toDF("a", "b")
    val out = df.select(cosine(asDouble(col("a")), asDouble(col("b")))).as[Double].collect()
    assert(math.abs(out(0) - 0.0) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK returns k ranked neighbors excluding self") {
    val e = sf("embeddings")
    val out = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
    val rows = out.collect()
    assert(rows.length === 15)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // ranks are 1..5 per query and sims are non-increasing within a query
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to 5))
      val sims = sorted.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK achieves reasonable recall against the exact baseline") {
    val e = sf("embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", 5, dim = 64,
      nBits = 16, bands = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("cosinePairsAbove is symmetric-free (a<b) and thresholded") {
    val out = Similarity.cosinePairsAbove(sf("embeddings"), "vec_id", "embedding", 0.3)
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.3))
  }

  test("ivfTopK achieves reasonable recall and exact sims within probed cells") {
    val e = sf("embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
      nCells = 8, nprobe = 4)
    val rows = ivf.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall too low")
    // probing all cells = exact search
    val full = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
      nCells = 8, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
  }
}
