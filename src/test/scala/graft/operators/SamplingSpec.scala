package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def docs = sf("documents")

  test("split assignment partitions every row into exactly one split, stably") {
    val withSplit = docs.withColumn("split", Sampling.splitAssign(col("doc_id"), 80, 10))
    val total = docs.count()
    val bySplit = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum === total)             // partition: no loss, no dup
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // ~80/10/10 within tolerance on ~500 docs
    assert(bySplit("train").toDouble / total > 0.70 &&
      bySplit("train").toDouble / total < 0.90)
    // determinism: recomputation yields the identical assignment per row
    val twice = docs.withColumn("s1", Sampling.splitAssign(col("doc_id")))
      .withColumn("s2", Sampling.splitAssign(col("doc_id")))
    assert(twice.filter(col("s1") =!= col("s2")).count() === 0)
  }

  test("deterministic sample selects a stable subset of the requested size") {
    val s20 = Sampling.deterministicSample(docs, col("doc_id"), 20)
    val frac = s20.count().toDouble / docs.count()
    assert(frac > 0.10 && frac < 0.30)
    // re-running selects the SAME rows (no RNG state) — unlike df.sample
    val ids1 = s20.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.deterministicSample(docs, col("doc_id"), 20)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 === ids2)
    // and the 20% sample is a subset of the 50% sample (nested by design)
    val ids50 = Sampling.deterministicSample(docs, col("doc_id"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.forall(ids50.contains))
  }

  test("stratifiedSample keeps per-stratum rates and is stable across rate changes") {
    val rates = Map("src1" -> 100, "src2" -> 0)
    val out = Sampling.stratifiedSample(docs, col("doc_id"), col("source"),
      rates, defaultPct = 50)
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src1") === totals("src1"))     // 100% kept
    assert(!bySource.contains("src2"))              // 0% kept
    // default strata keep exactly the rows whose bucket < 50 — the same
    // rows deterministicSample(50) keeps, so changing OTHER strata's rates
    // never flips a row's fate
    val src3Kept = out.filter(col("source") === "src3")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val src3Direct = Sampling.deterministicSample(
        docs.filter(col("source") === "src3"), col("doc_id"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(src3Kept === src3Direct)
  }

  test("epoch shuffle is a deterministic permutation that varies by seed") {
    val base = docs.select("doc_id")
    val e1 = Sampling.epochShuffle(base, col("doc_id"), 1L).collect().map(_.getLong(0)).toSeq
    val e1b = Sampling.epochShuffle(base, col("doc_id"), 1L).collect().map(_.getLong(0)).toSeq
    val e2 = Sampling.epochShuffle(base, col("doc_id"), 2L).collect().map(_.getLong(0)).toSeq
    assert(e1 === e1b)                      // reproducible
    assert(e1.sorted === e2.sorted)         // permutation of the same rows
    assert(e1 !== e2)                       // different epoch → different order
    assert(e1 !== e1.sorted)                // actually shuffled
  }
}
