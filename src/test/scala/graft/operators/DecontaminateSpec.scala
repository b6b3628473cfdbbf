package graft.operators

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {

  test("overlapReport flags eval docs sharing an n-gram, skips clean ones") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different training content here now")).toDF("id", "text")
    val eval = Seq(
      // shares the 5-gram "quick brown fox jumps over" (and more) with doc 1
      (10L, "a quick brown fox jumps over fences"),
      // clean: no 5-token run in common with any train doc
      (11L, "nothing in common with anything above at all")).toDF("id", "text")
    val out = Decontaminate.overlapReport(train, eval, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((10L, 1L, 1L)))
  }

  test("overlapReport counts multiple leaking train docs and shingles") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "omega alpha beta gamma delta epsilon")).toDF("id", "text")
    // contains "alpha beta gamma delta epsilon" (in both train docs) and
    // "beta gamma delta epsilon zeta" (train doc 1 only)
    val eval = Seq((10L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val Array((d, nTrain, nSh)) = Decontaminate.overlapReport(train, eval, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d === 10L && nTrain === 2L && nSh === 2L)
  }

  test("short documents (< n tokens) produce no shingles and never match") {
    import spark.implicits._
    val train = Seq((1L, "tiny doc")).toDF("id", "text")
    val eval = Seq((10L, "tiny doc")).toDF("id", "text")
    assert(Decontaminate.overlapReport(train, eval, "id", "text", n = 5).count() === 0L)
  }
}
