package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class DedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
      (4L, "completely different content about distributed query engines and shuffles"),
      (5L, "another unrelated document discussing vectorized execution and codegen stages"))
      .toDF("doc_id", "text")
  }

  test("exactDedup keeps one row per distinct text") {
    val out = Dedup.exactDedup(corpus, col("text"), Seq(col("doc_id")))
    assert(out.count() === 4)
    // deterministic winner: lowest doc_id
    assert(out.filter(col("doc_id") === 1).count() === 1)
    assert(out.filter(col("doc_id") === 2).count() === 0)
  }

  test("exactDupGroups reports exactly the duplicated hash") {
    val g = Dedup.exactDupGroups(corpus, col("text")).collect()
    assert(g.length === 1 && g(0).getLong(1) === 2L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))  // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => b === 4L || b === 5L })
  }

  test("jaccard is exact on known shingle sets") {
    import spark.implicits._
    val df = Seq((Seq("a b", "b c", "c d"), Seq("b c", "c d", "d e"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).head.getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12) // 2 shared / 4 union
  }

  test("simhash: identical text → identical fingerprint; near text → close") {
    import spark.implicits._
    val df = corpus.withColumn("fp", Dedup.simhash64(col("text")))
    val fps = df.select("doc_id", "fp").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) <= 8)
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(4L)) > 8)
  }

  test("simhashPairs flags the exact-dup pair") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("shingles produce overlapping word n-grams") {
    import spark.implicits._
    val out = Seq("a b c d").toDF("t")
      .select(shingles(tokens(col("t")), 2)).head.getSeq[String](0)
    assert(out === Seq("a b", "b c", "c d"))
  }

  test("connectedComponents groups transitive pairs into min-labeled clusters") {
    import spark.implicits._
    // 1-2, 2-3 are only pairwise-similar through 2 (A~B, B~C, A̸~C), plus a
    // disjoint 7-8 pair; 3 never pairs with 1 directly
    val pairs = Seq((2L, 1L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents converges on a long chain (diameter >> rounds)") {
    import spark.implicits._
    // a 40-link chain: plain min-label propagation needs 40 rounds; the
    // alternating star algorithm must finish well inside maxIter.
    // smallGraphEdges = 0 forces the DISTRIBUTED loop (the default would
    // resolve this tiny graph on the driver and skip the rounds under test).
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 15,
      smallGraphEdges = 0)
    val comps = cc.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length === 41)
    assert(comps.forall(_._2 == 0L))
  }

  test("small-graph fast path ≡ distributed star loop on random graphs") {
    import spark.implicits._
    // the fast path (bounded collect + union-find) must produce the exact
    // (id, component-min) assignment of the distributed rounds, including
    // self-loop-only nodes being dropped and duplicate/reversed edges
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val edges = (0 until (n * 2)).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong) // includes self-loops
      } ++ Seq((n.toLong, n.toLong)) // a guaranteed self-loop-only node
      val df = edges.toDF("id_a", "id_b")
      val fast = Dedup.connectedComponents(df, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(df, "id_a", "id_b",
          smallGraphEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast === dist, s"trial $trial: fast path diverged")
      assert(!fast.contains(n.toLong), "self-loop-only node must be absent")
    }
  }

  test("fast-path bound is a hard cutover: above it the distributed loop runs") {
    import spark.implicits._
    // bound smaller than the edge count → the probe must abandon and the
    // distributed loop produce the same labels
    val pairs = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val viaBound = Dedup.connectedComponents(pairs, "id_a", "id_b",
        smallGraphEdges = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBound === (0L to 20L).map(_ -> 0L).toMap)
  }

  test("connectedComponents on an empty pair list returns no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() === 0L)
  }

  test("incremental delta path ≡ full recompute on a two-wave corpus") {
    import spark.implicits._
    // wave 1: base docs incl. an existing near-dup pair (1,2) and a loner 3;
    // wave 2 (delta): 10 is a near-dup of 3 (merges a previously-unpaired
    // old doc), 11 of 1 (extends an existing cluster), 12+13 are near-dups
    // of each other only (new-new), 14 matches nothing
    def doc(id: Long, tail: String) =
      (id, s"alpha beta gamma delta epsilon zeta eta theta $tail")
    val wave1 = Seq(doc(1, "one two three"), doc(2, "one two four"),
      doc(3, "iota kappa lambda"), doc(4, "unrelated totally different words entirely")).toDF("doc_id", "text")
    val wave2 = Seq(doc(10, "iota kappa mu"), doc(11, "one two five"),
      doc(12, "nu xi omicron"), doc(13, "nu xi pi"),
      (14L, "completely dissimilar content nothing shared here at all ok")).toDF("doc_id", "text")
    val thr = 0.35

    // full recompute over the whole corpus
    val full = Dedup.connectedComponents(
      Dedup.nearDupPairs(wave1.unionByName(wave2), "doc_id", "text", thr),
      "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // delta path: index wave1 once, delta-index wave2, merge components
    val idx1 = Dedup.dedupIndex(wave1, "doc_id", "text")
    val idx2 = Dedup.dedupIndex(wave2, "doc_id", "text")
    val oldPairs = Dedup.nearDupPairs(wave1, "doc_id", "text", thr)
    val oldCC = Dedup.connectedComponents(oldPairs, "id_a", "id_b")
    val deltaPairs = Dedup.nearDupPairsDelta(idx1, idx2, thr)
    val merged = Dedup.mergeComponents(oldCC, deltaPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(merged === full)
    // and the delta pair list is exactly the full pair list minus old-old
    val fullPairs = Dedup.nearDupPairs(wave1.unionByName(wave2), "doc_id", "text", thr)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldSet = oldPairs.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltaSet = deltaPairs.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oldSet.union(deltaSet) === fullPairs)
    assert(deltaSet.intersect(oldSet).isEmpty)
  }

  test("connectedComponents with a reliable checkpoint dir matches localCheckpoint") {
    import spark.implicits._
    // cluster-mode path: rounds truncate via reliable .checkpoint() into the
    // given dir (survives executor loss) — components must be identical
    val dir = java.nio.file.Files.createTempDirectory("cc_reliable").toString
    val pairs = (Seq((2L, 1L), (2L, 3L), (7L, 8L)) ++
      (100L until 120L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val reliable = Dedup.connectedComponents(pairs, "id_a", "id_b",
        checkpointDir = Some(dir), smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Dedup.connectedComponents(pairs, "id_a", "id_b",
        smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    // the reliable dir was actually used for round snapshots
    assert(new java.io.File(dir).listFiles() != null &&
      new java.io.File(dir).listFiles().nonEmpty)
  }
}
