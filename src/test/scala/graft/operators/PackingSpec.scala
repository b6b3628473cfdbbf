package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class PackingSpec extends SparkSpec {

  private def docs = sf("documents")

  /** (shard, doc_id, n_tokens) rows of the test corpus, driver-side, for the
    * naive reference implementations. */
  private def rows: Seq[(Long, Long, Long)] = {
    val d = docs.select(
      Packing.shardOf(col("doc_id"), 8).as("shard"),
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n"))
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** Naive single-threaded greedy packer — the executable definition the
    * distributed mapPartitions pass must reproduce exactly. */
  private def naiveGreedy(rs: Seq[(Long, Long, Long)], budget: Long)
      : Map[(Long, Long), Long] =
    rs.groupBy(_._1).flatMap { case (shard, grp) =>
      var acc = 0L; var pack = 0L
      grp.sortBy(_._2).map { case (_, id, tok) =>
        if (acc > 0 && acc + tok > budget) { pack += 1; acc = 0L }
        acc += tok
        (shard, id) -> pack
      }
    }

  test("packGreedy matches the naive sequential packer on real data") {
    val d = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val got = Packing
      .packGreedy(d, col("doc_id"), col("n_tokens"),
        Packing.shardOf(col("doc_id"), 8), budget = 256)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got === naiveGreedy(rows, 256))
  }

  test("packGreedy invariants: budget respected, pack ids dense from zero") {
    val budget = 200L
    val d = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = Packing.packGreedy(d, col("doc_id"), col("n_tokens"),
      Packing.shardOf(col("doc_id"), 8), budget)
    // no multi-doc pack exceeds the budget (a single oversized doc may)
    val over = packed.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > budget && col("n") > 1)
    assert(over.count() === 0)
    // pack ids per shard are 0..max with no gaps
    val perShard = packed.groupBy("shard")
      .agg(min("pack_id").as("lo"), max("pack_id").as("hi"),
        countDistinct("pack_id").as("nd"))
      .collect()
    perShard.foreach { r =>
      assert(r.getLong(1) === 0L)
      assert(r.getLong(3) === r.getLong(2) + 1)
    }
  }

  test("packGreedy is deterministic across input partitioning") {
    val d = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    def run(df: org.apache.spark.sql.DataFrame) = Packing
      .packGreedy(df, col("doc_id"), col("n_tokens"),
        Packing.shardOf(col("doc_id"), 8), budget = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(run(d.repartition(13)) === run(d.coalesce(1)))
  }

  test("packGreedy gives an oversized document a pack of its own") {
    import spark.implicits._
    // budget 10; doc 2 has 25 tokens — it must sit alone, and packing resumes
    val d = Seq((1L, 4L), (2L, 25L), (3L, 5L), (4L, 5L), (5L, 3L))
      .toDF("doc_id", "n_tokens")
    val got = Packing
      .packGreedy(d, col("doc_id"), col("n_tokens"), lit(0L), budget = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L))
  }

  test("chunkAssign offsets are contiguous and straddle flags are exact") {
    val seqLen = 256L
    val d = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val chunked = Packing.chunkAssign(d, col("doc_id"), col("n_tokens"),
        Packing.shardOf(col("doc_id"), 8), seqLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // per shard: offsets are the exclusive prefix sums in doc_id order
    chunked.groupBy(_._1).foreach { case (_, grp) =>
      var expect = 0L
      grp.sortBy(_._2).foreach { case (_, _, n, start, first, last, straddles) =>
        assert(start === expect)
        assert(first === start / seqLen)
        assert(last === (start + n - 1) / seqLen)
        assert(straddles === (first != last))
        expect += n
      }
    }
    // chunk count per shard is exactly ceil(totalTokens / seqLen)
    chunked.groupBy(_._1).foreach { case (_, grp) =>
      val total = grp.map(_._3).sum
      assert(grp.map(_._6).max === (total - 1) / seqLen)
    }
  }

  test("repetition stats: run-length mode agrees with hand counts") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a b c"),        // top: a×3 of 5; distinct 3/5
      (2L, "x y z"),            // top 1/3; distinct 1.0
      (3L, "spam spam spam spam")) // top 1.0; distinct 0.25
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextFunctions.topTokenFraction(col("text")).as("tf"),
        TextFunctions.distinctTokenRatio(col("text")).as("dr"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((0.6, 0.6)))
    assert(got(2L) === ((0.333333, 1.0)))
    assert(got(3L) === ((1.0, 0.25)))
  }

  test("PII redaction replaces every occurrence and counts them") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail me at bob1@example.com or ann@test.org thanks"),
      (2L, "call 415-555-1234 or 212-555-9876 now"),
      (3L, "clean text with no pii at all"))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextFunctions.emailCount(col("text")).as("ne"),
        TextFunctions.phoneCount(col("text")).as("np"),
        TextFunctions.redactPii(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(1L) === ((2, 0, "mail me at [EMAIL] or [EMAIL] thanks")))
    assert(got(2L) === ((0, 2, "call [PHONE] or [PHONE] now")))
    assert(got(3L) === ((0, 0, "clean text with no pii at all")))
  }
}
