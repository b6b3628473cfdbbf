package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.RelationalOps._

class RelationalOpsSpec extends SparkSpec {

  test("dedupKeepLatest keeps exactly the newest row per key, deterministically") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, "old"), ("a", 3, "new"), ("a", 2, "mid"),
      ("b", 5, "only"),
      ("c", 7, "tie1"), ("c", 7, "tie2")).toDF("k", "v", "tag")
    val out = dedupKeepLatest(df, Seq("k"), Seq(col("v").desc, col("tag").desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("a", "new"), ("b", "only"), ("c", "tie2")))
  }

  test("dedup is idempotent: silver(silver(x)) == silver(x)") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val once = dedupKeepLatest(df, Seq("k"), Seq(col("v").desc))
    val twice = dedupKeepLatest(once, Seq("k"), Seq(col("v").desc))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("antiJoin returns rows with no match; semiJoin the complement") {
    import spark.implicits._
    val l = Seq(1, 2, 3, 4).toDF("id")
    val r = Seq(2, 4).toDF("rid")
    assert(antiJoin(l, r, col("id") === col("rid")).as[Int].collect().sorted === Seq(1, 3))
    assert(semiJoin(l, r, col("id") === col("rid")).as[Int].collect().sorted === Seq(2, 4))
  }

  test("intervalJoin keeps only rows inside [lower, upper]") {
    import spark.implicits._
    val facts = Seq((1, 5), (1, 15), (2, 8)).toDF("k", "t")
    val spans = Seq((1, 0, 10), (2, 9, 20)).toDF("k2", "lo", "hi")
    val out = intervalJoin(facts, spans, col("k") === col("k2"),
      col("t"), col("lo"), col("hi"))
    assert(out.select("k", "t").collect().map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((1, 5)))
  }

  test("rollingSum over 2 preceding rows matches hand-computed frame") {
    import spark.implicits._
    val df = Seq(("p", 1, 10.0), ("p", 2, 20.0), ("p", 3, 30.0), ("p", 4, 40.0))
      .toDF("p", "seq", "v")
    val out = rollingSum(df, col("v"), "roll", Seq(col("p")), Seq(col("seq")), 2)
      .orderBy("seq").select("roll").as[Double].collect()
    assert(out.toSeq === Seq(10.0, 30.0, 60.0, 90.0))
  }

  test("guardedRatio yields null on zero denominator, ratio otherwise") {
    import spark.implicits._
    val df = Seq((10.0, 2.0), (5.0, 0.0)).toDF("num", "den")
    val out = df.select(guardedRatio(col("num"), col("den"))).collect()
    assert(out(0).getDouble(0) === 5.0)
    assert(out(1).isNullAt(0))
  }

  test("rate computes mean of boolean flag") {
    import spark.implicits._
    val df = Seq(true, true, false, false).toDF("f")
    assert(df.agg(rate(col("f"))).head.getDouble(0) === 0.5)
  }

  test("listaggDistinct is sorted and distinct") {
    import spark.implicits._
    val df = Seq("b", "a", "b", "c").toDF("x")
    assert(df.agg(listaggDistinct(col("x"), ", ")).head.getString(0) === "a, b, c")
  }

  test("asofJoin matches latest-at-or-before per key, null when none") {
    import spark.implicits._
    val trades = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 5L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 15L, 3.0),
      ("B", 9L, 9.0)).toDF("sym", "t", "px")
    val out = asofJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_ => r.getLong(3)),
        Option(r.get(4)).map(_ => r.getDouble(4))))
    // trade 1 at t=10: quote AT t=10 matches (inclusive), not t=8
    // trade 2 at t=20: latest earlier quote is t=15
    // trade 3 (B) at t=5: B's only quote is at t=9 → no predecessor → null
    assert(out.toSeq === Seq(
      (1L, Some(10L), Some(2.0)),
      (2L, Some(15L), Some(3.0)),
      (3L, None, None)))
  }

  test("asofJoin plans exactly one shuffle (union+window, no theta join)") {
    import spark.implicits._
    val left = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val right = Seq(("A", 8L, 1.0)).toDF("k", "t", "v")
    val plan = asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1, s"expected 1 shuffle, got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("asofJoin tiebreak picks the greatest when right timestamps collide") {
    import spark.implicits._
    val left = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val right = Seq(("A", 10L, 7L, 1.0), ("A", 10L, 9L, 2.0), ("A", 10L, 8L, 3.0))
      .toDF("k", "t", "rid", "v")
    val out = asofJoin(left, right, Seq("k"), "t", "t", Seq("rid", "v"),
      tiebreak = Seq("rid")).collect()(0)
    assert(out.getLong(out.fieldIndex("asof_rid")) === 9L)
    assert(out.getDouble(out.fieldIndex("asof_v")) === 2.0)
  }
}
