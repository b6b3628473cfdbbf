package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.RelationalOps._
import graft.operators.Dedup

/** Property tests (SURVEY.md §5 test plan): algebraic invariants checked
  * over ScalaCheck-generated inputs (sampled with fixed seeds — runs are
  * deterministic; Spark job count bounded by the sample count).
  */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: dedup is idempotent and keeps exactly one row per key") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1, 5), Gen.choose(0, 100), Gen.alphaStr.map(_.take(4))))
    samples(gen, 8).foreach { rows =>
      val df = rows.toDF("k", "v", "tag")
      val order = Seq(col("v").desc, col("tag").desc)
      val once = dedupKeepLatest(df, Seq("k"), order)
      val twice = dedupKeepLatest(once, Seq("k"), order)
      val o = once.collect().toSet
      assert(o === twice.collect().toSet)
      assert(o.size === rows.map(_._1).distinct.size)
    }
  }

  test("property: rate is always within [0,1]") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.oneOf(true, false)))
    samples(gen, 8).foreach { rows =>
      val r = rows.toDF("g", "f").groupBy(col("g")).agg(rate(col("f")).as("r"))
        .select("r").as[Double].collect()
      assert(r.forall(x => x >= 0.0 && x <= 1.0))
    }
  }

  test("property: jaccard symmetric, within [0,1], and 1 iff equal sets") {
    import spark.implicits._
    val strList = Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e"))
    samples(Gen.zip(strList, strList), 10).foreach { case (xs, ys) =>
      val df = Seq((xs, ys)).toDF("x", "y")
      val Array(j1, j2) = df.select(
        Dedup.jaccard(col("x"), col("y")), Dedup.jaccard(col("y"), col("x")))
        .head.toSeq.map(_.asInstanceOf[Double]).toArray
      assert(math.abs(j1 - j2) < 1e-12)
      assert(j1 >= 0.0 && j1 <= 1.0)
      if (xs.toSet == ys.toSet && xs.nonEmpty) assert(j1 === 1.0)
    }
  }

  test("property: native minhash signature slots only decrease when shingles are added") {
    import graft.functions.NativeTextExpressions
    import spark.implicits._
    assume(NativeTextExpressions.install(spark))
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 1000000L))
    samples(gen, 8).foreach { hashes =>
      val df = Seq((hashes, hashes ++ hashes.map(_ + 7))).toDF("a", "b")
        .selectExpr("minhash_sig(a, 16, 42L) AS sa", "minhash_sig(b, 16, 42L) AS sb")
      val row = df.head
      val sa = row.getSeq[Long](0); val sb = row.getSeq[Long](1)
      assert(sa.zip(sb).forall { case (x, y) => y <= x })
    }
  }

  test("property: hidden-partition pruning never changes results (soundness)") {
    // The optimizer rule derives day-granularity bounds; for ANY comparison
    // shape and bound, the pruned result must equal the same filter over an
    // unpartitioned copy of the identical data.
    import spark.implicits._
    val rows = samples(Gen.zip(Gen.choose(1, 28), Gen.choose(0, 23)), 40)
      .zipWithIndex.map { case ((day, hour), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2025-03-$day%02d $hour%02d:30:00"))
      }
    val df = rows.toDF("id", "ts")
    graft.sources.Catalog.ctasDayPartitioned(spark, "prop_hidden_day", df, "ts")
    try {
      val partitioned = spark.table("prop_hidden_day")
      val bounds = Seq("2025-03-05 11:00:00", "2025-03-14 00:00:00", "2025-03-27 23:59:59")
      val preds = for {
        b <- bounds
        p <- Seq(col("ts") >= b, col("ts") > b, col("ts") <= b, col("ts") < b,
          col("ts") === rows.head._2, col("ts") >= bounds(0) && col("ts") < bounds(1))
      } yield p
      preds.foreach { p =>
        val pruned = partitioned.filter(p).select("id").as[Long].collect().sorted.toSeq
        val plain = df.filter(p).select("id").as[Long].collect().sorted.toSeq
        assert(pruned === plain, s"pruning changed results for predicate $p")
      }
    } finally spark.sql("DROP TABLE IF EXISTS prop_hidden_day")
  }
}
