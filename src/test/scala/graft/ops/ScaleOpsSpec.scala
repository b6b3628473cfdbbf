package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleOpsSpec extends SparkSpec {

  test("saltedEquiJoin returns exactly the same rows as a plain equi join") {
    import spark.implicits._
    // skewed left: key 1 carries most rows
    val left = (Seq.fill(500)(1) ++ (2 to 50)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "lv")
    val right = (1 to 50).map(k => (k, s"dim$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv").collect().toSet
    val salted = ScaleOps.saltedEquiJoin(left, right, "k", buckets = 8)
      .select("k", "lv", "rv").collect().toSet
    assert(salted === plain)
    // left-preserving variant: unmatched left rows appear exactly once
    val rightPartial = (1 to 25).map(k => (k, s"dim$k")).toDF("k", "rv")
    val plainLeft = left.join(rightPartial, Seq("k"), "left")
      .select("k", "lv", "rv").collect().toSet
    val saltedLeft = ScaleOps.saltedEquiJoin(left, rightPartial, "k", 8, "left")
      .select("k", "lv", "rv").collect().toSet
    assert(saltedLeft === plainLeft)
  }

  test("salting rebalances the shuffle partitions of a 30%-hot key") {
    import spark.implicits._
    // ScaleUp-skewed shape: ~30% of the fact on ONE key. The claim salting
    // makes is about SHUFFLE BALANCE — the hot key's rows land on one
    // reducer in a plain hash join, on `buckets` reducers when the key
    // becomes (key, salt). Balance is asserted on the exact partition
    // function Spark's HashPartitioning uses (pmod(hash(keys), P)), which is
    // deterministic; wall-time is not asserted here (CI noise) — it is
    // measured on the 10×-skewed corpus by graft.tools.SkewBench and
    // recorded in SCALE_r{N}.json.
    val n = 30000
    val hot = 7
    val left = (1 to n).map(i =>
      (if (i % 10 < 3) hot else i % 997 + 100, i)).toDF("k", "lv")
    val P = 32
    def maxPartitionShare(keys: org.apache.spark.sql.Column*): Double = {
      val per = left.groupBy(pmod(hash(keys: _*), lit(P)).as("p"))
        .agg(count(lit(1)).as("n"))
      per.agg(max(col("n"))).head.getLong(0).toDouble / n
    }
    val naive = maxPartitionShare(col("k"))
    assert(naive >= 0.30, s"fixture lost its hot key: max share $naive")
    val buckets = 16
    // same salt construction as saltedEquiJoin (rand(42) is deterministic
    // for a fixed input partitioning)
    val salted = left.withColumn("__salt", (rand(42) * buckets).cast("int"))
    val balanced = {
      val per = salted.groupBy(pmod(hash(col("k"), col("__salt")), lit(P)).as("p"))
        .agg(count(lit(1)).as("n"))
      per.agg(max(col("n"))).head.getLong(0).toDouble / n
    }
    assert(balanced * 4 < naive,
      s"salting did not rebalance: naive max share $naive, salted $balanced")
    // and the salted join still returns exactly the plain join's rows
    val right = ((100 to 1100) :+ hot).map(k => (k, s"d$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv").collect().toSet
    val sj = ScaleOps.saltedEquiJoin(left, right, "k", buckets)
      .select("k", "lv", "rv").collect().toSet
    assert(sj === plain)
  }

  test("bucketed tables join without an exchange on either side") {
    val o = sf("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val l = sf("lineitem").select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    ScaleOps.writeBucketed(o, "b_orders", "o_orderkey", 4)
    ScaleOps.writeBucketed(l, "b_lineitem", "o_orderkey", 4)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected co-located bucketed join, got:\n$plan")
    assert(joined.count() === sf("lineitem").count())
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("zorderWrite preserves content and skips on the non-leading column") {
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val zDir = s"$dir/z"
    val linearDir = s"$dir/linear"
    val files = 8
    ScaleOps.zorderWrite(li, Seq("l_partkey", "l_suppkey"), zDir, targetFiles = files)
    // linear baseline: sorted by the LEADING column only — suppkey values
    // spread over every file, so a suppkey predicate can't skip anything
    li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linearDir)

    val z = spark.read.parquet(zDir)
    // content identical — clustering is a pure reorder
    assert(z.count() === li.count())
    assert(z.agg(sum("l_quantity")).head.getDouble(0) ===
      li.agg(sum("l_quantity")).head.getDouble(0))

    // skipping effectiveness: fraction of files whose [min,max] range on the
    // SECOND clustering column overlaps a narrow predicate
    // predicate band = a narrow off-center slice (a median-centered band
    // straddles the top z-bit boundary and touches both halves by design),
    // derived from the data so the test adapts to any scale factor
    def band(colName: String): (Double, Double) = {
      val q = li.stat.approxQuantile(colName, Array(0.20, 0.30), 0.0)
      (q(0), q(1))
    }
    def overlapping(path: String, colName: String, lo: Double, hi: Double): Long =
      ScaleOps.fileRangeStats(spark.read.parquet(path), colName)
        .filter(col("lo") <= hi && col("hi") >= lo).count()

    val (slo, shi) = band("l_suppkey")
    val zHit = overlapping(zDir, "l_suppkey", slo, shi)
    val linHit = overlapping(linearDir, "l_suppkey", slo, shi)
    assert(linHit === files.toLong, "leading-column sort should not skip on suppkey")
    assert(zHit < linHit, s"z-order should prune files on the second column ($zHit vs $linHit)")

    // and the z-order layout still skips on the FIRST column too
    val (plo, phi) = band("l_partkey")
    val zFirst = overlapping(zDir, "l_partkey", plo, phi)
    assert(zFirst < files.toLong, "z-order should also prune on the first column")
  }

  test("keySkewProfile surfaces the hot key first") {
    import spark.implicits._
    val df = (Seq.fill(90)("hot") ++ Seq.fill(10)("cold")).toDF("k")
    val top = ScaleOps.keySkewProfile(df, "k", 2).collect()
    assert(top(0).getString(0) === "hot")
    assert(top(0).getDouble(2) === 0.9)
  }
}
