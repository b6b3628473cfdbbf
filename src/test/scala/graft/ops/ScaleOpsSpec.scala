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

  test("keySkewProfile surfaces the hot key first") {
    import spark.implicits._
    val df = (Seq.fill(90)("hot") ++ Seq.fill(10)("cold")).toDF("k")
    val top = ScaleOps.keySkewProfile(df, "k", 2).collect()
    assert(top(0).getString(0) === "hot")
    assert(top(0).getDouble(2) === 0.9)
  }
}
