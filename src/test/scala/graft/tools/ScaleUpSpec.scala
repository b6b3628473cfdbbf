package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The skewed ScaleUp mode: uniform K× replication REDUCES relative skew,
  * so the hot-key failure mode a 100 TB corpus actually has (zipfian keys)
  * needs explicit injection — ~30% of orders onto one customer, ~30% of
  * events onto one user, deterministic selection, FK-valid hot keys. */
class ScaleUpSpec extends SparkSpec {

  test("skewed mode concentrates ~30% of fact rows on one existing dim key") {
    val dir = java.nio.file.Files.createTempDirectory("scaleup_skew").toString
    val k = 2
    ScaleUp.run(spark, graft.SparkSpec.sfDir, dir, k, mode = "skewed")

    // orders: top o_custkey holds ~HotFrac of all rows and exists in customer
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val top = graft.ops.ScaleOps.keySkewProfile(orders, "o_custkey", 1).head
    val share = top.getAs[Double]("share")
    assert(share > 0.25 && share < 0.35, s"hot o_custkey share $share not ~0.30")
    val hotKey = top.getLong(0)
    val customers = spark.read.parquet(s"$dir/customer.parquet")
    assert(customers.filter(col("c_custkey") === hotKey).count() === 1L,
      s"hot key $hotKey is not a valid customer")

    // events: same contract on user_id
    val events = spark.read.parquet(s"$dir/events.parquet")
    val evTop = graft.ops.ScaleOps.keySkewProfile(events, "user_id", 1).head
    val evShare = evTop.getAs[Double]("share")
    assert(evShare > 0.25 && evShare < 0.35, s"hot user_id share $evShare not ~0.30")

    // row counts are untouched by the remap (skew moves values, not rows)
    assert(orders.count() === sf("orders").count() * k)
    assert(events.count() === sf("events").count() * k)
  }

  test("uniform mode keeps per-key cardinality flat (no accidental skew)") {
    val dir = java.nio.file.Files.createTempDirectory("scaleup_uni").toString
    ScaleUp.run(spark, graft.SparkSpec.sfDir, dir, 2, mode = "uniform")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val top = graft.ops.ScaleOps.keySkewProfile(orders, "o_custkey", 1).head
    assert(top.getAs[Double]("share") < 0.01,
      s"uniform replication should not create a hot key: ${top.mkString(",")}")
  }
}
