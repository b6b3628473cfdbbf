package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializationsSpec extends SparkSpec {

  test("register/refresh/serve/retire reflection lifecycle") {
    val m = new Materializations(spark)
    var buildCount = 0
    m.register("agg_spend", () => {
      buildCount += 1
      sf("orders").groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("spend"))
    })
    // unmaterialized: serves the live definition
    assert(!m.isMaterialized("agg_spend"))
    val live = m.table("agg_spend").count()
    m.refresh("agg_spend")
    assert(m.isMaterialized("agg_spend"))
    val mat = m.table("agg_spend")
    assert(mat.count() === live)
    // served copy does not re-invoke the definition
    val before = buildCount
    m.table("agg_spend").count()
    assert(buildCount === before)
    m.retire("agg_spend")
    intercept[Exception](m.table("agg_spend"))
  }

  test("warehouse-backed reflection survives as parquet CTAS") {
    val wh = Files.createTempDirectory("refl").toFile.getAbsolutePath
    val m = new Materializations(spark, Some(wh))
    m.register("daily", () =>
      sf("orders").groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n")))
    m.refresh("daily")
    assert(new java.io.File(s"$wh/daily").exists())
    assert(spark.read.parquet(s"$wh/daily").count() === m.table("daily").count())
  }
}
