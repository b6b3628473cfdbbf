package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Autonomous reflections (readme.md:381-389): monitor → create → serve →
  * retire, driven only by the observed workload. */
class WorkloadAdvisorSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString

  test("repeated aggregate shape is auto-materialized and then served from the scan") {
    val saved = spark.experimental.extraOptimizations
    try {
      val wh = java.nio.file.Files.createTempDirectory("auto_rf").toFile.getAbsolutePath
      val mats = new Materializations(spark, Some(wh))
      val advisor = new WorkloadAdvisor(spark, mats)
      val li = sf("lineitem")
      def rollup() = li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))

      // below threshold: nothing recommended yet
      advisor.observe(rollup()); advisor.observe(rollup())
      assert(advisor.recommendations(minCount = 3).isEmpty)
      assert(advisor.autoMaterialize(minCount = 3).isEmpty)

      // third sighting crosses the threshold
      advisor.observe(rollup())
      assert(advisor.recommendations(minCount = 3).map(_._2) === Seq(3L))
      val created = advisor.autoMaterialize(minCount = 3)
      assert(created.length === 1 && created.head.startsWith("auto_rf_"))
      assert(mats.isMaterialized(created.head))

      // the next identical query is served from the auto-reflection...
      val served = rollup()
      assert(planOf(served).contains("auto_rf"), s"not served:\n${planOf(served)}")
      assert(!planOf(served).contains("lineitem.parquet"))
      // ...with identical values (compare against the raw plan, rule stripped)
      val expect = {
        val s2 = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations = saved
        try rollup().collect().map(_.toString).sorted
        finally spark.experimental.extraOptimizations = s2
      }
      assert(served.collect().map(_.toString).sorted === expect)
      // a shape seen once is never materialized
      advisor.observe(li.groupBy(col("l_linestatus")).agg(max(col("l_quantity")).as("m")))
      assert(advisor.autoMaterialize(minCount = 3).isEmpty)

      // retire: many observations without the shape re-appearing
      (1 to 10).foreach(_ => advisor.observe(
        li.groupBy(col("l_linestatus")).agg(max(col("l_quantity")).as("m"))))
      val retired = advisor.retireStale(maxIdleObservations = 5)
      assert(retired === created)
      assert(!mats.isMaterialized(created.head))
    } finally spark.experimental.extraOptimizations = saved
  }
}
