package graft.tools

import org.apache.spark.sql.SparkSession

/** q70 planning-vs-execution split (guide §7.3: large unions can be
  * planning-bound; measure before restructuring). */
object ProfileQ70 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach { t =>
      try graft.Tables(spark, sfDir, t).count() catch { case _: Throwable => } }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val df = time("construct") {
        graft.SparkEntry.allQueries.find(_.name == "q70_fuzz_differential").get
          .run(spark, sfDir)
      }
      time("analyze") { df.schema }
      val qe = df.queryExecution
      time("optimize") { qe.optimizedPlan }
      time("physical") { qe.executedPlan }
      time("execute(count)") { df.count() }
      spark.catalog.clearCache()
    }
    // per-case: plan+run the 30 cases individually to see the sum
    println("--- per-case (separate actions) ---")
    val cases = graft.tools.Fuzz.gen(70L, 30, singleAgg = true)
    time("30 separate counts") {
      cases.foreach { c => Fuzz.normalizedDf(spark, sfDir, c).count() }
    }
    // concurrent localCheckpoint per case (guide §2.6 overlap independent
    // jobs), then union the materialized results
    (1 to 3).foreach { rep =>
      time(s"pooled checkpoint+union rep$rep") {
        import scala.concurrent._
        import scala.concurrent.duration._
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(
          java.util.concurrent.Executors.newFixedThreadPool(8))
        val futs = cases.map { c => Future {
          Fuzz.normalizedDf(spark, sfDir, c).localCheckpoint(true)
        } }
        val dfs = futs.map(Await.result(_, 120.seconds))
        val n = dfs.reduce(_.union(_)).count()
        ec.asInstanceOf[ExecutionContextExecutorService].shutdown()
        println(s"  rows=$n")
      }
    }
    spark.stop()
  }
}
