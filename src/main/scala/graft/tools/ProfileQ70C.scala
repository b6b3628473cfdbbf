package graft.tools

import org.apache.spark.sql.SparkSession

/** q70 second-round bake-off: where do the pooled 2.1 s go, and do grouped
  * sub-unions / coalesce-before-checkpoint beat per-case checkpoints? */
object ProfileQ70C {
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
    val cases = Fuzz.gen(70L, 30, singleAgg = true)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    def pooled[T](threads: Int)(work: Seq[() => T]): Seq[T] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try work.map(w => Future(w())).map(Await.result(_, 10.minutes))
      finally pool.shutdown()
    }

    time("construct 30 dfs (serial, analysis lazy)") {
      cases.foreach(Fuzz.normalizedDf(spark, sfDir, _))
    }
    time("construct+analyze 30 (serial)") {
      cases.foreach(Fuzz.normalizedDf(spark, sfDir, _).schema)
    }
    (1 to 2).foreach { rep =>
      time(s"G pooled8 count only (no ckpt), rep$rep") {
        val ns = pooled(8)(cases.map(c => () => Fuzz.normalizedDf(spark, sfDir, c).count()))
        println(s"  rows=${ns.sum}")
      }
    }
    (1 to 2).foreach { rep =>
      time(s"F pooled8 coalesce(1)+ckpt+union, rep$rep") {
        val dfs = pooled(8)(cases.map(c => () =>
          Fuzz.normalizedDf(spark, sfDir, c).coalesce(1).localCheckpoint(true)))
        println(s"  rows=${dfs.reduce(_.union(_)).count()}")
      }
    }
    Seq(5, 10).foreach { g =>
      (1 to 2).foreach { rep =>
        time(s"I grouped($g) unions pooled, ckpt, rep$rep") {
          val dfs = pooled(8)(cases.grouped(g).toSeq.map(grp => () =>
            grp.map(Fuzz.normalizedDf(spark, sfDir, _)).reduce(_.union(_))
              .localCheckpoint(true)))
          println(s"  rows=${dfs.reduce(_.union(_)).count()}")
        }
      }
    }
    spark.stop()
  }
}
