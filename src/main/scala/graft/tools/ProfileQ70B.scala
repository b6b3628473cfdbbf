package graft.tools

import org.apache.spark.sql.SparkSession

/** q70 variant bake-off: lazy 30-branch union (AQE on/off) vs pooled
  * localCheckpoint vs pooled with smaller pools — under the bench session
  * shape (local[32], shuffle.partitions=32). */
object ProfileQ70B {
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

    (1 to 3).foreach { rep =>
      time(s"A lazy union, AQE on, rep$rep") {
        val df = cases.map(Fuzz.normalizedDf(spark, sfDir, _)).reduce(_.union(_))
        println(s"  rows=${df.count()}")
      }
    }
    (1 to 3).foreach { rep =>
      time(s"B lazy union, AQE off, rep$rep") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val df = cases.map(Fuzz.normalizedDf(spark, sfDir, _)).reduce(_.union(_))
          println(s"  rows=${df.count()}")
        } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    Seq(4, 8, 16).foreach { threads =>
      (1 to 2).foreach { rep =>
        time(s"C pooled checkpoint, $threads threads, rep$rep") {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration._
          val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
          try {
            val done = cases.map { c =>
              Future(Fuzz.normalizedDf(spark, sfDir, c).localCheckpoint(true))
            }.map(Await.result(_, 10.minutes))
            println(s"  rows=${done.reduce(_.union(_)).count()}")
          } finally pool.shutdown()
        }
      }
    }
    (1 to 2).foreach { rep =>
      time(s"D pooled checkpoint, AQE off, 8 threads, rep$rep") {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration._
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try {
          val done = cases.map { c =>
            Future(Fuzz.normalizedDf(spark, sfDir, c).localCheckpoint(true))
          }.map(Await.result(_, 10.minutes))
          println(s"  rows=${done.reduce(_.union(_)).count()}")
        } finally { pool.shutdown(); spark.conf.set("spark.sql.adaptive.enabled", "true") }
      }
    }
    (1 to 3).foreach { rep =>
      time(s"E lazy union, AQE off + shuffle.partitions=4, rep$rep") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          val df = cases.map(Fuzz.normalizedDf(spark, sfDir, _)).reduce(_.union(_))
          println(s"  rows=${df.count()}")
        } finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.shuffle.partitions", "32")
        }
      }
    }
    spark.stop()
  }
}
