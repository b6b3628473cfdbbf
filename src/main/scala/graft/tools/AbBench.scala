package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc A/B harness (guide §1: measure first, under the driver's bench
  * shape): times registered queries exactly like Bench (construction inside
  * the timed region, count() action, clearCache between reps), but lets the
  * invocation inject extra session confs so a conf hypothesis can be measured
  * without touching Bench. Usage:
  *   sbt "runMain graft.tools.AbBench q92,q70 5 spark.sql.adaptive.coalescePartitions.parallelismFirst=false ..."
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q92").split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val confs = args.drop(2).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"AbBench: conf arg must be key=value, got '$kv'")
      (kv.take(i), kv.drop(i + 1))
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach { t =>
      try graft.Tables(spark, sfDir, t).count() catch { case _: Throwable => } }
    val registry = graft.SparkEntry.allQueries
      .filter(q => names.exists(q.name.startsWith))
    registry.foreach { q =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[ab] ${q.name}: min=${times.min}%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
