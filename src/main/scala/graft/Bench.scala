package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Queries run in registry order (deterministic);
  * a warmup action first absorbs one-time session/codegen/file-index cost so
  * per-query numbers measure the queries, not JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table once (builds file indexes, loads codecs).
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => }
    }

    val results = SparkEntry.allQueries.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.run(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} FAILED: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // release per-query persisted intermediates
      // A thrown query must not masquerade as a fast success: report -1.
      q.name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum +
      (if (results.exists(_._2 < 0)) 1e9 else 0.0) // failures blow up the total, never shrink it
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
