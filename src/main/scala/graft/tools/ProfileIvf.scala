package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the IVF paths (q49/q126). */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{IvfIndex, Similarity}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val e = graft.Tables(spark, sfDir, "embeddings")
    e.count()
    (1 to 2).foreach { rep =>
      val c = time(s"rep $rep trainCentroids") {
        val m = classOf[Similarity.type].getDeclaredMethod("trainCentroids",
          classOf[org.apache.spark.sql.DataFrame], classOf[String],
          Integer.TYPE, Integer.TYPE, Integer.TYPE, java.lang.Long.TYPE)
        m.setAccessible(true)
        m.invoke(Similarity, e, "embedding", Int.box(16), Int.box(5),
          Int.box(10000), Long.box(42L)).asInstanceOf[Array[Array[Double]]]
      }
      time(s"rep $rep full ivfTopK count") {
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", k = 5, nCells = 16, nprobe = 16).count()
      }
      println("centroids " + c.length)
    }
    val root = graft.TempDirs.newDir("prof_ivfidx")
    time("IvfIndex.build") {
      IvfIndex.build(e, root, "vec_id", "embedding", nCells = 8)
    }
    (1 to 2).foreach { rep =>
      time(s"rep $rep probe-2 serve") {
        IvfIndex.topK(spark, root, e.filter(col("vec_id") === 0), "vec_id",
          "embedding", k = 5, nprobe = 2).count()
      }
      time(s"rep $rep probe-all serve") {
        IvfIndex.topK(spark, root, e.filter(col("vec_id") < 8), "vec_id",
          "embedding", k = 5, nprobe = 8).count()
      }
    }
    spark.stop()
  }
}
