package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q49 internal split: train / assign / probe-join / window — and the
  * candidate all-cells fast path (nprobe >= nCells ⇒ cell pruning is a
  * no-op ⇒ direct query×corpus join). */
object ProfileIvf2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.asDouble
    import graft.operators.Similarity
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val e = graft.Tables(spark, sfDir, "embeddings")
    println("corpus rows = " + e.count())
    val cos = graft.functions.NativeVectorExpressions.cosineFast(spark) _

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      time("A full ivfTopK (nprobe=16/16) count") {
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", k = 5, nCells = 16, nprobe = 16).count()
      }
      time("B direct broadcast query-cross-corpus + window count") {
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("__qv"))
        val c = e.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("__cv"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("__sim").desc, col("neighbor_id"))
        val r = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
          .withColumn("__sim", cos(col("__qv"), col("__cv")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k0)
          .select(col("query_id"), col("neighbor_id"),
            round(col("__sim"), 6).as("sim"), col("rank"))
        r.count()
      }
    }
    spark.stop()
  }
  private val k0 = 5
}
