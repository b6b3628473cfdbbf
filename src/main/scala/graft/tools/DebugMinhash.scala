package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling for the MinHash/LSH pipeline stages. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.functions.TextFunctions._
    val d = graft.Tables(spark, sfDir, "documents")
    val seeded = d.unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("text", concat(col("text"), lit(" appended marker token"))))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val full = Dedup.nearDupPairs(seeded, "doc_id", "text", 0.5)
    time("full")(println("n_pairs=" + full.count()))
    spark.stop()
  }
}
