package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Experiment: single-file scan = single-task kernels; measure the gain from
  * fanning the scan out to the session's parallelism before CPU-heavy
  * map-side kernels (guide §2.5 input skew).  */
object ProfileFanout {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val d = graft.Tables(spark, sfDir, "documents")
    d.count()
    println("[prof] scan partitions = " + d.rdd.getNumPartitions)
    val seeded = d.unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("text", concat(col("text"), lit(" appended marker token"))))

    val idx1 = Dedup.dedupIndex(seeded, "doc_id", "text", k = 128)
    time("dedupIndex 1-task (warm1)") { noop(idx1) }
    time("dedupIndex 1-task (warm2)") { noop(idx1) }
    val idx32 = Dedup.dedupIndex(seeded.repartition(32), "doc_id", "text", k = 128)
    time("dedupIndex fanout-32 (warm1)") { noop(idx32) }
    time("dedupIndex fanout-32 (warm2)") { noop(idx32) }

    import graft.functions.TextFunctions._
    val scored = seeded.select(col("doc_id"), langId(col("text")).as("l"),
      qualityScore(col("text")).as("q"))
    time("scored 1-task") { noop(scored) }
    val scored32 = seeded.repartition(32).select(col("doc_id"),
      langId(col("text")).as("l"), qualityScore(col("text")).as("q"))
    time("scored fanout-32 (warm1)") { noop(scored32) }
    time("scored fanout-32 (warm2)") { noop(scored32) }

    // full q42 shape with fanout at the index
    val pairs1 = Dedup.nearDupPairs(seeded, "doc_id", "text", 0.5, k = 128, bands = 32)
    time("q42 pairs as-is") { pairs1.count() }
    spark.catalog.clearCache()
    val pairs2 = Dedup.nearDupPairs(seeded.repartition(32), "doc_id", "text", 0.5,
      k = 128, bands = 32)
    time("q42 pairs fanout (warm1)") { pairs2.count() }
    spark.catalog.clearCache()
    time("q42 pairs fanout (warm2)") { pairs2.count() }
    spark.stop()
  }
}
