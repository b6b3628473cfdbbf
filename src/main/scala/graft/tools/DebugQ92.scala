package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for q92 (incremental dedup) — local iteration
  * only, not part of the driver contract. */
object DebugQ92 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def tt[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[q92] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val wave1 = graft.Tables(spark, dir, "documents")
    val wave2 = graft.Tables(spark, dir, "documents").filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(col("text"), lit(" appended marker token")))
    val idx1 = Dedup.dedupIndex(wave1, "doc_id", "text", k = 128)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx2 = Dedup.dedupIndex(wave2, "doc_id", "text", k = 128)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tt("idx1 materialize")(idx1.count())
    tt("idx2 materialize")(idx2.count())
    val oldPairs = tt("nearDupPairs(wave1)") {
      val p = Dedup.nearDupPairs(wave1, "doc_id", "text",
        threshold = 0.5, k = 128, bands = 32)
      p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count(); p
    }
    val oldCC = tt("connectedComponents(old)") {
      val c = Dedup.connectedComponents(oldPairs, "id_a", "id_b")
      c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count(); c
    }
    val deltaPairs = tt("nearDupPairsDelta") {
      val p = Dedup.nearDupPairsDelta(idx1, idx2, threshold = 0.5, k = 128, bands = 32)
      p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count(); p
    }
    val merged = tt("mergeComponents") {
      val m = Dedup.mergeComponents(oldCC, deltaPairs)
      m.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count(); m
    }
    tt("final sizes join") {
      val sizes = merged.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      merged.join(sizes, "component").count()
    }
    spark.stop()
  }
}
