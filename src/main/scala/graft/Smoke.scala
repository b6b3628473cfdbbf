package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: SparkEntry.entry(spark) must return >0 rows
  * on sf0.001. Run: sbt "runMain graft.Smoke". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n  (${if (n > 0) "PASS" else "FAIL"})")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
