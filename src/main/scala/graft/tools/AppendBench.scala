package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r11 claim that SnapshotTable appends are O(delta): committing
  * a FIXED-SIZE delta must cost the same wall-clock whether the table holds
  * 100k or 10M rows (the Iceberg `writeTo(...).append()` cost model —
  * reference spark.py:88-89). Before r11, `commit(append)` rewrote the whole
  * table and re-scanned it for a row count, so the same sweep grew linearly
  * with table size.
  *
  * Usage: sbt "runMain graft.tools.AppendBench"
  * Prints one JSON line: per-table-size median append seconds over `Reps`
  * appends of a 10k-row delta, plus the read-back count to prove the commits
  * landed. Written to APPENDBENCH_r{N}.json by the round harness.
  */
object AppendBench {

  private val DeltaRows = 10000L
  private val Reps = 3

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sizes = Seq(100000L, 1000000L, 10000000L)
    val results = sizes.map { n =>
      val root = graft.TempDirs.newDir(s"graft_appendbench_$n")
      val st = new graft.sources.SnapshotTable(spark, root)
      st.commit(spark.range(n).select(col("id"),
        (col("id") % 97).as("k"), concat(lit("row"), col("id")).as("v")))
      val times = (1 to Reps).map { i =>
        val delta = spark.range(n + i * DeltaRows, n + i * DeltaRows + DeltaRows)
          .select(col("id"), (col("id") % 97).as("k"),
            concat(lit("d"), col("id")).as("v"))
        val t0 = System.nanoTime()
        st.commit(delta, op = "append")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val readBack = st.read().count()
      require(readBack == n + Reps * DeltaRows,
        s"append bench read-back mismatch at n=$n: $readBack")
      (n, times(Reps / 2))
    }
    val m = results.map { case (n, s) =>
      "\"rows_" + n + "\":" + math.rint(s * 1000) / 1000 }.mkString(",")
    val ratio = results.last._2 / results.head._2
    println(s"""{"metric":"append_median_sec","delta_rows":$DeltaRows,$m,""" +
      s""""largest_over_smallest":${math.rint(ratio * 100) / 100}}""")
    spark.stop()
  }
}
