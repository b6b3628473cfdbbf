package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the formatted physical plan for selected
  * queries (all by default) so scan pushdown (PushedFilters/ReadSchema),
  * join strategies (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen
  * spans can be reviewed per query.
  * Run: sbt "runMain graft.tools.Explain [sfDir] [queryName...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.allQueries
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n===== ${q.name} =====")
        try q.run(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
