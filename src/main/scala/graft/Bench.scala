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

    // Each query runs `reps` times; the MIN is reported. Single-shot timing
    // at local[32] has ±2× jitter on sub-second queries (JIT warmup, GC,
    // file-cache state), which polluted round-over-round comparison; min-of-2
    // keeps totals reproducible within ~5%.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    def timed(name: String, body: () => Unit): (String, Double) = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { body(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // release per-query persisted intermediates
        // A thrown query must not masquerade as a fast success: report -1.
        if (ok) dt else -1.0
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    // Local-iteration aid (mirrors Verify): SPARK_GRAFT_ONLY=q92,q72 times a
    // prefix-matched subset. Unset in driver runs → full registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val registry = SparkEntry.allQueries
      .filter(q => only.forall(_.exists(q.name.startsWith)))
      .map(q => timed(q.name, () => { q.run(spark, sfDir).count(); () }))
    // Write/read split rows for the queries whose deliverable includes a
    // table WRITE (q57 CTAS, q68 z-order rewrite): maintenance-time write
    // cost and steady-state read cost are different budgets at 100 TB, so
    // each gets its own row. Registry rows are unchanged (the driver's
    // oracle contract); the split rows are bench-only and EXCLUDED from
    // `total` to keep round-over-round totals comparable.
    val splits = Seq[(String, () => Unit)](
      ("q57w_ctas_write", () => queries.DataPipelineQueries.ctasWrite(spark, sfDir)),
      ("q57r_ctas_read", () => { queries.DataPipelineQueries.ctasRead(spark, sfDir).count(); () }),
      ("q68w_zorder_write", () => queries.CoreQueries.zorderWriteFresh(spark, sfDir)),
      ("q68r_zorder_read", () => { queries.CoreQueries.zorderRead(spark, sfDir).count(); () }))
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .map { case (n, body) => timed(n, body) }
    val results = registry ++ splits
    val total = registry.collect { case (_, v) if v >= 0 => v }.sum +
      (if (results.exists(_._2 < 0)) 1e9 else 0.0) // failures blow up the total, never shrink it
    def jsonLine(qs: Seq[(String, Double)]): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$m,"sf":"$sfDir"}"""
    }
    // The driver captures only the LAST ~2000 chars of stdout; the full-name
    // per-query map (~2.3 KB) overflows that window and arrives truncated
    // (unparseable). Stdout therefore gets a COMPACT line — query ids
    // shortened to their `qNN`/`qNNb` prefix (unique by construction),
    // times rounded to ms — that fits the window with room for sbt's
    // trailing "[success]" line. The full-name full-precision line goes to
    // $SPARK_GRAFT_BENCH_OUT for human/per-query analysis.
    val shortKeys = results.map { case (k, v) =>
      k.takeWhile(_ != '_') -> math.rint(v * 1000) / 1000 }
    require(shortKeys.map(_._1).distinct.length == results.length,
      "bench: short query ids collide; compact stdout line would drop entries")
    println(jsonLine(shortKeys))
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (jsonLine(results) + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
  }
}
