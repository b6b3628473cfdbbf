package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level profiling for the heavy dedup/decontam family
  * (guide §1: measure first; isolate the expensive query's stages so the
  * optimization targets the stage that actually costs, not a guess).
  * Run: sbt "runMain graft.tools.ProfileStages [sfDir] [q92|q72|q93|q76|cc]"
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-job wall time with stage detail (guide §7.1 empirically, headless).
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        // the listener bus can drop a JobStart under load — guard the lookup
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt > 0.05) println(f"  [job ${j.jobId}%3d] $dt%6.3f s  $desc")
        }
    })
    import graft.operators.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val d = graft.Tables(spark, sfDir, "documents")
    val seeded = d.unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("text", concat(col("text"), lit(" appended marker token"))))

    // warmup: touch tables
    graft.Tables.all.foreach { t =>
      try graft.Tables(spark, sfDir, t).count() catch { case _: Throwable => } }

    if (which.isEmpty || which("q72")) {
      println("=== q72 stages ===")
      val idx = time("dedupIndex build+persist") {
        val i = Dedup.dedupIndex(seeded, "doc_id", "text", k = 128)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        i.count(); i
      }
      val cands = time("candidate pairs (band join)") {
        val c = Dedup.minhashCandidatePairs(idx, col("__id"), col("__sig"), 128, 32)
        noop(c); c
      }
      val pairs = time("verify pairs") {
        val p = Dedup.nearDupPairsFromIndex(idx, 0.5, 128, 32)
        noop(p); p
      }
      val cc = time("connectedComponents") {
        val c = Dedup.connectedComponents(pairs, "id_a", "id_b"); noop(c); c
      }
      time("sizes join + final") {
        val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
        noop(cc.join(sizes, "component"))
      }
      idx.unpersist()
      spark.catalog.clearCache()
    }

    if (which.isEmpty || which("q92")) {
      println("=== q92 stages (fixture prebuilt) ===")
      val wh = graft.TempDirs.newDir("prof_dedup_state")
      time("fixture build (one-time)") {
        val wave1 = d
        val idx1 = Dedup.dedupIndex(wave1, "doc_id", "text", k = 128)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val oldCC = Dedup.connectedComponents(
          Dedup.nearDupPairsFromIndex(idx1, 0.5, 128, 32), "id_a", "id_b")
        idx1.write.parquet(s"$wh/index")
        oldCC.write.parquet(s"$wh/components")
        idx1.unpersist()
      }
      (1 to 2).foreach { rep =>
        println(s"--- rep $rep ---")
        val idx1 = spark.read.parquet(s"$wh/index")
        val oldCC = spark.read.parquet(s"$wh/components")
        val wave2 = d.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L))
          .withColumn("text", concat(col("text"), lit(" appended marker token")))
        val idx2 = time("delta index build+persist") {
          val i = Dedup.dedupIndex(wave2, "doc_id", "text", k = 128)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          i.count(); i
        }
        val deltaPairs = time("delta pairs (new-vs-all + verify)") {
          val p = Dedup.nearDupPairsDelta(idx1, idx2, 0.5, 128, 32); noop(p); p
        }
        val merged = time("mergeComponents") {
          val m = Dedup.mergeComponents(oldCC, deltaPairs); noop(m); m
        }
        time("sizes join + final") {
          val sizes = merged.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
          noop(merged.join(sizes, "component"))
        }
        spark.catalog.clearCache()
      }
    }

    if (which.isEmpty || which("q93")) {
      println("=== q93 stages (filter prebuilt) ===")
      import graft.operators.{Decontaminate, Sampling}
      val train = seeded.filter(Sampling.splitBucket(col("doc_id")) < 80)
      val ev = seeded.filter(Sampling.splitBucket(col("doc_id")) >= 80)
      val fdir = graft.TempDirs.newDir("prof_bloom_state")
      time("standing filter build (one-time)") {
        Decontaminate.standingEvalFilter(spark, fdir, "eval_v1", ev,
          "doc_id", "text", n = 5)
      }
      (1 to 2).foreach { rep =>
        val filter = time(s"rep $rep: filter reload") {
          Decontaminate.standingEvalFilter(spark, fdir, "eval_v1", ev,
            "doc_id", "text", n = 5)
        }
        time(s"rep $rep: overlapReportWithFilter") {
          noop(Decontaminate.overlapReportWithFilter(spark, train, ev,
            "doc_id", "text", 5, filter))
        }
      }
    }

    if (which.isEmpty || which("q76")) {
      println("=== q76 stages ===")
      import graft.functions.TextFunctions._
      import graft.operators.Sampling
      val seededE = d.unionAll(d.filter(col("doc_id") % 10 === 0))
      val scored = seededE.select(
          col("doc_id"), col("source"), col("text"),
          graft.functions.TextFunctions.langId(col("text")).as("lang_pred"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("quality"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("quality") >= 0.5 && col("lang_pred") === "en")
      time("scored gate (map-only)") { noop(scored) }
      time("scored gate rep2") { noop(scored) }
      time("scored gate count") { scored.count() }
      val deduped = Dedup.exactDedup(scored, col("text"), Seq(col("doc_id")))
      time("exactDedup window") { noop(deduped) }
      time("exactDedup window rep2") { noop(deduped) }
      val balanced = Sampling.stratifiedSample(deduped, col("doc_id"),
        col("source"), Map("src1" -> 100, "src2" -> 50), defaultPct = 40)
      val fin = balanced
        .withColumn("split", Sampling.splitAssign(
          concat(col("doc_id").cast("string"), lit(":split")), 80, 10))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          round(avg(col("quality")), 6).as("avg_quality"),
          countDistinct(col("source")).as("n_sources"))
      time("full pipeline") { noop(fin) }
      time("full pipeline rep2") { noop(fin) }
    }

    spark.stop()
  }
}
