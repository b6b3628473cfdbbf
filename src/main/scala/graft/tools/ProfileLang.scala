package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment harness for the langId/qualityScore expression shapes. */
object ProfileLang {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val d = graft.Tables(spark, sfDir, "documents")
    d.count()
    val seeded = d.unionAll(d.filter(col("doc_id") % 10 === 0))

    // current fold-based langId
    val cur = seeded.select(col("doc_id"), langId(col("text")).as("lang_pred"))
    time("langId fold (warm1)") { noop(cur) }
    time("langId fold (warm2)") { noop(cur) }

    // array-argmax variant: each score evaluated once
    def langIdArr(text: Column): Column = {
      val toks = tokens(text)
      val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
      val scored = defaultMarkers.zipWithIndex.map { case ((l, ws), i) =>
        struct(
          size(filter(toks, t => array_contains(array(ws.map(lit): _*), t))).as("s"),
          lit(-i).as("ni"), lit(l).as("lang"))
      }
      val best = array_max(array(scored: _*))
      when(cjk > 0, lit("zh"))
        .otherwise(when(best.getField("s") > 0, best.getField("lang"))
          .otherwise(lit("unknown")))
    }
    val arr = seeded.select(col("doc_id"), langIdArr(col("text")).as("lang_pred"))
    time("langId array-argmax (warm1)") { noop(arr) }
    time("langId array-argmax (warm2)") { noop(arr) }

    // equivalence check
    val diff = cur.alias("a").join(arr.alias("b"), Seq("doc_id"))
      .filter(col("a.lang_pred") =!= col("b.lang_pred")).count()
    println(s"[prof] langId variant diff rows = $diff")

    // qualityScore alone
    val q = seeded.select(col("doc_id"), qualityScore(col("text")).as("q"))
    time("qualityScore (warm1)") { noop(q) }
    time("qualityScore (warm2)") { noop(q) }

    // tokens only
    val tk = seeded.select(col("doc_id"), size(tokens(col("text"))).as("n"))
    time("tokens size only") { noop(tk) }

    // single markerHits
    val mh = seeded.select(col("doc_id"),
      size(filter(tokens(col("text")),
        t => array_contains(array(defaultMarkers.head._2.map(lit): _*), t))).as("n"))
    time("one markerHits") { noop(mh) }
    time("one markerHits rep2") { noop(mh) }

    // combined scored projection (q76 shape) with array-argmax langId
    val scoredNew = seeded.select(col("doc_id"), col("source"), col("text"),
        langIdArr(col("text")).as("lang_pred"),
        qualityScore(col("text")).as("quality"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("quality") >= 0.5 && col("lang_pred") === "en")
    time("q76 scored gate, argmax langId (warm1)") { noop(scoredNew) }
    time("q76 scored gate, argmax langId (warm2)") { noop(scoredNew) }

    spark.stop()
  }
}
