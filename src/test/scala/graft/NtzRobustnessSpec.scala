package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Structural protection against the testdata writer changing underneath the
  * engine (the round-8 incident: a pyarrow regen turned every `ts` column
  * into TIMESTAMP_NTZ and broke q36 plus four specs). The engine's contract
  * is that a corpus whose timestamps carry no timezone annotation loads as
  * session-zone TimestampType (the session is pinned UTC, so the micros are
  * identical), and every registry query keeps working on it.
  */
class NtzRobustnessSpec extends SparkSpec {

  /** sf0.001 rewritten with every timestamp column cast to TIMESTAMP_NTZ —
    * Spark writes those with isAdjustedToUTC=false, the same physical form
    * pyarrow produces. */
  private lazy val ntzDir: String = {
    val dir = TempDirs.newDir("ntz_corpus")
    Tables.all.foreach { t =>
      val df = Tables(spark, SparkSpec.sfDir, t)
      df.select(df.schema.fields.map { f =>
        if (f.dataType == TimestampType) col(f.name).cast(TimestampNTZType).as(f.name)
        else col(f.name)
      }.toSeq: _*).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("NTZ-written timestamps load back as session-zone TimestampType, value-identical") {
    val orig = sf("events")
    val ntz = Tables(spark, ntzDir, "events")
    assert(ntz.schema("ts").dataType == TimestampType,
      s"expected TimestampType after load, got ${ntz.schema("ts").dataType}")
    val Array(oMin, oMax) = orig.selectExpr("min(ts)", "max(ts)").head().toSeq.toArray
    val Array(nMin, nMax) = ntz.selectExpr("min(ts)", "max(ts)").head().toSeq.toArray
    assert(oMin == nMin && oMax == nMax,
      s"ts values drifted through the NTZ roundtrip: ($oMin,$oMax) vs ($nMin,$nMax)")
  }

  test("every registry query plans green against an NTZ-written corpus; " +
      "every events-reading query also EXECUTES green") {
    // Planning catches the analysis-time NTZ type errors (the round-8 class:
    // DATATYPE_MISMATCH on an epoch cast); executing the queries that scan
    // the timestamp-bearing events table catches runtime ones.
    val failures = SparkEntry.allQueries.flatMap { q =>
      try {
        val df = q.run(spark, ntzDir)
        val readsEvents =
          df.queryExecution.executedPlan.toString.contains("events.parquet")
        if (readsEvents) df.count(): Unit
        None
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("NTZ nested inside a struct/array is normalized too, value-identical") {
    // ADVICE r9: the last-resort guard previously rewrote only TOP-LEVEL
    // NTZ columns; a nested occurrence (possible if a future regen nests
    // timestamps) passed through untouched. Write a corpus with ts nested
    // both ways and load it through the same Tables path.
    import org.apache.spark.sql.functions._
    val dir = TempDirs.newDir("ntz_nested")
    sf("events").limit(500)
      .select(col("event_id"),
        struct(col("ts").cast(TimestampNTZType).as("inner_ts"),
          col("user_id")).as("meta"),
        array(col("ts").cast(TimestampNTZType)).as("ts_arr"))
      .write.mode("overwrite").parquet(s"$dir/nested.parquet")
    val back = Tables(spark, dir, "nested")
    assert(back.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("inner_ts").dataType == TimestampType)
    assert(back.schema("ts_arr").dataType ==
      org.apache.spark.sql.types.ArrayType(TimestampType, containsNull = true) ||
      back.schema("ts_arr").dataType ==
        org.apache.spark.sql.types.ArrayType(TimestampType, containsNull = false),
      s"array element not normalized: ${back.schema("ts_arr").dataType}")
    val expect = sf("events").limit(500)
      .selectExpr("min(ts)", "max(ts)").head.toSeq
    assert(back.selectExpr("min(meta.inner_ts)", "max(meta.inner_ts)")
      .head.toSeq === expect)
    assert(back.selectExpr("min(ts_arr[0])", "max(ts_arr[0])")
      .head.toSeq === expect)
  }

  test("q36_sessions (the round-8 casualty) executes green on NTZ events") {
    val rows = SparkEntry.queries("q36_sessions")(spark, ntzDir).collect()
    assert(rows.nonEmpty)
  }
}
